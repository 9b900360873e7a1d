package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamingSessionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming session_window groups like the batch gap rule") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    input.addData(
      (10L, ts("2024-01-01 00:00:00")),
      (10L, ts("2024-01-01 00:20:00")), // within gap -> same session
      (10L, ts("2024-01-01 01:00:00")), // 40 min gap -> new session
      (20L, ts("2024-01-01 00:25:00")),
      (30L, ts("2024-01-01 02:00:00")),
      (30L, ts("2024-01-01 02:30:00"))) // exactly the gap -> MERGED
    val out = StreamingIngest.sessionStream(
      input.toDF().toDF("user_id", "ts"), "ts", "user_id")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .orderBy("user_id", "session_start").collect()
      assert(rows.length == 4)
      val byUser = rows.groupBy(_.getAs[Long]("user_id"))
      assert(byUser(10L).map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L))
      assert(byUser(20L).map(_.getAs[Long]("n_events")).toSeq == Seq(1L))
      // session_window coalesces adjacent windows: the ==30min event
      // EXTENDS the session — hence the batch sessionize's strict >
      assert(byUser(30L).map(_.getAs[Long]("n_events")).toSeq == Seq(2L))
      // first session spans [00:00, 00:20 + gap)
      assert(byUser(10L).head.getAs[Timestamp]("session_end")
        == ts("2024-01-01 00:50:00"))
    } finally q.stop()
  }

  test("streaming dedup drops repeated payloads across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val out = StreamingIngest.dedupStream(
      input.toDF().toDF("value", "ts"), "ts")
    val q = out.writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      input.addData(("payload-A", ts("2024-01-01 00:00:00")),
        ("payload-B", ts("2024-01-01 00:01:00")))
      q.processAllAvailable()
      input.addData(("payload-A", ts("2024-01-01 00:02:00")), // dup -> dropped
        ("payload-C", ts("2024-01-01 00:03:00")))
      q.processAllAvailable()
      val vals = spark.table("deduped").collect()
        .map(_.getAs[String]("value")).sorted.toSeq
      assert(vals == Seq("payload-A", "payload-B", "payload-C"))
    } finally q.stop()
  }
}
