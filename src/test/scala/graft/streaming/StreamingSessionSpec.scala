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

  test("append-mode protocol: no emit before flush, sentinel held, late dropped") {
    val base = java.nio.file.Files.createTempDirectory("ssessap").toString
    val landing = s"$base/landing"
    new java.io.File(landing).mkdirs()
    def land(rows: Seq[(Long, Timestamp, Long)], name: String): Unit = {
      val tmpd = s"$base/tmp_$name"
      rows.toDF("event_id", "ts", "user_id")
        .coalesce(1).write.mode("overwrite").parquet(tmpd)
      val part = new java.io.File(tmpd).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(s"$landing/$name").toPath)
    }
    def run(): Unit = StreamingSessions.appendSessionStream(spark, landing,
      s"$base/out", s"$base/ck", gapMinutes = 30, delay = "2 days")
      .awaitTermination()
    def out() = try spark.read.parquet(s"$base/out").collect().toSeq
      catch { case _: Throwable => Seq.empty }
    // data run: two sessions for user 10, all within a 1-day span —
    // the 2-day watermark delay means nothing can finalize
    land(Seq((1L, ts("2024-01-01 00:00:00"), 10L),
      (2L, ts("2024-01-01 00:10:00"), 10L),
      (3L, ts("2024-01-01 06:00:00"), 10L)), "b0.parquet")
    run()
    assert(out().isEmpty, "append emitted before the watermark could prove closure")
    // sentinel run: watermark jumps past both sessions' closes
    land(Seq((-1L, ts("2024-01-10 00:00:00"), -1L)), "b1.parquet")
    run()
    // late run: inside the real range, behind the watermark — dropped
    land(Seq((-2L, ts("2024-01-01 00:05:00"), -2L)), "b2.parquet")
    run()
    val rows = out().map(r => (r.getAs[Long]("user_id"),
      r.getAs[Timestamp]("session_start"), r.getAs[Timestamp]("session_end"),
      r.getAs[Long]("n_events"), r.getAs[Long]("id_sum"))).sortBy(_._2.getTime)
    assert(rows == Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:40:00"), 2L, 3L),
      (10L, ts("2024-01-01 06:00:00"), ts("2024-01-01 06:30:00"), 1L, 3L)),
      s"got $rows")
    graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
  }

  test("outer stream-join protocol: no null-extension before the flush, " +
      "exactly one after, late click dropped") {
    val base = java.nio.file.Files.createTempDirectory("ssoj").toString
    val clicksDir = s"$base/clicks"; val buysDir = s"$base/buys"
    def land(dir: String, cols: (String, String, String),
        rows: Seq[(Long, Long, Timestamp)]): Unit =
      rows.toDF(cols._1, cols._2, cols._3)
        .coalesce(1).write.mode("append").parquet(dir)
    val cCols = ("click_id", "user_id", "c_ts")
    val bCols = ("purchase_id", "b_user", "p_ts")
    def run(): Unit = {
      val cs = spark.readStream
        .schema("click_id LONG, user_id LONG, c_ts TIMESTAMP")
        .parquet(clicksDir).withWatermark("c_ts", "30 days")
      val bs = spark.readStream
        .schema("purchase_id LONG, b_user LONG, p_ts TIMESTAMP")
        .parquet(buysDir).withWatermark("p_ts", "30 days")
      cs.join(bs, col("user_id") === col("b_user")
            && col("p_ts") >= col("c_ts")
            && col("p_ts") <= col("c_ts") + expr("interval 7 days"),
          "leftOuter")
        .select("click_id", "user_id", "purchase_id")
        .writeStream.format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    def out() = try spark.read.parquet(s"$base/out").collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.toString.toLong)))
      .toSeq catch { case _: Throwable => Seq.empty }
    // user 10 clicks twice: one click matched, one not; span 1 day
    land(clicksDir, cCols, Seq((1L, 10L, ts("2024-01-01 00:00:00")),
      (2L, 10L, ts("2024-01-02 00:00:00"))))
    land(buysDir, bCols, Seq((50L, 10L, ts("2024-01-01 12:00:00"))))
    run()
    val first = out()
    assert(first.toSet == Set((1L, Some(50L))),
      s"only the matched pair may emit before the flush: $first")
    // sentinel flush on both streams (distinct users, 100-day gap)
    land(clicksDir, cCols, Seq((-1L, -1L, ts("2024-03-15 00:00:00"))))
    land(buysDir, bCols, Seq((-3L, -3L, ts("2024-06-25 00:00:00"))))
    run()
    // late click inside the real range — must be dropped
    land(clicksDir, cCols, Seq((-2L, -2L, ts("2024-01-01 06:00:00"))))
    run()
    val fin = out()
    assert(fin.toSet == Set((1L, Some(50L)), (2L, None)), s"got $fin")
    assert(fin.size == 2, s"duplicate emissions: $fin")
    graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
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
