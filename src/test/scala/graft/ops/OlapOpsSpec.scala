package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class OlapOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def eventsDf(rows: Seq[(Long, Long, java.sql.Timestamp)]) =
    rows.toDF("event_id", "user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))

  test("sessionize splits on >30min gaps per user, not across users") {
    val sessions = OlapOps.sessionizeEvents(eventsDf(Seq(
        (1L, 10L, ts("2024-01-01 00:00:00")),
        (2L, 10L, ts("2024-01-01 00:20:00")), // 20min gap -> same session
        (3L, 10L, ts("2024-01-01 01:00:00")), // 40min gap -> new session
        (4L, 20L, ts("2024-01-01 00:25:00"))))) // other user -> own session
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("n_events"))).toSet
    assert(sessions == Set((10L, 1L, 2L), (10L, 2L, 1L), (20L, 1L, 1L)))
  }

  test("exactly a 30min gap does NOT split (matches session_window merging)") {
    // session_window coalesces adjacent windows: an event exactly at
    // start+gap extends the session (verified in StreamingSessionSpec),
    // so the batch rule is strict >
    val out = OlapOps.sessionizeEvents(eventsDf(Seq(
        (1L, 1L, ts("2024-01-01 00:00:00")),
        (2L, 1L, ts("2024-01-01 00:30:00")))))
      .collect()
    assert(out.length == 1 && out(0).getAs[Long]("n_events") == 2L)
  }

  test("cohortRetention: offset-0 retention is 1.0, within-cohort decay is monotone") {
    val rows = OlapOps.cohortRetention(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset"),
        r.getAs[Long]("cohort_size"), r.getAs[Long]("n_active"),
        r.getAs[Double]("retention")))
    assert(rows.nonEmpty)
    // planted lifecycle -> several cohorts, not one
    assert(rows.map(_._1).distinct.length >= 3, rows.map(_._1).distinct.toSeq)
    rows.filter(_._2 == 0L).foreach { r =>
      assert(r._3 == r._4 && r._5 == 1.0, r.toString)
    }
    rows.groupBy(_._1).foreach { case (_, cs) =>
      val byOffset = cs.sortBy(_._2).map(_._4)
      assert(byOffset.zip(byOffset.tail).forall { case (a, b) => b <= a },
        s"retention not monotone: ${cs.toSeq}")
    }
  }

  test("rollup emits detail + subtotal + grand total rows") {
    val df = Seq(("A", "x", 1), ("A", "y", 2), ("B", "x", 3))
      .toDF("g1", "g2", "v")
    val out = df.rollup("g1", "g2")
      .agg(sum("v").as("s"), grouping(col("g1")).as("gg1"), grouping(col("g2")).as("gg2"))
      .collect()
    assert(out.length == 6) // 3 detail + 2 subtotal + 1 grand
    val grand = out.find(r => r.getAs[Any]("gg1").toString == "1").get
    assert(grand.getAs[Long]("s") == 6L)
  }

  test("except/intersect have set (distinct) semantics") {
    val a = Seq(1, 1, 2, 3).toDF("k")
    val b = Seq(2, 2, 4).toDF("k")
    assert(a.except(b).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
    assert(a.intersect(b).collect().map(_.getInt(0)).toSeq == Seq(2))
  }
}
