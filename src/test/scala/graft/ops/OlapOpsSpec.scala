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

  test("sessionizeChunked == sessionize: boundary-spanning, multi-chunk " +
      "and exact-gap sessions stitch bit-identically") {
    // 1-hour chunks so the adversarial fixture crosses many boundaries:
    // a session spanning one boundary (10-min steps across 01:00), a
    // session spanning THREE chunks (20-min steps 02:50..05:10), an
    // exactly-30-min boundary gap (must NOT split), a >30-min boundary
    // gap (must split), and a second user interleaved throughout
    val rows = Seq(
      (1L, 1L, ts("2024-01-01 00:50:00")),
      (2L, 1L, ts("2024-01-01 01:00:00")),
      (3L, 1L, ts("2024-01-01 01:10:00")),
      (4L, 1L, ts("2024-01-01 02:50:00")), // 100min gap -> new session
      (5L, 1L, ts("2024-01-01 03:10:00")),
      (6L, 1L, ts("2024-01-01 03:30:00")),
      (7L, 1L, ts("2024-01-01 03:50:00")),
      (8L, 1L, ts("2024-01-01 04:10:00")),
      (9L, 1L, ts("2024-01-01 04:30:00")),
      (10L, 1L, ts("2024-01-01 04:50:00")),
      (11L, 1L, ts("2024-01-01 05:10:00")),
      (12L, 1L, ts("2024-01-01 05:40:00")), // exactly 30min at boundary side
      (13L, 1L, ts("2024-01-01 06:40:01")), // 30min+1s -> split
      (14L, 2L, ts("2024-01-01 00:59:59")),
      (15L, 2L, ts("2024-01-01 01:00:00")), // 1s across the cut
      (16L, 2L, ts("2024-01-01 09:00:00")))
    val ev = eventsDf(rows)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("user_id", "session_id").collect().map(_.toSeq).toSeq
    val plain = canon(OlapOps.sessionizeEvents(ev))
    val chunked = canon(OlapOps.sessionizeChunkedEvents(ev, chunkHours = 1))
    assert(chunked == plain)
    // and on real data at two chunk widths (incl. the default)
    val real = graft.Tables.load(spark, "/root/testdata/sf0.01", "events")
    val p = canon(OlapOps.sessionizeEvents(real))
    assert(canon(OlapOps.sessionizeChunkedEvents(real)) == p)
    assert(canon(OlapOps.sessionizeChunkedEvents(real, chunkHours = 6)) == p)
  }

  test("windowRangeFrameChunked == windowRangeFrame: halo rows complete " +
      "boundary-crossing, exactly-1h, tied-timestamp and boundary-exact " +
      "frames at 1h and default chunk widths") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("event_id"),
        r.getAs[Long]("user_id"), r.getAs[Long]("n_trailing_hour"),
        r.getAs[Double]("v_trailing_hour"))).toSeq
    // adversarial fixture vs 1h chunks: a frame crossing one cut
    // (00:30→01:10), an exactly-1h-lookback pair (00:10→01:10, RANGE
    // inclusive), an event AT a chunk boundary (02:00:00 — its halo
    // copy must not double-count), same-us ties straddling a cut, a
    // frame spanning the lookback from the last second of a chunk, and
    // a second user interleaved
    val rows = Seq(
      (1L, 1L, ts("2024-01-01 00:10:00"), 1.0),
      (2L, 1L, ts("2024-01-01 00:30:00"), 2.0),
      (3L, 1L, ts("2024-01-01 01:10:00"), 4.0),   // frame: 1,2,3
      (4L, 1L, ts("2024-01-01 02:00:00"), 8.0),   // exactly at the cut
      (5L, 1L, ts("2024-01-01 02:59:59"), 16.0),  // last second of chunk
      (6L, 1L, ts("2024-01-01 03:30:00"), 32.0),  // frame: 5,6 across cut
      (7L, 2L, ts("2024-01-01 00:59:59"), 64.0),
      (8L, 2L, ts("2024-01-01 00:59:59"), 128.0), // tie at the last us
      (9L, 2L, ts("2024-01-01 01:00:00"), 256.0), // frame: 7,8,9
      (10L, 2L, ts("2024-01-01 09:00:00"), 512.0))
    val ev = rows.toDF("event_id", "user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val plain = canon(OlapOps.windowRangeFramePlainEvents(ev))
    assert(plain.exists(_._3 > 2L), "fixture has no multi-event frames")
    for (h <- Seq(1, 24)) {
      assert(canon(OlapOps.windowRangeFrameChunkedEvents(ev, h)) == plain,
        s"chunkHours=$h diverged from the plain range frame")
      assert(canon(OlapOps.windowRangeFramePrefixEvents(ev, h)) == plain,
        s"chunkHours=$h prefix form diverged from the plain range frame")
    }
    // and the dir-level gate pair on real data (sf0.01 has >1-row frames)
    val dir = "/root/testdata/sf0.01"
    val realPlain = canon(OlapOps.windowRangeFramePlain(spark, dir))
    assert(realPlain.exists(_._3 > 1L))
    assert(canon(OlapOps.windowRangeFrameChunked(spark, dir)) == realPlain)
    assert(canon(OlapOps.windowRangeFramePrefix(spark, dir)) == realPlain)
    // and the DEFAULT gate path (delegates to the prefix form)
    assert(canon(OlapOps.windowRangeFrame(spark, dir)) == realPlain)
  }

  test("windowRangeFramePrefix: all-null and mixed-null frames reproduce " +
      "the frame-sum NULL semantics") {
    // user 1: an all-null frame (event 1 alone, null value), then a
    // frame whose non-nulls come only from the PRIOR chunk at 1h chunks
    val rows = Seq(
      (1L, 1L, ts("2024-01-01 00:10:00"), Option.empty[Double]),
      (2L, 1L, ts("2024-01-01 00:50:00"), Some(3.5)),
      (3L, 1L, ts("2024-01-01 01:10:00"), Option.empty[Double]), // frame: 1(null),2,3 -> 3.5
      (4L, 1L, ts("2024-01-01 05:00:00"), Option.empty[Double])) // all-null frame -> NULL
    val ev = rows.toDF("event_id", "user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("event_id"),
        r.getAs[Long]("n_trailing_hour"),
        Option(r.getAs[java.lang.Double]("v_trailing_hour")))).toSeq
    val plain = canon(OlapOps.windowRangeFramePlainEvents(ev))
    assert(plain.map(t => (t._1, t._3)) == Seq(
      1L -> None, 2L -> Some(3.5), 3L -> Some(3.5), 4L -> None))
    assert(canon(OlapOps.windowRangeFramePrefixEvents(ev, 1)) == plain)
    assert(canon(OlapOps.windowRangeFrameChunkedEvents(ev, 1)) == plain)
  }

  test("windowRangeFramePrefix: null timestamps and a null user form the " +
      "null-peer groups the plain RANGE frame defines; chunkHours <= 0 " +
      "fails loudly") {
    // null ts rows are PEERS (frame = the whole null group per user);
    // a null user_id is itself a real window partition. Both hit the
    // prefix form's dedicated branches (us-split + null-safe user key).
    val rows = Seq(
      (1L, Some(1L), Some(ts("2024-01-01 00:10:00")), Some(2.0)),
      (2L, Some(1L), Option.empty[java.sql.Timestamp], Some(8.0)),
      (3L, Some(1L), Option.empty[java.sql.Timestamp], Option.empty[Double]),
      (4L, Some(1L), Some(ts("2024-01-01 00:40:00")), Some(4.0)),
      (5L, Some(2L), Option.empty[java.sql.Timestamp], Option.empty[Double]),
      (6L, Option.empty[Long], Some(ts("2024-01-01 00:20:00")), Some(1.0)),
      (7L, Option.empty[Long], Some(ts("2024-01-01 00:50:00")), Some(16.0)),
      (8L, Option.empty[Long], Option.empty[java.sql.Timestamp], Some(32.0)))
    val ev = rows.toDF("event_id", "user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Long]("user_id")),
        r.getAs[Long]("n_trailing_hour"),
        Option(r.getAs[java.lang.Double]("v_trailing_hour")))).toSeq
    val plain = canon(OlapOps.windowRangeFramePlainEvents(ev))
    // sanity: user 1's null-ts pair are peers of each other only
    assert(plain.find(_._1 == 2L).get._3 == 2L)
    assert(plain.find(_._1 == 5L).get._4.isEmpty) // all-null null-peer frame
    assert(canon(OlapOps.windowRangeFramePrefixEvents(ev, 1)) == plain)
    assert(canon(OlapOps.windowRangeFrameEvents(ev)) == plain) // default path
    intercept[IllegalArgumentException] {
      OlapOps.windowRangeFramePrefixEvents(ev, 0)
    }
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
