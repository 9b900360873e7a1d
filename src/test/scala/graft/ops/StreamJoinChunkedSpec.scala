package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The chunk-keyed interval join emits EXACTLY the plain join's pairs —
  * the wave-5b mitigation's correctness core: a purchase inside
  * [c_ts, c_ts + 7d] lands in exactly one of the click's two exploded
  * chunks (width = the range), so no pair duplicates and none is lost,
  * including pairs that straddle a chunk boundary and pairs exactly on
  * the range edges. Checked on BATCH frames (the join expressions are
  * shared with the streaming gates via intervalJoinPairs[Chunked]); the
  * streaming execution itself is differentially gated by
  * q_stream_join_chunked against q_stream_join's oracle. */
class StreamJoinChunkedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val week = 7L * 86400L
  private val base = 1704067200L // 2024-01-01, chunk-aligned epochs vary below

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("chunked pairs == plain pairs on a hot key with boundary cases") {
    // user 1 is the mega key; clicks sit near a chunk boundary so their
    // exploded (k, k+1) legs are both exercised; user 2 checks isolation
    val clicks = Seq(
      (10L, 1L, ts(base + week - 10)),       // window straddles the boundary
      (11L, 1L, ts(base + week + 5)),        // just past the boundary
      (12L, 1L, ts(base + 100)),             // deep inside a chunk
      (13L, 2L, ts(base + week - 10)),       // other user, same instant as 10
      (14L, 1L, ts(base + 3 * week))         // isolated, no purchases near
    ).toDF("click_id", "user_id", "c_ts")
    val buys = Seq(
      (20L, 1L, ts(base + week - 10)),       // == c_ts of click 10: range edge (>=)
      (21L, 1L, ts(base + week + 1)),        // crosses the boundary from click 10
      (22L, 1L, ts(base + week - 10 + week)),// == click 10's c_ts + 7d: edge (<=)
      (23L, 1L, ts(base + week - 10 + week + 1)), // 1s past click 10's window
      (24L, 1L, ts(base + 50)),              // before click 12 — matches none of 12
      (25L, 2L, ts(base + week)),            // user 2's own match
      (26L, 3L, ts(base + week))             // user with no clicks
    ).toDF("purchase_id", "b_user", "p_ts")

    val plain = StreamOps.intervalJoinPairs(clicks, buys)
      .orderBy("click_id", "purchase_id").collect().toSeq
    val chunked = StreamOps.intervalJoinPairsChunked(clicks, buys)
      .orderBy("click_id", "purchase_id").collect().toSeq
    assert(chunked == plain)
    // the fixture is non-vacuous: boundary-crossing and edge pairs present
    assert(plain.nonEmpty)
    val pairs = plain.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 20L))) // >= edge
    assert(pairs.contains((10L, 22L))) // <= edge, one chunk over
    assert(pairs.contains((10L, 21L))) // boundary-crossing match
    assert(!pairs.contains((10L, 23L))) // 1s outside the range
    assert(!pairs.exists(_._1 == 14L)) // isolated click matches nothing
  }

  test("randomized: chunked == plain over dense hot-key traffic") {
    // deterministic dense traffic on one user: every (click, buy) pair
    // whose gap falls in [0, 7d] must appear exactly once
    val n = 400
    val clicks = spark.range(n).select(col("id").as("click_id"),
      lit(1L).as("user_id"),
      timestamp_seconds(lit(base) + col("id") * 40000L).as("c_ts"))
    val buys = spark.range(n).select((col("id") + 1000L).as("purchase_id"),
      lit(1L).as("b_user"),
      timestamp_seconds(lit(base) + 13L + col("id") * 41000L).as("p_ts"))
    val plain = StreamOps.intervalJoinPairs(clicks, buys)
      .orderBy("click_id", "purchase_id").collect().toSeq
    val chunked = StreamOps.intervalJoinPairsChunked(clicks, buys)
      .orderBy("click_id", "purchase_id").collect().toSeq
    assert(plain.nonEmpty && chunked == plain)
  }
}
