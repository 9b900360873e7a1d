package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics of the bounded conversation-assembly variant
  * ([[ExtraOps.nestedPackCapped]]): bit-identical to the unbounded op
  * whenever every user fits the bound, keep-the-LAST-N for a mega user
  * who doesn't. */
class NestedPackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def ts(m: Int) = Timestamp.valueOf(f"2025-01-01 00:$m%02d:00")

  private def synthetic() = {
    import spark.implicits._
    // user 0: mega user, 8 events e0..e7 in time order; user 1: 2 events
    val mega = (0 until 8).map(i => (0L, ts(i), i.toLong, s"t$i"))
    val small = Seq((1L, ts(0), 100L, "a"), (1L, ts(1), 101L, "b"))
    (mega ++ small).toDF("user_id", "ts", "event_id", "event_type")
  }

  test("capped == uncapped when every user fits the bound") {
    val capped = ExtraOps.nestedPackCapped(spark, dir, lastN = 500).collect()
    val plain = ExtraOps.nestedPack(spark, dir).collect()
    assert(capped.toSeq == plain.toSeq)
  }

  test("mega user keeps exactly the LAST n events") {
    val out = ExtraOps.packEventsCapped(synthetic(), lastN = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(out == Seq(
      // user 0: events e5,e6,e7 survive; first of the kept window is e5
      (0L, 3, "t5", "t7", 5L),
      // user 1 is under the bound: untouched
      (1L, 2, "a", "b", 100L)))
  }

  test("ties beyond ts break by event_id: highest ids kept") {
    import spark.implicits._
    // all events share one ts — recency falls back to event_id desc
    val df = (0 until 6).map(i => (7L, ts(0), i.toLong, s"t$i"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = ExtraOps.packEventsCapped(df, lastN = 2)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getString(3))).toSeq
    assert(out == Seq((2, "t4", "t5")))
  }

  test("lastN outside the TopKPerGroup rewrite window is rejected") {
    intercept[IllegalArgumentException] {
      ExtraOps.packEventsCapped(synthetic(), lastN = 0)
    }
    intercept[IllegalArgumentException] {
      ExtraOps.packEventsCapped(synthetic(),
        lastN = graft.plans.TopKRewriteRule.maxK + 1)
    }
  }
}
