package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Sketch-bound gates: the properties the differentials can't see —
  * determinism under a fixed seed, and that the bound checks are
  * actually exercised (not vacuously true on empty groups). */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("count-min estimates are deterministic for a fixed seed and " +
      "never undercount") {
    import org.apache.spark.util.sketch.CountMinSketch
    val li = graft.Tables.load(spark, dir, "lineitem")
    def sketch() = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(
      li.agg(count_min_sketch(col("l_partkey"), lit(0.001), lit(0.99),
        lit(42)).as("cms")).head().getAs[Array[Byte]]("cms")))
    val exact = li.groupBy("l_partkey").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val s1 = sketch(); val s2 = sketch()
    exact.foreach { case (k, c) =>
      assert(s1.estimateCount(k) == s2.estimateCount(k))
      assert(s1.estimateCount(k) >= c, s"undercount for key $k")
    }
  }

  test("quantile gate emits one checked row per (group, percentile), " +
      "none vacuous") {
    val rows = SketchOps.sketchQuantiles(spark, dir).collect()
    assert(rows.length == 9) // 3 return flags x 3 percentiles
    assert(rows.forall(_.getAs[Long]("n") > 0))
    assert(rows.forall(_.getAs[Boolean]("within_bound")))
  }
}
