package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Mergeable-sketch operators with their THEORETICAL ERROR BOUNDS
  * asserted inside the differential. A sketch estimate is
  * engine-specific (DuckDB cannot replay Spark's GK or count-min
  * internals), but the bound the sketch guarantees is a portable claim:
  * each gate emits the exact quantities plus a `within_bound` boolean
  * the oracle expects to be `true`. The sketches are the 100 TB shape —
  * fixed memory, map-side partial, one narrow merge shuffle — while the
  * exact side of each gate is the verification harness, not the
  * production path. */
object SketchOps {

  /** GK/approx_percentile rank-error bound (hard, deterministic — not
    * probabilistic): the value returned for percentile p over n rows is
    * an ELEMENT of the data whose rank r satisfies |r − ⌈p·n⌉| ≤ n/acc.
    * The gate recomputes the returned element's true rank interval
    * [rank_lt+1, rank_le] with one join back to the data and checks the
    * guarantee (±1 slack for ceiling conventions). */
  def sketchQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val acc = 1000
    val li = load(spark, dir, "lineitem")
      .select("l_returnflag", "l_extendedprice")
    val ap = li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(acc)).as("qs"),
        count(lit(1)).as("n"))
    val probes = ap.select(col("l_returnflag"), col("n"),
        posexplode(col("qs")).as(Seq("i", "qv")))
      .withColumn("p", element_at(typedlit(Seq(0.25, 0.5, 0.75)),
        col("i") + 1))
    probes.join(li, Seq("l_returnflag"))
      .groupBy("l_returnflag", "p", "n", "qv")
      .agg(sum(when(col("l_extendedprice") <= col("qv"), 1L).otherwise(0L))
          .as("rank_le"),
        sum(when(col("l_extendedprice") < col("qv"), 1L).otherwise(0L))
          .as("rank_lt"))
      .select(col("l_returnflag"), col("p"), col("n"),
        ((col("rank_le").cast("double") >=
            ceil(col("p") * col("n")).cast("double")
              - col("n").cast("double") / acc - 1.0) &&
         ((col("rank_lt") + 1).cast("double") <=
            ceil(col("p") * col("n")).cast("double")
              + col("n").cast("double") / acc + 1.0)).as("within_bound"))
      .orderBy("l_returnflag", "p")
  }

  private val sketchQuantilesOracle: String =
    """SELECT l_returnflag, p, count(*) AS n, true AS within_bound
      |FROM lineitem CROSS JOIN (VALUES (0.25), (0.5), (0.75)) t(p)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Count-min heavy-hitter counts with the CMS guarantee asserted:
    * exact ≤ estimate ≤ exact + eps·N (the lower bound is
    * deterministic; the upper holds with confidence 0.99 and is
    * deterministic for fixed data + seed). The sketch build is the
    * distributed part — a fixed-size mergeable aggregate over the full
    * table; the collect reads ONE binary row, and the 5 probe keys are
    * the exact top-5 heavy hitters (count desc, key asc). */
  def sketchHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    val li = load(spark, dir, "lineitem")
    val eps = 0.001
    val sketchRow = li.agg(
        count_min_sketch(col("l_partkey"), lit(eps), lit(0.99), lit(42))
          .as("cms"),
        count(lit(1)).as("total"))
      .head()
    val cms = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchRow.getAs[Array[Byte]]("cms")))
    val total = sketchRow.getAs[Long]("total")
    val top = li.groupBy("l_partkey").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("l_partkey").asc)
      .limit(5)
      .collect()
      .map { r =>
        val key = r.getAs[Long]("l_partkey")
        val exact = r.getAs[Long]("exact_cnt")
        val est = cms.estimateCount(key)
        (key, exact, est >= exact && est <= exact + (eps * total).toLong + 1)
      }
    import spark.implicits._
    top.toSeq.toDF("l_partkey", "exact_cnt", "within_bound")
      .orderBy("l_partkey")
  }

  private val sketchHeavyHittersOracle: String =
    """SELECT l_partkey, exact_cnt, true AS within_bound FROM (
      |  SELECT l_partkey, count(*) AS exact_cnt FROM lineitem
      |  GROUP BY 1 ORDER BY exact_cnt DESC, l_partkey ASC LIMIT 5) t
      |ORDER BY l_partkey""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q_sketch_quantiles", sketchQuantiles,
      Some(sketchQuantilesOracle), "sketch/gk-quantile-bound"),
    QuerySpec("q_sketch_heavy_hitters", sketchHeavyHitters,
      Some(sketchHeavyHittersOracle), "sketch/count-min-bound"),
  )
}
