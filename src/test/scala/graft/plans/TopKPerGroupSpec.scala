package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TopKPerGroupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def data = {
    val rows = for (i <- 1 to 500) yield (i % 7, (i * 37) % 101, i)
    rows.toDF("g", "v", "id").repartition(8) // multiple input partitions
  }

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    data.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  test("matches the window row_number() <= k formulation exactly") {
    val native = TopK.perGroup(data, Seq(col("g")), Seq(col("v").desc, col("id").asc), 5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    val viaWindow = windowTopK(5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(native == viaWindow)
    assert(native.size == 35) // 7 groups x 5
  }

  test("k larger than group size returns whole groups, once each") {
    val small = Seq((1, 10, 1), (1, 20, 2), (2, 30, 3)).toDF("g", "v", "id")
    val out = TopK.perGroup(small, Seq(col("g")), Seq(col("v").desc, col("id").asc), 100)
      .collect()
    assert(out.length == 3)
  }

  test("empty group = global top-k (AllTuples distribution)") {
    val out = TopK.perGroup(data, Seq.empty, Seq(col("v").desc, col("id").asc), 3)
      .collect().map(_.getInt(2)).toSet
    val expected = data.orderBy(col("v").desc, col("id").asc).limit(3)
      .collect().map(_.getInt(2)).toSet
    assert(out == expected)
  }

  test("plans as partial -> exchange -> final (map-side shuffle reduction)") {
    val plan = TopK.perGroup(data, Seq(col("g")), Seq(col("v").desc), 5)
      .queryExecution.executedPlan.toString()
    assert("TopKPerGroup".r.findAllIn(plan).size == 2,
      s"expected partial+final TopKPerGroupExec in:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), s"expected hash exchange in:\n$plan")
    // partial must be BELOW the exchange: shuffle reads <= groups*k rows
    val idxFinal = plan.indexOf("TopKPerGroup")
    val idxExchange = plan.indexOf("Exchange hashpartitioning")
    val idxPartial = plan.indexOf("TopKPerGroup", idxExchange)
    assert(idxFinal < idxExchange && idxExchange < idxPartial)
  }

  test("optimizer rule rewrites row_number()<=k filters to TopKPerGroup") {
    val plan = windowTopK(5).queryExecution.executedPlan.toString()
    assert(plan.contains("TopKPerGroup"),
      s"expected auto-rewrite to TopKPerGroup in:\n$plan")
    // results are identical to the un-rewritten semantics (rank() over a
    // total order == row_number, and rank() is NOT rewritten)
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val viaRank = data.withColumn("rn", rank().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    val rewritten = windowTopK(5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(rewritten == viaRank)
  }

  test("optimizer rule leaves multi-expression windows and big k alone") {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val multi = data
      .withColumn("rn", row_number().over(w))
      .withColumn("lg", lag("v", 1).over(w))
      .filter(col("rn") <= 5)
    assert(!multi.queryExecution.executedPlan.toString().contains("TopKPerGroup"))
    val bigK = data.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopKRewriteRule.maxK + 1)
    assert(!bigK.queryExecution.executedPlan.toString().contains("TopKPerGroup"))
  }

  test("keeps the rank column correct after rewrite") {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val out = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .orderBy("g", "rn").collect()
    assert(out.nonEmpty)
    out.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("rn")).sorted.toSeq == Seq(1, 2))
    }
  }

  test("partial-phase group cap streams overflow keys through, stays exact") {
    // 150k distinct groups in ONE partition with k=8 exceeds the
    // per-partition retained-rows cap (2^20/8 = 131072 groups), forcing
    // the passthrough fallback for overflow keys; the final phase must
    // still be exact. (The cap is per map partition — spreading the
    // groups over several partitions would dodge it.)
    val n = 300000
    val wide = spark.range(n.toLong).toDF("id")
      .withColumn("g", col("id") % 150000)
      .withColumn("v", (col("id") * 37) % 101)
      .repartition(1)
    val native = TopK.perGroup(wide, Seq(col("g")),
        Seq(col("v").desc, col("id").asc), 8)
      .agg(count(lit(1)), sum("v"), sum("id")).collect()(0)
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val viaRank = wide.withColumn("rn", rank().over(w)).filter(col("rn") <= 8)
      .agg(count(lit(1)), sum("v"), sum("id")).collect()(0)
    assert(native == viaRank)
    assert(native.getLong(0) == 300000L) // k >= group size: all rows kept
  }

  test("rewrite fires on compound filters: rn === 1 && residual (joinNearest shape)") {
    val w = Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)
    val nearest = data.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("v") <= 50)
      .drop("rn")
    val plan = nearest.queryExecution.executedPlan.toString()
    assert(plan.contains("TopKPerGroup"),
      s"expected compound-filter rewrite to TopKPerGroup in:\n$plan")
    // residual predicate still applies: identical to the un-rewritten form
    val expected = data.withColumn("rn", rank().over(w))
      .filter(col("rn") === 1 && col("v") <= 50).drop("rn")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    val got = nearest.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == expected)
  }

  test("compound filter with several rank bounds takes the tightest k") {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val both = data.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 9 && col("rn") <= 3)
    val nodes = both.queryExecution.optimizedPlan.collect {
      case t: TopKPerGroup => t
    }
    assert(nodes.map(_.k) == Seq(3), s"expected a single k=3 node, got $nodes")
    assert(both.count() == 21) // 7 groups x 3
  }

  test("duplicate order values keep deterministic winners via tie-break") {
    val ties = Seq((1, 5, 1), (1, 5, 2), (1, 5, 3), (1, 4, 4)).toDF("g", "v", "id")
    val out = TopK.perGroup(ties, Seq(col("g")), Seq(col("v").desc, col("id").asc), 2)
      .collect().map(_.getInt(2)).toSet
    assert(out == Set(1, 2)) // v ties broken by smallest id
  }
}
