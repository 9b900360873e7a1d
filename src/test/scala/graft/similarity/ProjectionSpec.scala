package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The JL property the projection exists for: geometry survives the
  * 64 → 16 narrowing well enough to rank ANN candidates. */
class ProjectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  test("near-identical pairs stay near-identical; distortion is bounded") {
    val emb = graft.Tables.load(spark, dir, "embeddings").limit(64)
    val orig = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).toMap
    val proj = Projection.project(emb, "embedding", "vec_id", 16, 64)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).toMap
    // a twin made by a 0.1%-scale perturbation has cosine ~1 in both
    // spaces; projection must not tear it apart
    val ids = orig.keySet.toSeq.sorted
    val a = orig(ids.head)
    val aTwin = a.zipWithIndex.map { case (x, j) => x * (1 + 0.001 * (j % 5)) }
    val twinDf = spark.createDataFrame(java.util.List.of(
        org.apache.spark.sql.Row(0L, a.toSeq),
        org.apache.spark.sql.Row(1L, aTwin.toSeq)),
      emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
        .schema)
    val tp = Projection.project(twinDf, "embedding", "vec_id", 16, 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(cos(tp(0L), tp(1L)) > 0.98)
    // average absolute cosine distortion over sampled pairs stays within
    // the ~1/sqrt(16) JL regime (loose bound: mean < 0.25)
    val pairs = for (i <- ids.indices; j <- i + 1 until math.min(i + 5, ids.size))
      yield (ids(i), ids(j))
    val dist = pairs.map { case (x, y) =>
      math.abs(cos(orig(x), orig(y)) - cos(proj(x), proj(y))) }
    assert(dist.sum / dist.size < 0.25,
      f"mean cosine distortion ${dist.sum / dist.size}%.3f")
  }
}
