package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic properties of the k-means SemDedup path — the part the
  * rows-only gate can't check (k-means cells aren't replayable in the
  * oracle engine; the decision core's full differential rides
  * q_semdedup_portable). The fixture plants 50 twins (vec_id + 100000,
  * components scaled by ≤0.4%) whose cosine to their source is ~0.99995,
  * far above the 0.9 threshold. */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val result = {
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val twins = e.filter(col("vec_id") < 50)
      .select((col("vec_id") + lit(100000L)).as("vec_id"),
        transform(col("embedding"), (x, j) =>
          x * (lit(1.0) + lit(0.001) * (((j + lit(1)) % 5).cast("double"))))
          .as("embedding"))
    SemDedup.semDedup(e.unionAll(twins), "embedding", "vec_id",
      threshold = 0.9, k = 16).localCheckpoint()
  }

  test("every input vector gets exactly one decision row") {
    assert(result.count() === 550)
    assert(result.select("id").distinct().count() === 550)
  }

  test("each group keeps exactly one member") {
    val bad = result.groupBy("group_id")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
      .filter(col("kept") =!= 1L)
    assert(bad.isEmpty, bad.collect().mkString(", "))
  }

  test("groups never span cells (edges are within-cell by construction)") {
    val bad = result.groupBy("group_id")
      .agg(countDistinct("cell").as("nc")).filter(col("nc") > 1)
    assert(bad.isEmpty, bad.collect().mkString(", "))
  }

  test("persisted-index serving decisions match the refit path exactly") {
    val e = graft.Tables.load(spark, dir, "embeddings")
    val base = java.nio.file.Files.createTempDirectory("semdedupspec").toString
    val store = new graft.pipeline.Store(spark, base)
    graft.similarity.Ivf.buildPersisted(store, "sd", e, k = 16)
    val served = SemDedup.semDedupWithIndex(
      graft.similarity.Ivf.load(store, "sd"), threshold = 0.9).collect()
    val refit = SemDedup.semDedup(e, "embedding", "vec_id",
      threshold = 0.9, k = 16).collect()
    assert(served.map(_.toString).sorted.toSeq ==
      refit.map(_.toString).sorted.toSeq)
  }

  test("planted twins collapse: same k-means cell means same group") {
    val src = result.filter(col("id") < 50)
      .select(col("id"), col("cell").as("c_s"), col("group_id").as("g_s"))
    val twin = result.filter(col("id") >= 100000L)
      .select((col("id") - 100000L).as("id"), col("cell").as("c_t"),
        col("group_id").as("g_t"))
    val joined = src.join(twin, Seq("id")).localCheckpoint()
    // a 0.04%-perturbed twin should land in its source's cell virtually
    // always; tolerate a few boundary cases but not systematic splits
    val sameCell = joined.filter(col("c_s") === col("c_t"))
    assert(sameCell.count() >= 45, s"only ${sameCell.count()}/50 twins share a cell")
    // within a shared cell the pair is above threshold, so MUST be grouped
    val split = sameCell.filter(col("g_s") =!= col("g_t"))
    assert(split.isEmpty, split.collect().mkString(", "))
  }
}
