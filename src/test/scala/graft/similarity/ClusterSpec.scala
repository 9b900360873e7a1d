package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ClusterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("id", "v")

  test("lloyd separates two obvious clusters regardless of k seeds") {
    // two tight direction-clusters in 2-d; seeds (ids 0,1) both sit in
    // cluster A, so convergence REQUIRES the recenter steps to pull one
    // centroid over to B — a fit that only assigns once fails this
    val a = Seq(0L -> Seq(1.0, 0.02), 1L -> Seq(1.0, -0.02),
      2L -> Seq(0.98, 0.01), 3L -> Seq(1.0, 0.0))
    val b = Seq(10L -> Seq(0.02, 1.0), 11L -> Seq(-0.01, 1.0),
      12L -> Seq(0.0, 0.97))
    val out = Cluster.lloyd(df(a ++ b), k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.map(x => out(x._1)).toSet.size == 1, "cluster A split")
    assert(b.map(x => out(x._1)).toSet.size == 1, "cluster B split")
    assert(out(0L) != out(10L), "A and B collapsed into one cell")
  }

  test("fit is partition-independent: identical output under repartition") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .selectExpr("CAST(vec_id AS LONG) AS id",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
    val r1 = Cluster.lloyd(emb.repartition(3), k = 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val r2 = Cluster.lloyd(emb.repartition(11), k = 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(r1 == r2)
    assert(r1.map(_._2).size > 1)
  }

  test("persisted serving == refit, bit for bit") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .selectExpr("CAST(vec_id AS LONG) AS id",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
    val base = java.nio.file.Files
      .createTempDirectory("clusterspec").toString
    val store = new graft.pipeline.Store(spark, base)
    Cluster.buildPersisted(store, "km", emb, k = 8, iters = 2)
    val served = Cluster.assign(emb, Cluster.loadCentroids(store, "km"))
      .select("id", "cell", "cos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val refit = Cluster.lloyd(emb, k = 8, iters = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(served == refit)
    graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
  }

  test("empty cells drop out and stop attracting members") {
    // ids 0,1 seed two cells on the SAME direction — cell 1 empties on
    // the first assignment (ties go to the lower cell) and must not
    // resurface
    val rows = Seq(0L -> Seq(1.0, 0.0), 1L -> Seq(1.0, 0.0),
      2L -> Seq(0.9, 0.0), 3L -> Seq(0.0, 1.0))
    val out = Cluster.lloyd(df(rows), k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.values.toSet == Set(0), // survivors re-rank: only cell 0
      s"expected all in cell 0 after cell 1 emptied, got $out")
  }
}
