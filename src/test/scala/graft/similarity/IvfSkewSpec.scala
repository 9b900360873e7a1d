package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.Skew

class IvfSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("IVF top-k recalls brute-force neighbors with enough probes") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val index = Ivf.build(emb, k = 8)
    assert(index.centroids.length == 8)

    val exact = Ann.bruteForceTopK(emb, queries, k = 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))).toSet
    // probing ALL cells must equal brute force exactly
    val full = Ivf.topK(index, queries, k = 5, nProbe = 8)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))).toSet
    assert(full == exact)
    // probing 3/8 cells keeps decent recall
    val approx = Ivf.topK(index, queries, k = 5, nProbe = 3)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))).toSet
    assert(approx.intersect(exact).size >= exact.size / 2)
  }

  test("persisted index serves the same answers as the in-memory one") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val mem = Ivf.build(emb, k = 8)
    val st = new graft.pipeline.Store(spark,
      s"/tmp/graft_ss/p${ProcessHandle.current().pid}/ivf_spec_${System.nanoTime()}")
    Ivf.buildPersisted(st, "ivf", emb, k = 8)
    val loaded = Ivf.load(st, "ivf")
    assert(loaded.centroids.map(_._1).toSeq == mem.centroids.map(_._1).toSeq)
    def res(ix: Ivf.Index) = Ivf.topK(ix, queries, k = 5, nProbe = 3)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor"))).toSet
    assert(res(loaded) == res(mem))
    val e = intercept[IllegalArgumentException] {
      Ivf.load(st, "nope")
    }
    assert(e.getMessage.contains("buildPersisted"))
  }

  test("planted-cluster IVF recall gate stays >= 0.9 at nProbe 2/10") {
    val row = graft.ops.VectorOps
      .annIvfRecall(spark, "/root/testdata/sf0.001").collect().head
    assert(row.getAs[Long]("n_queries") > 0)
    assert(row.getAs[Double]("recall_at_5") >= 0.9)
  }

  test("shuffle-join probe path (large batch) matches the broadcast path") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val index = Ivf.build(emb, k = 8)
    val bc = Ivf.topK(index, queries, k = 5, nProbe = 3,
        broadcastProbes = Some(true))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val sh = Ivf.topK(index, queries, k = 5, nProbe = 3,
        broadcastProbes = Some(false))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(sh == bc && sh.nonEmpty)
    // note: at this size AQE may still plan the un-hinted join as
    // broadcast — the contract is result equality, not physical shape
  }

  test("salted join matches plain join results") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v") // key 1 is hot
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).orderBy("v")
      .select("k", "v", "name").collect().toSeq
    val salted = Skew.saltedJoin(big, small, Seq("k"), salt = 8)
      .orderBy("v").select("k", "v", "name").collect().toSeq
    assert(salted == plain)
    val saltedBy = Skew.saltedJoinBy(big, small, Seq("k"),
      Seq(col("v")), salt = 8).orderBy("v")
      .select("k", "v", "name").collect().toSeq
    assert(saltedBy == plain)
  }
}
