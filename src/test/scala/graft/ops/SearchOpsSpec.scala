package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SearchOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bm25 top-k: dense ranks, non-increasing scores, hit bounds") {
    val rows = SearchOps.searchBm25(spark, dir).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 20))
    val scores = rows.map(_.getAs[Long]("score_micro")).toSeq
    assert(scores == scores.sorted(Ordering[Long].reverse))
    assert(scores.forall(_ > 0L))
    rows.foreach { r =>
      val h = r.getAs[Long]("n_terms_hit")
      assert(h >= 1L && h <= 3L)
    }
  }

  test("bm25 ranking prefers more distinct query terms on equal-length docs") {
    import spark.implicits._
    // four same-length docs: 0 hits none, 1 hits one term, 2 hits two,
    // 3 hits all three — BM25 with uniform dl must rank 3 > 2 > 1 and
    // exclude 0 entirely
    val docs = Seq(
      (0L, "en", "aa bb cc dd ee ff"),
      (1L, "en", "table bb cc dd ee ff"),
      (2L, "en", "table value cc dd ee ff"),
      (3L, "en", "table value window dd ee ff"))
      .toDF("doc_id", "lang", "text")
    val out = SearchOps.bm25TopK(docs, Seq("table", "value", "window"), 10)
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(3L, 2L, 1L))
  }

  test("retrieval metrics: one row per probe, all metrics in [0,1], " +
    "ndcg=1 iff every retrieved doc is relevant and fills the ideal slots") {
    val rows = SearchOps.retrievalMetrics(spark, dir).collect()
    assert(rows.length == 8)
    assert(rows.map(_.getAs[Long]("qid")).toSeq == (0L to 7L))
    rows.foreach { r =>
      val recall = r.getAs[Long]("recall_ppm")
      val mrr = r.getAs[Long]("mrr_ppm")
      val ndcg = r.getAs[Long]("ndcg_ppm")
      val nHit = r.getAs[Long]("n_hit")
      val nRel = r.getAs[Long]("n_rel")
      assert(recall >= 0L && recall <= 1000000L)
      assert(mrr >= 0L && mrr <= 1000000L)
      assert(ndcg >= 0L && ndcg <= 1000000L)
      assert(nHit <= math.min(nRel, 10L))
      // a hit anywhere implies a positive reciprocal rank and dcg
      assert((nHit > 0) == (mrr > 0L))
      assert((nHit > 0) == (ndcg > 0L))
      // all 10 slots relevant with >=10 relevant docs => perfect ndcg
      // (exact integer: dcg == idcg, so the ppm DIV is exactly 1e6)
      if (nHit == 10L && nRel >= 10L) assert(ndcg == 1000000L)
    }
  }

  test("retrieval metrics are deterministic across runs") {
    val a = SearchOps.retrievalMetrics(spark, dir).collect().toSeq
    val b = SearchOps.retrievalMetrics(spark, dir).collect().toSeq
    assert(a == b)
  }

  test("bm25 is deterministic across runs") {
    val a = SearchOps.searchBm25(spark, dir).collect().toSeq
    val b = SearchOps.searchBm25(spark, dir).collect().toSeq
    assert(a == b)
  }
}
