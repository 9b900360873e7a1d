package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LmOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("lmPerplexity scores every document with a finite positive ppl") {
    val rows = LmOps.lmPerplexity(spark, dir).collect()
    assert(rows.nonEmpty)
    val nDocs = graft.Tables.load(spark, dir, "documents").count()
    assert(rows.length == nDocs) // every doc has >= 2 tokens in the fixture
    rows.foreach { r =>
      val ppl = r.getAs[Double]("ppl")
      assert(ppl > 1.0 && ppl.isFinite, s"ppl out of range: $r")
      assert(r.getAs[Long]("n_pairs") >= 1L)
      assert(Set("train", "heldout").contains(r.getAs[String]("split")))
    }
    // both splits occur, so the gate exercises scoring unseen documents
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits == Set("train", "heldout"))
  }

  test("lmPerplexity: <unk> smoothing bounds ppl by the model branching") {
    // With add-one smoothing over V+1 outcomes, per-token probability is
    // at least 1/(c1 + V + 1) and at most (c12+1)/(c12 + V + 1) < 1, so
    // perplexity lies in (1, max context count + V + 1].
    val rows = LmOps.lmPerplexity(spark, dir).collect()
    val maxPpl = rows.map(_.getAs[Double]("ppl")).max
    val nTrainPairs = rows.filter(_.getAs[String]("split") == "train")
      .map(_.getAs[Long]("n_pairs")).sum
    assert(maxPpl <= nTrainPairs.toDouble + 17.0)
  }

  test("lmPerplexity is deterministic across runs") {
    val a = LmOps.lmPerplexity(spark, dir).collect().toSeq
    val b = LmOps.lmPerplexity(spark, dir).collect().toSeq
    assert(a == b)
  }

  test("persisted model serves identical scores to the refit path") {
    val refit = LmOps.lmPerplexity(spark, dir).collect().toSeq
    val served = LmOps.lmPerplexityIndexed(spark, dir).collect().toSeq
    assert(served == refit)
    // a second serve hits the already-built model (cache or store — the
    // contract is just: no divergence across serves)
    assert(LmOps.lmPerplexityIndexed(spark, dir).collect().toSeq == refit)
  }

  test("scoreWithModel fails loudly when no model was built") {
    val store = new graft.pipeline.Store(spark, "/tmp/lm_missing_model")
    val docs = graft.Tables.load(spark, dir, "documents")
    val e = intercept[IllegalArgumentException] {
      LmOps.scoreWithModel(store, "nope", docs)
    }
    assert(e.getMessage.contains("buildModel"))
  }
}
