package graft.tools

import org.apache.spark.sql.functions._

import graft.{Session, Tables}
import graft.dedup.CorpusIndex
import graft.pipeline.Store

/** Scale probe for the persisted-index incremental-dedup path: corpus
  * grows (1x / 8x / 32x replicated documents, reusing [[ScaleProbe]]'s
  * re-keyed replicas), the batch stays FIXED, and the index build is
  * separated from the per-batch assign — the production question is
  * "what does one batch cost against an ever-larger indexed corpus",
  * which only the assign time answers. Expect: build grows with the
  * corpus (one-time, amortized), assign grows with the CANDIDATE set
  * only (the index joins broadcast the batch side and never shuffle the
  * corpus; on the replicated corpus every copy band-collides, so
  * candidates grow with the factor — the worst case for assign).
  */
object IncrementalScaleProbe {
  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(8, 32)
    val src = "/root/testdata/sf0.1"
    val spark = Session.local()

    // Fixed batch: every fifth sf0.1 document, re-keyed clear of every
    // replica id range, split across the three decision paths — a pure
    // copy batch would exact-match everything and short-circuit the
    // banding/verify/closure work, measuring only the exact-index join:
    //  - %3=0: verbatim copy -> 'exact' (hash-index hit)
    //  - %3=1: one appended token -> 'near' (band collision + verify)
    //  - %3=2: synthetic text -> 'novel' (batch-local closure)
    val batch = Tables.load(spark, src, "documents")
      .filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 900000000L)
      .withColumn("text",
        when(col("doc_id") % 3 === 1, concat(col("text"), lit(" qq")))
          .when(col("doc_id") % 3 === 2,
            concat_ws(" ", lit("nv"), col("doc_id"), lit("aa"),
              col("doc_id"), lit("bb"), col("doc_id"), lit("cc")))
          .otherwise(col("text")))
      .localCheckpoint()

    def probe(factor: Int): Unit = {
      val dir = if (factor == 1) src else s"/tmp/sfx$factor"
      require(new java.io.File(s"$dir/documents.parquet").exists(),
        s"run `runMain graft.tools.ScaleProbe $factor q_text_tokens` first to build $dir")
      val store = new Store(spark,
        s"/tmp/graft_ss/p${ProcessHandle.current().pid}/cidx_probe$factor")
      val t0 = System.nanoTime()
      CorpusIndex.build(store, "c",
        Tables.load(spark, dir, "documents"), "text", "doc_id")
      val tBuild = (System.nanoTime() - t0) / 1e9
      def assignOnce(): Double = {
        val t = System.nanoTime()
        CorpusIndex.assign(store, "c", batch, "text", "doc_id",
            threshold = 0.2, maxIter = 20)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }
      assignOnce() // warm
      val tAssign = math.min(assignOnce(), assignOnce())
      println(f"[iscale] corpus x$factor%-3d build=${tBuild}%6.2fs  assign(fixed batch)=${tAssign}%6.2fs")
    }
    probe(1)
    factors.foreach(probe)
    spark.stop()
  }
}
