package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.pipeline.{FsUtils, Store}

/** Continuous curation scoring — the streaming form of the persisted
  * model lifecycles: each micro-batch of arriving documents is scored
  * against the PERSISTED LM ([[graft.ops.LmOps.scoreWithModel]]) and
  * DSIR ([[graft.ops.CurateOps.scoreDsirModel]]) models, gated by fixed
  * thresholds (perplexity cap = the CC-Net-style noise gate; DSIR floor
  * = the domain-match gate), and the per-document decision published to
  * a batch-tagged decisions table.
  *
  * Unlike [[StreamingDedup.corpusIngest]] there is no cross-batch state:
  * scoring is stateless given the models, so per-batch cost is exactly
  * one broadcast-join scoring pass over the batch. Replay safety is the
  * same contract — foreachBatch is at-least-once, so each batch's
  * decision files are keyed by batch id and re-published, never blindly
  * appended ([[FsUtils.clearBatch]] then [[FsUtils.publishBatch]]).
  *
  * 100 TB shape: the models are a few KB (vocab² bigrams, 256 DSIR
  * buckets) broadcast against each batch; nothing corpus-sized is ever
  * read — the continuous pipeline serves from artifacts the batch side
  * trained once. */
object StreamingCurate {

  /** `compactEvery = Some(n)` folds the per-batch decision file drops
    * into one compacted generation after every n-th batch (always
    * excluding the current — only replayable — tag), the same unbounded-
    * file-growth fix [[StreamingDedup.corpusIngest]] carries; without it
    * a long-running ingest grows one+ decision file per batch forever. */
  def scoreIngest(spark: SparkSession, landing: String, schema: StructType,
      store: Store, lmPrefix: String, dsirPrefix: String, checkpoint: String,
      pplCap: Double, dsirFloor: Long,
      decisionsTable: String = "decisions",
      compactEvery: Option[Int] = None): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val b = batch.localCheckpoint()
        if (!b.isEmpty) {
          val tag = bid.toString
          FsUtils.clearBatch(store.path(decisionsTable), tag)
          val ppl = graft.ops.LmOps.scoreWithModel(store, lmPrefix, b)
          val ds = graft.ops.CurateOps.scoreDsirModel(store, dsirPrefix, b)
          // LEFT joins from the batch id set: a document too short to
          // score (no bigram for the LM, no token for DSIR) must still
          // get an explicit keep=false decision row — the decisions
          // table is the authoritative per-document verdict, and a
          // silently absent doc_id is neither kept nor rejected.
          val res = b.select(col("doc_id"), col("lang"))
            .join(ppl.select("doc_id", "lang", "ppl"), Seq("doc_id", "lang"),
              "left")
            .join(ds.select("doc_id", "lang", "dsir_micro"),
              Seq("doc_id", "lang"), "left")
            .select(col("doc_id"), col("lang"), col("ppl"), col("dsir_micro"),
              coalesce(col("ppl") <= pplCap
                && col("dsir_micro") >= dsirFloor, lit(false)).as("keep"))
            .localCheckpoint()
          FsUtils.publishBatch(res, store.path(decisionsTable), tag)
          compactEvery.foreach { n =>
            if ((bid + 1) % n == 0)
              store.compactBatched(decisionsTable, res.schema,
                excludeTags = Set(tag))
          }
        }
        ()
      }
      .start()
}
