package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.multimodal.Multimodal

/** Multimodal column plumbing surfaced through the oracle gate. The codec
  * is the deterministic stub (no media libraries in this container), but
  * that makes the PLUMBING — binary payload handling, partition-iterator
  * batch extraction, frame-index sampling arithmetic — exactly checkable:
  * the synthetic payload is the sha256 hex text, whose byte statistics
  * are integer-valued and engine-portable.
  */
object MultimodalOps {

  /** Partition-iterator feature extraction over binary payloads:
    * (media_id, kind, n_bytes, mean_byte). mean_byte sums 64 integers in
    * doubles — exact under any summation order, so it diffs cleanly. */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMedia(
      spark, load(spark, dir, "documents"), "doc_id")
    Multimodal.extractFeatures(media).toDF()
      .select("media_id", "kind", "n_bytes", "mean_byte")
      .orderBy("media_id")
  }

  /** Video frame sampling: every 4th frame index, fixed-stride payload
    * slices — emits (media_id, frame_index, n_frame_bytes). */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMedia(
      spark, load(spark, dir, "documents"), "doc_id")
    Multimodal.sampleFrames(media, stride = 4).toDF()
      .select(col("media_id"), col("frame_index"),
        length(col("payload")).as("n_frame_bytes"))
      .orderBy("media_id", "frame_index")
  }

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q_multimodal_features", multimodalFeatures, Some(
      """WITH m AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  sha256(CAST(doc_id AS VARCHAR)) AS hex FROM documents)
        |SELECT media_id, kind, CAST(length(hex) AS INT) AS n_bytes,
        |  list_reduce(list_transform(
        |    list_filter(regexp_split_to_array(hex, ''), c -> c != ''),
        |    c -> CAST(ascii(c) AS DOUBLE)), (a, x) -> a + x) / length(hex)
        |    AS mean_byte
        |FROM m ORDER BY media_id""".stripMargin), "multimodal/features"),
    QuerySpec("q_multimodal_frames", multimodalFrames, Some(
      """WITH m AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(doc_id % 16 AS INT) + 1 AS frames FROM documents
        |  WHERE doc_id % 3 = 2),
        |f AS (SELECT media_id, frames,
        |  unnest(generate_series(0, frames - 1, 4)) AS frame_index FROM m)
        |SELECT media_id, CAST(frame_index AS INT) AS frame_index,
        |  CAST(greatest(1, 64 // frames) AS INT) AS n_frame_bytes
        |FROM f ORDER BY media_id, frame_index""".stripMargin), "multimodal/frames"),
  )
}
