package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata.
  *
  * The Spark-side mechanics are real — schema, partition-parallel batch
  * processing via mapPartitions over a typed Dataset (the Scala analog of
  * mapInPandas: one iterator per partition, amortized per-batch setup),
  * deterministic output shapes. The actual codec call is STUBBED with a
  * deterministic fake (this container ships no image/audio libraries);
  * swapping `FakeCodec` for a real decoder is the only change needed.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, frames: Int)
  case class Features(media_id: Long, kind: String, n_bytes: Int,
      mean_byte: Double, feature: Array[Float])
  case class Frame(media_id: Long, frame_index: Int, payload: Array[Byte])

  /** STUB codec — deterministic fake "decode": derives a fixed-length
    * feature vector from byte statistics. A real implementation calls
    * into an image/audio library here, once per partition iterator. */
  object FakeCodec {
    def features(payload: Array[Byte], dim: Int = 8): Array[Float] = {
      val f = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        f(i % dim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      f
    }
  }

  /** Synthesize a deterministic media table from any id column — stands
    * in for `spark.read.format("binaryFile")` over an object store. */
  def syntheticMedia(spark: SparkSession, ids: DataFrame,
      idCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("media_id"))
      .withColumn("kind",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("media_id") % 3).cast("int") + 1))
      .withColumn("payload", sha2(col("media_id").cast("string"), 256).cast("binary"))
      .withColumn("width", (col("media_id") % 64).cast("int") + 1)
      .withColumn("height", (col("media_id") % 48).cast("int") + 1)
      .withColumn("frames", (col("media_id") % 16).cast("int") + 1)
      .as[MediaRow]
  }

  /** Decode + feature-extract, one partition at a time (mapInPandas
    * analog): codec state is initialized once per partition, rows stream
    * through it. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[Features] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup happens here (real codec: open decoder once)
      rows.map { r =>
        val bytes = r.payload
        val mean =
          if (bytes.isEmpty) 0.0
          else bytes.map(b => (b & 0xFF).toDouble).sum / bytes.length
        Features(r.media_id, r.kind, bytes.length, mean,
          FakeCodec.features(bytes))
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th frame index becomes
    * a row (payload sliced deterministically — a real impl seeks/decodes). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      (0 until r.frames by stride).map { i =>
        val len = math.max(1, r.payload.length / r.frames)
        val from = math.min(i * len, math.max(0, r.payload.length - len))
        Frame(r.media_id, i, r.payload.slice(from, from + len))
      }
    }
  }

  /** Metadata-only "resize": recompute dimensions, leave payload opaque
    * (a real impl re-encodes in the partition loop). */
  def resizeMeta(media: Dataset[MediaRow], maxDim: Int): DataFrame =
    media.toDF()
      .withColumn("scale",
        least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height"))))
      .withColumn("out_width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", ceil(col("height") * col("scale")).cast("int"))
      .drop("scale")
}
