package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata.
  *
  * The Spark-side mechanics are real — schema, partition-parallel batch
  * processing via mapPartitions over a typed Dataset (the Scala analog of
  * mapInPandas: one iterator per partition, amortized per-batch setup),
  * deterministic output shapes. Decoding goes through the [[MediaCodec]]
  * interface: [[ByteStatCodec]] is the deterministic no-library fallback
  * (and the oracle-checked default — its output is replayable in SQL);
  * [[ImageIoCodec]] is a real pure-JVM image decoder (javax.imageio:
  * PNG/JPEG/BMP/GIF ship with the JDK). Audio/video codecs would slot in
  * the same way; this container ships no media libraries for those.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, frames: Int)
  case class Features(media_id: Long, kind: String, n_bytes: Int,
      mean_byte: Double, feature: Array[Float])
  case class Frame(media_id: Long, frame_index: Int, payload: Array[Byte])

  /** Pluggable decode step. Implementations must be cheap to serialize
    * (they ship inside task closures) and deterministic. */
  trait MediaCodec extends Serializable {
    /** Fixed-length feature vector for one payload. */
    def features(payload: Array[Byte], dim: Int): Array[Float]
    /** Decoded pixel dimensions, when the payload is a decodable image. */
    def dims(payload: Array[Byte]): Option[(Int, Int)]
  }

  /** Deterministic byte-statistics codec — no decode, works on any
    * payload, SQL-replayable (the DuckDB oracle for the multimodal gates
    * reproduces it exactly). */
  object ByteStatCodec extends MediaCodec {
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val f = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        f(i % dim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      f
    }
    def dims(payload: Array[Byte]): Option[(Int, Int)] = None
  }

  /** Real image decode via javax.imageio (pure JVM). Features are mean
    * luminances (0..1) over `dim` vertical bands of the decoded image;
    * undecodable payloads fall back to [[ByteStatCodec]] so mixed media
    * tables keep flowing (the fallback is observable via dims = None). */
  object ImageIoCodec extends MediaCodec {
    private def decode(payload: Array[Byte]) =
      // ImageIO returns null for unrecognized formats but THROWS for
      // recognized-yet-corrupt payloads (e.g. truncated PNG) — both must
      // take the fallback path, not kill the task
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case _: Exception => None }

    def features(payload: Array[Byte], dim: Int): Array[Float] =
      decode(payload) match {
        case None => ByteStatCodec.features(payload, dim)
        case Some(img) =>
          val (w, h) = (img.getWidth, img.getHeight)
          val f = new Array[Float](dim)
          val n = new Array[Int](dim)
          var x = 0
          while (x < w) {
            val band = x * dim / w
            var y = 0
            while (y < h) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
                (rgb & 0xFF)) / (3.0f * 255.0f)
              f(band) += lum
              n(band) += 1
              y += 1
            }
            x += 1
          }
          var b = 0
          while (b < dim) { if (n(b) > 0) f(b) /= n(b); b += 1 }
          f
      }

    def dims(payload: Array[Byte]): Option[(Int, Int)] =
      decode(payload).map(i => (i.getWidth, i.getHeight))
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
    * through it. Defaults to the SQL-replayable [[ByteStatCodec]]. */
  def extractFeatures(media: Dataset[MediaRow],
      codec: MediaCodec = ByteStatCodec, dim: Int = 8): Dataset[Features] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup happens here (real codec: open decoder once)
      rows.map { r =>
        val bytes = r.payload
        val mean =
          if (bytes.isEmpty) 0.0
          else bytes.map(b => (b & 0xFF).toDouble).sum / bytes.length
        Features(r.media_id, r.kind, bytes.length, mean,
          codec.features(bytes, dim))
      }
    }
  }

  /** Decoded-dimension audit: actual pixel dims per row where the codec
    * can decode the payload (None → fallback path was taken). */
  def decodedDims(media: Dataset[MediaRow], codec: MediaCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val d = codec.dims(r.payload)
        (r.media_id, d.isDefined,
          d.map(_._1).getOrElse(-1), d.map(_._2).getOrElse(-1))
      }
    }.toDF("media_id", "decoded", "dec_width", "dec_height")
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

  /** Average-hash (aHash) perceptual signatures over the payload bytes —
    * the classic image near-dup primitive on the deterministic
    * ByteStat representation: the byte stream folds into `bands`
    * integer band sums (position strided by `bands` — for a decoded
    * image these would be downsampled-cell luminances; the plumbing is
    * identical), and bit j of the signature is set iff band j's sum
    * exceeds the overall mean. All-integer arithmetic (the exact
    * cross-multiplication `band*bands > total` instead of a float
    * mean), so signatures are bit-identical across engines and
    * partition orders; assembly is bitwise-OR of distinct powers (no
    * additive overflow at bit 63).
    *
    * 64 bands (the standard 64-bit aHash) by default — signature width
    * is what keeps downstream band-bucketing sub-quadratic: a 16-bit
    * variant measured 120x cost at 32x corpus because its 4-bit
    * quarters only take 16 values and every bucket saturates; 16-bit
    * quarters give 65536, and collisions stay proportional to true
    * near-duplicates. */
  def aHashSignatures(media: Dataset[MediaRow], bands: Int = 64): DataFrame = {
    // bytes via hex(): two hex chars per byte. A cast-to-string would
    // reinterpret arbitrary media bytes as UTF-8 (replacement chars,
    // collapsed sequences) — signatures must reflect the actual bytes.
    val reps = s"CAST(ceil(size(codes) / CAST($bands AS DOUBLE)) AS INT)"
    val df = media.toDF()
      .select(col("media_id"), col("kind"), hex(col("payload")).as("hx"))
      .withColumn("codes", expr(
        "transform(sequence(1, CAST(length(hx) / 2 AS INT)), " +
          "i -> CAST(conv(substring(hx, 2 * i - 1, 2), 16, 10) AS INT))"))
      .withColumn("total", expr(
        "aggregate(codes, CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .withColumn("bs", expr(
        s"transform(sequence(0, $bands - 1), j -> " +
          s"aggregate(sequence(1, $reps), CAST(0 AS BIGINT), " +
          s"(a, r) -> a + coalesce(try_element_at(codes, " +
          s"j + 1 + (r - 1) * $bands), 0)))"))
    df.select(col("media_id"), col("kind"),
      (0 until bands).map(j =>
        when(element_at(col("bs"), j + 1) * bands > col("total"),
          lit(1L << j)).otherwise(0L))
        .reduce(_.bitwiseOR(_)).as("sig"))
  }
}
