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
  /** Perceptual-hash near-dup pairs over the media payloads: 64-bit
    * aHash signatures ([[Multimodal.aHashSignatures]]), candidates from
    * 16-bit quarter banding within kind (pigeonhole: ≤3 damaged bits
    * leave ≥1 intact quarter, so recall at hamming ≤ 3 is exact — the
    * [[graft.dedup.Dedup.simhashPairs]] argument), verified by
    * bit_count of the XOR. Signature build, banding, and verify are all
    * integer arithmetic — fully DuckDB-differential.
    *
    * The fixture plants TWINS for media_id < 50: the source payload
    * with its final byte overwritten — one band sum moves, so the twin
    * signature differs in at most a few mean-crossing bits and the pair
    * surfaces at small hamming. Unrelated sha-derived payloads sit at
    * hamming ~32 and 16-bit quarters make their collision odds
    * negligible — at a 32x corpus the candidate volume tracks the
    * planted duplicates, not corpus² (the 4-bit-quarter variant
    * measured 120x cost at 32x data before this geometry). */
  def multimodalPhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Multimodal.syntheticMedia(
      spark, load(spark, dir, "documents"), "doc_id").toDF()
    val twins = base.filter(col("media_id") < 50)
      .select((col("media_id") + 1000000L).as("media_id"), col("kind"),
        concat(expr("substring(CAST(payload AS STRING), 1, 63)"), lit("z"))
          .cast("binary").as("payload"),
        col("width"), col("height"), col("frames"))
    val media = base.unionByName(twins).as[Multimodal.MediaRow]
    val sigs = Multimodal.aHashSignatures(media)
    val quarters = sigs.select(col("media_id"), col("kind"), col("sig"),
      posexplode(array((0 until 4).map(q =>
        shiftright(col("sig"), q * 16).bitwiseAND(65535)): _*))
        .as(Seq("q", "qv")))
    val a = quarters.select(col("kind"), col("q"), col("qv"),
      col("media_id").as("id_a"), col("sig").as("sig_a"))
    val b = quarters.select(col("kind"), col("q"), col("qv"),
      col("media_id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("kind", "q", "qv"))
      .filter(col("id_a") < col("id_b"))
      .select("kind", "id_a", "id_b", "sig_a", "sig_b").distinct()
      .select(col("kind"), col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("int")
          .as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("kind", "id_a", "id_b")
  }

  private val multimodalPhashOracle: String = {
    // 64-byte fixture payloads with 64 bands: band j's sum is exactly
    // byte j+1 (codes[j+1] — DuckDB lists are 1-based)
    val sigExpr = (0 until 64).map { j =>
      // DuckDB rejects 1::BIGINT << 63 (overflow); bit 63 is the
      // minimum-long literal, same two's-complement value Spark's
      // lit(1L << 63) produces
      val bit = if (j == 63) s"CAST(${Long.MinValue} AS BIGINT)"
        else s"CAST(1 AS BIGINT) << $j"
      s"(CASE WHEN codes[${j + 1}] * 64 > total THEN $bit " +
        "ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" |\n  ")
    s"""WITH m0 AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
       |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
       |    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |  sha256(CAST(doc_id AS VARCHAR)) AS h FROM documents),
       |m AS (SELECT media_id, kind, h FROM m0
       |  UNION ALL
       |  SELECT media_id + 1000000, kind, substr(h, 1, 63) || 'z'
       |  FROM m0 WHERE media_id < 50),
       |c AS (SELECT media_id, kind,
       |  list_transform(generate_series(1, length(h)),
       |    i -> CAST(ascii(substr(h, i, 1)) AS BIGINT)) AS codes FROM m),
       |bnd AS (SELECT media_id, kind, codes,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
       |    (a, x) -> a + x) AS total
       |  FROM c),
       |s AS MATERIALIZED (SELECT media_id, kind,
       |  $sigExpr AS sig
       |  FROM bnd),
       |qs AS MATERIALIZED (SELECT media_id, kind, sig, u.q,
       |    (sig >> (u.q * 16)) & 65535 AS qv
       |  FROM s, unnest([0, 1, 2, 3]) AS u(q)),
       |cand AS (SELECT DISTINCT a.kind, a.media_id AS id_a,
       |    b2.media_id AS id_b, a.sig AS sig_a, b2.sig AS sig_b
       |  FROM qs a JOIN qs b2 ON b2.kind = a.kind AND b2.q = a.q
       |    AND b2.qv = a.qv AND a.media_id < b2.media_id)
       |SELECT kind, id_a, id_b,
       |  CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3
       |ORDER BY kind, id_a, id_b""".stripMargin
  }

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

  /** REAL image-decoder differential (javax.imageio end-to-end): a
    * deterministic PNG is ENCODED per row inside the partition iterator —
    * width/height/pixel pattern are closed-form in media_id — decoded
    * back through [[Multimodal.ImageIoCodec]], and the decoded dims,
    * corrupt-fallback flags, and first band-luminance feature are diffed
    * against the closed-form oracle. Every 5th payload is truncated to 20
    * bytes (a recognized-but-corrupt PNG), which must take the fallback
    * (decoded = false, dims = -1) without killing the task.
    *
    * The pixel pattern is black/white columns ((media_id + x) even →
    * white), so every luminance is EXACTLY 0.0f or 1.0f: the codec's
    * float band accumulation is exact and the single final division
    * matches the oracle's double ratio within well under the round-4
    * comparison granularity. */
  /** The synthesized PNG table is FIXTURE (the encode is not the operator
    * under test — the decode is), so it is memoized and materialized per
    * (session, dir): ImageIO.write costs ~1 ms/row and would otherwise
    * dominate the timed decode runs. */
  private val mediaCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String),
      org.apache.spark.sql.Dataset[Multimodal.MediaRow]]

  private def pngMedia(spark: SparkSession,
      dir: String): org.apache.spark.sql.Dataset[Multimodal.MediaRow] =
    mediaCache.getOrElseUpdate((spark, dir), {
      import spark.implicits._
      load(spark, dir, "embeddings")
        .select(col("vec_id").cast("long").as("id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val w = (id % 13).toInt + 1
            val h = (id % 7).toInt + 1
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var x = 0
            while (x < w) {
              val rgb = if ((id + x) % 2 == 0) 0xFFFFFF else 0x000000
              var y = 0
              while (y < h) { img.setRGB(x, y, rgb); y += 1 }
              x += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            val png = bos.toByteArray
            val payload = if (id % 5 == 4) png.take(20) else png
            Multimodal.MediaRow(id, "image", payload, w, h, 1)
          }
        }.localCheckpoint()
    })

  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    val media = pngMedia(spark, dir)
    val dims = Multimodal.decodedDims(media, Multimodal.ImageIoCodec)
    val feats = Multimodal
      .extractFeatures(media, Multimodal.ImageIoCodec, dim = 4).toDF()
      .select(col("media_id"),
        round(element_at(col("feature"), 1).cast("double"), 4).as("f1"))
    dims.join(feats, "media_id")
      .select(col("media_id"), col("decoded"), col("dec_width"),
        col("dec_height"),
        when(col("decoded"), col("f1")).as("band0_lum"))
      .orderBy("media_id")
  }

  /** Closed-form replay: band 0 spans x in [0, floor((w-1)/4)], its mean
    * luminance is the white-column fraction (column parity matches
    * media_id's), and corrupt rows (media_id % 5 = 4) must have fallen
    * back. The PNG bytes themselves never need replaying — the decode is
    * verified through what it PRODUCES. */
  private val multimodalDecodeOracle: String =
    """WITH d AS (SELECT CAST(vec_id AS BIGINT) AS media_id,
      |    CAST(vec_id % 13 AS INT) + 1 AS w,
      |    CAST(vec_id % 7 AS INT) + 1 AS h,
      |    (vec_id % 5 = 4) AS corrupt,
      |    CAST(vec_id % 2 AS INT) AS p
      |  FROM embeddings),
      |f AS (SELECT media_id, w, h, corrupt,
      |    ((w - 1) // 4) + 1 AS n0, p
      |  FROM d)
      |SELECT media_id, NOT corrupt AS decoded,
      |  CASE WHEN corrupt THEN -1 ELSE w END AS dec_width,
      |  CASE WHEN corrupt THEN -1 ELSE h END AS dec_height,
      |  CASE WHEN corrupt THEN NULL ELSE
      |    round(CAST((n0 + 1 - p) // 2 AS DOUBLE) / n0, 4) END AS band0_lum
      |FROM f ORDER BY media_id""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q_multimodal_decode", multimodalDecode,
      Some(multimodalDecodeOracle), "multimodal/real-image-decode"),
    QuerySpec("q_multimodal_phash", multimodalPhash,
      Some(multimodalPhashOracle), "multimodal/perceptual-hash-dedup"),
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
