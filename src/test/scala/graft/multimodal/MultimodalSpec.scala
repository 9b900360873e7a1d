package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark,
    spark.range(30).toDF("id"), "id")

  test("binary media table has typed metadata and opaque payloads") {
    val rows = media.collect()
    assert(rows.length == 30)
    assert(rows.forall(r => r.payload.nonEmpty && r.width > 0))
    assert(rows.map(_.kind).toSet == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and partition-parallel") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media.repartition(7))
      .collect().sortBy(_.media_id)
    assert(f1.length == 30)
    assert(f1.zip(f2).forall { case (a, b) =>
      a.feature.toSeq == b.feature.toSeq && a.mean_byte == b.mean_byte })
    assert(f1.forall(_.feature.length == 8))
  }

  test("frame sampling emits every stride-th frame for videos only") {
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_index % 2 == 0))
    val vids = media.filter(_.kind == "video").collect()
    val expected = vids.map(v => (v.frames + 1) / 2).sum
    assert(frames.length == expected)
  }

  /** Deterministic in-memory PNG: a horizontal gradient where band b of 8
    * has constant gray value b*32. */
  private def gradientPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val g = (x * 8 / w) * 32
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoCodec really decodes: band luminances and dims from pixels") {
    val png = gradientPng(64, 16)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png, 64, 16, 1),
      Multimodal.MediaRow(2L, "image", Array[Byte](1, 2, 3), 0, 0, 1))
    val ds = spark.createDataset(rows)
    val feats = Multimodal.extractFeatures(ds, Multimodal.ImageIoCodec)
      .collect().sortBy(_.media_id)
    // decoded gradient: band b has constant gray b*32 -> lum b*32/255
    val expected = (0 until 8).map(b => (b * 32) / 255.0f)
    feats(0).feature.toSeq.zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-4f, s"got $got want $want")
    }
    // undecodable payload falls back to byte-stats, never throws
    assert(feats(1).feature.toSeq ==
      Multimodal.ByteStatCodec.features(Array[Byte](1, 2, 3), 8).toSeq)

    // recognized-but-corrupt payload (real PNG magic, truncated body):
    // ImageIO.read THROWS here rather than returning null — the codec
    // must still take the fallback, not kill the task
    val corrupt = png.take(24)
    val cf = Multimodal.extractFeatures(
        spark.createDataset(Seq(Multimodal.MediaRow(3L, "image", corrupt, 0, 0, 1))),
        Multimodal.ImageIoCodec)
      .collect()(0)
    assert(cf.feature.toSeq ==
      Multimodal.ByteStatCodec.features(corrupt, 8).toSeq)

    val dims = Multimodal.decodedDims(ds, Multimodal.ImageIoCodec)
      .collect().sortBy(_.getLong(0))
    assert(dims(0).getBoolean(1) && dims(0).getInt(2) == 64 &&
      dims(0).getInt(3) == 16)
    assert(!dims(1).getBoolean(1))
  }

  test("resize metadata keeps aspect and caps the max dimension") {
    val out = Multimodal.resizeMeta(media, maxDim = 16).collect()
    assert(out.forall(r => r.getAs[Int]("out_width") <= 16 * 2 &&
      r.getAs[Int]("out_height") <= 16 * 2))
    assert(out.forall(r => r.getAs[Int]("out_width") > 0))
  }
}
