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

  test("resize metadata keeps aspect and caps the max dimension") {
    val out = Multimodal.resizeMeta(media, maxDim = 16).collect()
    assert(out.forall(r => r.getAs[Int]("out_width") <= 16 * 2 &&
      r.getAs[Int]("out_height") <= 16 * 2))
    assert(out.forall(r => r.getAs[Int]("out_width") > 0))
  }
}
