package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("range layout lets a time-window scan skip most files") {
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val dir = Files.createTempDirectory("layout").toString + "/events"
    Layout.writeRangeLayout(events, dir, numFiles = 16, col("ts"))

    val row = events.agg(min("ts"), max("ts")).collect()(0)
    val lo = row.getAs[java.time.LocalDateTime](0)
    val hi = row.getAs[java.time.LocalDateTime](1)
    val span = java.time.Duration.between(lo, hi).getSeconds
    val cutLo = lo.plusSeconds(span * 45 / 100)
    val cutHi = lo.plusSeconds(span * 55 / 100)

    // the skip-index property: file slices are pairwise DISJOINT, so a
    // 10% window can only intersect a couple of them
    val ranges = Layout.fileRanges(spark.read.parquet(dir), col("ts"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("lo"),
        r.getAs[java.time.LocalDateTime]("hi")))
      .sortBy(_._1)
    // range partitioner may emit fewer files on clustered keys; the
    // contract is disjointness, not an exact file count
    assert(ranges.length >= 8 && ranges.length <= 16)
    ranges.sliding(2).foreach { case Array((_, hiA), (loB, _)) =>
      assert(!hiA.isAfter(loB), s"file slices overlap: $hiA > $loB")
    }
    val touched = ranges.count { case (l, h) =>
      !h.isBefore(cutLo) && !l.isAfter(cutHi) }
    assert(touched <= ranges.length / 4,
      s"10% window should intersect a small minority of slices, hit $touched/${ranges.length}")

    // counter-layout: an UNSORTED 16-file copy has every file spanning
    // ~the whole range — nothing can skip
    val shuffled = Files.createTempDirectory("layout").toString + "/shuffled"
    events.repartition(16).write.mode("overwrite").parquet(shuffled)
    val wideTouched = Layout.fileRanges(spark.read.parquet(shuffled), col("ts"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("lo"),
        r.getAs[java.time.LocalDateTime]("hi")))
      .count { case (l, h) => !h.isBefore(cutLo) && !l.isAfter(cutHi) }
    assert(wideTouched >= 14, s"unsorted files should ~all span the window, got $wideTouched")

    // correctness across the layout rewrite
    val got = spark.read.parquet(dir)
      .filter(col("ts") >= cutLo && col("ts") <= cutHi).count()
    val expected = events.filter(col("ts") >= cutLo && col("ts") <= cutHi).count()
    assert(got == expected && got > 0)
  }
}
