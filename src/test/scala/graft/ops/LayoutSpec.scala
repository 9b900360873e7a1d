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

  test("z-order: a 2-D box touches fewer files than a single-key range layout") {
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01")))
          .cast("long").as("day"))

    // the 2-D predicate box: a WIDE user band and a NARROW day band
    // (sf0.001 has users 0-14 over 30 days) — the case single-key
    // layout cannot prune: every user-file spans all days, so the day
    // band removes nothing and the wide user band touches most files
    val (uLo, uHi, dLo, dHi) = (2L, 10L, 12L, 15L)
    def touches(dir: String): Int =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
          min("day").as("dlo"), max("day").as("dhi"))
        .collect()
        .count(r => r.getAs[Long]("uhi") >= uLo && r.getAs[Long]("ulo") < uHi &&
          r.getAs[Long]("dhi") >= dLo && r.getAs[Long]("dlo") < dHi)

    val zDir = Files.createTempDirectory("layout").toString + "/z"
    Layout.writeZOrder(events, zDir, 16, col("user_id"), col("day"), bits = 8)
    val uDir = Files.createTempDirectory("layout").toString + "/u"
    Layout.writeRangeLayout(events, uDir, 16, col("user_id"))

    val (zTouched, uTouched) = (touches(zDir), touches(uDir))
    val zFiles = spark.read.parquet(zDir)
      .select(input_file_name()).distinct().count()
    // single-key layout prunes on user_id only: the user band covers
    // ~13% of users, so it still reads every file of that band across
    // ALL days; the z layout confines the box in BOTH dimensions
    assert(zTouched < uTouched,
      s"z-order touched $zTouched files, user-range layout $uTouched")
    assert(zTouched < zFiles, s"z-order pruned nothing ($zTouched/$zFiles)")

    // and the layout is invisible to results
    val pred = (d: org.apache.spark.sql.DataFrame) => d
      .filter(col("user_id") >= uLo && col("user_id") < uHi &&
        col("day") >= dLo && col("day") < dHi)
      .agg(count(lit(1)), sum("event_id")).collect().toSeq
    assert(pred(spark.read.parquet(zDir)) == pred(events))
  }
}
