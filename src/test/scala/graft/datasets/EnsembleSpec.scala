package graft.datasets

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EnsembleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val init = Timestamp.valueOf("2022-09-28 00:00:00")

  private def pt(ens: Int, hour: Int, lat: Double, lon: Double,
      wind: Double, mslp: Double, annual: Int = 7, trackNo: Int = 0) =
    ("ECMWF", init, annual, ens, s"ENS$ens", hour, trackNo, lat, lon, wind, mslp)

  private def tracks(rows: Seq[(String, Timestamp, Int, Int, String, Int, Int,
      Double, Double, Double, Double)]) =
    rows.toDF("model", "init", "annual_id", "ens", "ens_name", "hour",
      "track_no", "lat", "lon", "wind", "mslp")

  test("denseGrid fills the full ens x step spine with nulls (W5)") {
    val t = tracks(Seq(pt(1, 0, 25.0, -80.0, 50, 990), pt(1, 12, 26.0, -81.0, 60, 980)))
    val grid = Ensemble.denseGrid(t.drop("track_no"), numEns = 2, maxStep = 12)
    assert(grid.count() == 2 * 3) // 2 members x hours {0,6,12}
    val missing = grid.filter(col("lat").isNull).count()
    assert(missing == 4) // member 1 hour 6; member 2 all 3
    val v = grid.filter(col("ens") === 1 && col("hour") === 12).collect()(0)
    assert(v.getAs[Timestamp]("valid") == Timestamp.valueOf("2022-09-28 12:00:00"))
  }

  test("withEnsMean averages members 1..n-2, rounds to 3, appends n+1 (A9/W4)") {
    // numEns=4 -> mean over members 1..2 only (3 and 4 excluded)
    val t = tracks(Seq(
      pt(1, 0, 25.0, -80.0, 50, 990), pt(2, 0, 26.0, -81.0, 60, 980),
      pt(3, 0, 99.0, -99.0, 99, 900), pt(4, 0, 99.0, -99.0, 99, 900)))
      .drop("track_no")
    val out = Ensemble.withEnsMean(t, numEns = 4)
    val mean = out.filter(col("ens") === 5).collect()(0)
    assert(mean.getAs[String]("ens_name") == "ENS_MEAN")
    assert(mean.getAs[Double]("lat") == 25.5)
    assert(mean.getAs[Double]("wind") == 55.0)
    assert(out.count() == 5)
  }

  test("mostCommon uses count then first occurrence (syntracks.py:194-200)") {
    val t = tracks(Seq(pt(1, 0, 1, 1, 1, 1), pt(2, 0, 1, 1, 1, 1),
      pt(3, 0, 1, 1, 1, 1))).drop("track_no")
      .withColumn("storm_name",
        when(col("ens") === 1, "ALPHA").otherwise("BETA"))
    val got = Ensemble.mostCommon(t, "storm_name").collect()(0)
    assert(got.getAs[String]("storm_name") == "BETA") // 2 beats 1
    val tie = tracks(Seq(pt(1, 0, 1, 1, 1, 1), pt(2, 0, 1, 1, 1, 1)))
      .drop("track_no")
      .withColumn("storm_name",
        when(col("ens") === 1, "ZETA").otherwise("ALPHA"))
    // tie -> first occurrence (min ens) wins, not lexicographic
    assert(Ensemble.mostCommon(tie, "storm_name").collect()(0)
      .getAs[String]("storm_name") == "ZETA")
  }

  test("claimTracks: time gate, distance gate, longest wins (J7)") {
    val invests = Seq((7, "NHC-91A",
      Timestamp.valueOf("2022-09-28 00:00:00"), 25.0, -80.0))
      .toDF("inv_annual_id", "inv_name", "inv_valid", "inv_lat", "inv_lon")
    val t = tracks(Seq(
      // track A: close, 2 steps
      pt(1, 0, 25.5, -80.5, 50, 990, annual = 0, trackNo = 1),
      pt(1, 6, 26.0, -81.0, 55, 985, annual = 0, trackNo = 1),
      // track B (same ens): close, 3 steps -> should win
      pt(1, 0, 25.2, -80.2, 50, 990, annual = 0, trackNo = 2),
      pt(1, 6, 25.8, -80.8, 55, 985, annual = 0, trackNo = 2),
      pt(1, 12, 26.4, -81.4, 60, 980, annual = 0, trackNo = 2),
      // track C: too far (>310nm)
      pt(2, 0, 45.0, -40.0, 50, 990, annual = 0, trackNo = 1),
      // track D: already assigned
      pt(3, 0, 25.1, -80.1, 50, 990, annual = 9, trackNo = 1)))
      .withColumn("storm_name", lit(null).cast("string"))
    val out = Ensemble.claimTracks(t, invests)
    val claimed = out.filter(col("annual_id") === 7)
      .select("ens", "track_no").distinct().collect()
    assert(claimed.map(r => (r.getInt(0), r.getInt(1))).toSet == Set((1, 2)))
    assert(out.filter(col("annual_id") === 7 &&
      col("storm_name") === "NHC-91A").count() == 3)
    // far track and assigned track untouched
    assert(out.filter(col("ens") === 2 && col("annual_id") === 0).count() == 1)
    assert(out.filter(col("ens") === 3 && col("annual_id") === 9).count() == 1)
  }

  test("claimTracks respects the 1.5-day time threshold") {
    val invests = Seq((7, "NHC-91A",
      Timestamp.valueOf("2022-09-28 00:00:00"), 25.0, -80.0))
      .toDF("inv_annual_id", "inv_name", "inv_valid", "inv_lat", "inv_lon")
    val lateInit = Timestamp.valueOf("2022-09-30 00:00:00") // +2 days
    val t = Seq(("ECMWF", lateInit, 0, 1, "ENS1", 0, 1, 25.1, -80.1, 50.0, 990.0))
      .toDF("model", "init", "annual_id", "ens", "ens_name", "hour",
        "track_no", "lat", "lon", "wind", "mslp")
    assert(Ensemble.claimTracks(t, invests)
      .filter(col("annual_id") === 7).count() == 0)
  }

  test("toWide produces hour-ordered arrays") {
    val t = tracks(Seq(pt(1, 12, 26.0, -81.0, 60, 980),
      pt(1, 0, 25.0, -80.0, 50, 990))).drop("track_no")
    val w = Ensemble.toWide(t).collect()(0)
    assert(w.getSeq[Int](w.fieldIndex("hours")).toSeq == Seq(0, 12))
    assert(w.getSeq[Double](w.fieldIndex("winds")).toSeq == Seq(50.0, 60.0))
  }

  test("fromWide round-trips toWide and drops null-padded grid steps") {
    val t = tracks(Seq(
      pt(1, 0, 25.0, -80.0, 50, 990), pt(1, 12, 26.0, -81.0, 60, 980),
      pt(2, 6, 24.5, -79.0, 45, 995))).drop("track_no")
    val long = Ensemble.fromWide(Ensemble.toWide(t))
      .select(t.columns.map(col).toIndexedSeq: _*)
    assert(long.exceptAll(t).count() == 0 && t.exceptAll(long).count() == 0)

    // the dense-grid export (null-padded steps) normalizes to the same
    // observed points: intake contract == denseGrid's left-join inverse
    val grid = Ensemble.denseGrid(t, numEns = 2, maxStep = 12)
      .withColumn("ens_name", concat(lit("ENS"), col("ens")))
      .withColumn("annual_id", coalesce(col("annual_id"), lit(7)))
      .withColumn("hour", when(col("lat").isNotNull, col("hour"))) // pad
    val viaGrid = Ensemble.fromWide(Ensemble.toWide(grid.drop("valid")))
      .select(t.columns.map(col).toIndexedSeq: _*)
    assert(viaGrid.exceptAll(t).count() == 0 && t.exceptAll(viaGrid).count() == 0)
  }

  test("withEnsMedian appends a median member") {
    val t = tracks(Seq(
      pt(1, 0, 10.0, -80.0, 40, 990), pt(2, 0, 20.0, -81.0, 50, 980),
      pt(3, 0, 99.0, -99.0, 99, 900), pt(4, 0, 99.0, -99.0, 99, 900),
      pt(5, 0, 99.0, -99.0, 99, 900))).drop("track_no")
    // numEns=5 -> median over members 1..3
    val med = Ensemble.withEnsMedian(t, numEns = 5)
      .filter(col("ens") === 6).collect()(0)
    assert(med.getAs[String]("ens_name") == "ENS_MEDIAN")
    assert(med.getAs[Double]("lat") == 20.0)
  }

  test("interpolate fills interior gaps, leaves edges null, and never " +
      "divides by a zero-width interval") {
    val df = Seq(
      (1L, 0L, Option.empty[Double]), // leading edge: no left neighbor
      (1L, 6L, Some(10.0)),
      (1L, 12L, None), // interior: lerp midpoint
      (1L, 18L, Some(16.0)),
      (1L, 24L, None), // trailing edge: no right neighbor
      // duplicate ordinate around a gap: guard must yield null, not NaN
      (2L, 6L, Some(1.0)),
      (2L, 6L, None),
      (2L, 6L, Some(3.0))).toDF("k", "hour", "v")
    val got = Ensemble.interpolate(df, Seq("k"), "hour", Seq("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2))))
    val k1 = got.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    assert(k1 == Seq(None, Some(10.0), Some(13.0), Some(16.0), None))
    val k2 = got.filter(_._1 == 2L).map(_._3)
    assert(!k2.exists(_.exists(v =>
      v.asInstanceOf[Double].isNaN || v.asInstanceOf[Double].isInfinite)))
  }

  test("interpolate (descending running frame) is bit-identical to the " +
      "O(n^2) unboundedFollowing baseline, incl. multi-column fill") {
    // denser fixture: runs of nulls, all-null series, two value columns
    val rows = for (k <- 1L to 3L; h <- 0L to 40L) yield (k, h * 3,
      if ((h + k) % 4 == 0) Some(k * 100.0 + h) else Option.empty[Double],
      if (k == 3L) Option.empty[Double]
      else if (h % 5 == 0) Some(h * 1.5) else Option.empty[Double])
    val df = rows.toDF("k", "hour", "v", "w")
    def canon(d: org.apache.spark.sql.DataFrame) = d
      .orderBy("k", "hour").collect().map(_.toSeq).toSeq
    assert(canon(Ensemble.interpolate(df, Seq("k"), "hour", Seq("v", "w")))
      == canon(Ensemble.interpolateFollowingFrame(
           df, Seq("k"), "hour", Seq("v", "w"))))
  }
}
