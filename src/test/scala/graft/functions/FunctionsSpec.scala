package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c).collect()(0).getAs[T](0)

  test("atcfLat decodes hemisphere and tenths (atcf.py:74)") {
    val vals = Seq("271N", "271S", " 905N", "5S").toDF("s")
      .select(Atcf.atcfLat(col("s"))).as[Double].collect()
    assert(vals.toSeq == Seq(27.1, -27.1, 90.5, -0.5))
  }

  test("atcfLon decodes W negative, E positive (atcf.py:75)") {
    val vals = Seq("829W", "829E", "1800W").toDF("s")
      .select(Atcf.atcfLon(col("s"))).as[Double].collect()
    assert(vals.toSeq == Seq(-82.9, 82.9, -180.0))
  }

  test("parseAtcfDatetime handles yyyyMMddHH (atcf.py:71)") {
    assert(one[java.time.LocalDateTime](
      Atcf.parseAtcfDatetime(lit("2022092806")))
      == java.time.LocalDateTime.parse("2022-09-28T06:00"))
  }

  test("storm type covers all basin regimes (utils.py:71-121)") {
    val cases = Seq(
      ("AL", 33.0, "TD"), ("AL", 34.0, "TS"), ("EP", 62.0, "TS"),
      ("AL", 63.0, "HU"), ("WP", 129.0, "TY"), ("WP", 130.0, "STY"),
      ("SH", 62.0, "TC"), ("SH", 63.0, "STC"),
      ("IO", 27.0, "DE"), ("IO", 28.0, "DD"), ("IO", 47.0, "CS"),
      ("IO", 63.0, "SCS"), ("IO", 89.0, "VSCS"), ("IO", 119.0, "ESCS"),
      ("IO", 120.0, "SuCS"), ("CP", 10.0, "CY"))
    val got = cases.toDF("region", "w", "expect")
      .withColumn("got", Atcf.stormType(col("w"), col("region")))
      .filter(col("got") =!= col("expect")).count()
    assert(got == 0)
  }

  test("validatePressure preserves the reference's quirks (validation.py:6-20)") {
    val got = Seq(Some(900.0), Some(850.0), Some(1050.0), Some(0.0),
        Some(1051.0), Some(849.0), None)
      .toDF("p").select(Validators.validatePressure(col("p"))).as[Double].collect()
    assert(got.toSeq == Seq(900.0, 850.0, 1050.0, 0.0, 1000.0, 1000.0, 1000.0))
  }

  test("validateVelocity / latitude / longitude null out-of-range") {
    val got = Seq((251.0, 91.0, 181.0), (250.0, -90.0, -180.0))
      .toDF("v", "la", "lo")
      .select(Validators.validateVelocity(col("v")),
        Validators.validateLatitude(col("la")),
        Validators.validateLongitude(col("lo")))
      .collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1) && got(0).isNullAt(2))
    assert(got(1).getDouble(0) == 250.0 && got(1).getDouble(1) == -90.0
      && got(1).getDouble(2) == -180.0)
  }

  test("greatCircle matches a known distance (utils.py:49-69)") {
    // Miami (25.76, -80.19) to Havana (23.11, -82.37): ~198.6 nm
    val nm = one[Double](graft.functions.Geo.greatCircle(
      lit(25.76), lit(-80.19), lit(23.11), lit(-82.37), "nm"))
    assert(math.abs(nm - 198.6) < 2.0)
    val km = one[Double](graft.functions.Geo.greatCircle(
      lit(25.76), lit(-80.19), lit(23.11), lit(-82.37), "km"))
    assert(math.abs(km - nm * 1.852) < 1e-9)
    assert(one[Double](graft.functions.Geo.greatCircle(
      lit(0), lit(0), lit(0), lit(1), "degrees")) - 1.0 < 1e-9)
  }

  test("cycleFloor snaps to 00/06/12/18Z (adeck.py:243-246)") {
    val got = Seq("2022-09-28 05:59:59", "2022-09-28 06:00:00",
        "2022-09-28 23:01:02")
      .map(java.sql.Timestamp.valueOf).toDF("ts")
      .select(Atcf.cycleFloor(col("ts"))).as[java.sql.Timestamp].collect()
    assert(got.toSeq == Seq("2022-09-28 00:00:00", "2022-09-28 06:00:00",
      "2022-09-28 18:00:00").map(java.sql.Timestamp.valueOf))
  }

  test("nhcId / investName composition (atcf.py:313-323)") {
    assert(one[String](Atcf.nhcId(lit("al"), lit(9), lit(2022))) == "AL092022")
    assert(one[String](Atcf.investName(lit("nhc"), lit(91), lit("E")))
      == "NHC-91E")
  }

  test("text token + shingle functions") {
    val df = Seq("the quick brown fox jumps").toDF("t")
    assert(df.select(Text.tokenCount(col("t"))).as[Int].head() == 5)
    assert(df.select(size(Text.wordShingles(col("t"), 3))).as[Int].head() == 3)
    assert(df.select(size(Text.hashedShingles(col("t"), 3))).as[Int].head() == 3)
    assert(Seq("ab").toDF("t")
      .select(size(Text.wordShingles(col("t"), 3))).as[Int].head() == 0)
    // <n-token guard mirrors wordShingles (sequence(1,0) counts DOWN)
    assert(Seq("ab").toDF("t")
      .select(size(Text.hashedShingles(col("t"), 3))).as[Int].head() == 0)
    // multi-arg xxhash64 preserves token boundaries: ["ab","c"] != ["a","bc"]
    val h = Seq(("ab c", "a bc")).toDF("x", "y")
      .select(element_at(Text.hashedShingles(col("x"), 2), 1),
        element_at(Text.hashedShingles(col("y"), 2), 1))
      .as[(Long, Long)].head()
    assert(h._1 != h._2)
    // bound-token variants agree with the convenience forms
    val b = df.select(Text.tokens(col("t")).as("w"))
    assert(b.select(size(Text.shinglesFromTokens(col("w"), 3))).as[Int].head() == 3)
    assert(b.select(size(Text.hashedShinglesFromTokens(col("w"), 3))).as[Int].head() == 3)
  }

  test("jaccard exact") {
    val j = Seq((Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("a", "b").select(Text.jaccard(col("a"), col("b")))
      .as[Double].head()
    assert(j == 0.5)
  }

  test("vector cosine/dot in double precision") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 2.0f)),
      (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
    val cos = df.select(Vectors.cosine(col("a"), col("b"))).as[Double].collect()
    assert(cos(0) == 0.0 && math.abs(cos(1) - 1.0) < 1e-12)
    assert(df.select(Vectors.dot(col("a"), col("b"))).as[Double].head() == 0.0)
  }
}
