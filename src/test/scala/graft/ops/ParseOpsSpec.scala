package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ParseOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("b-deck generator: full/short/ragged variants partition the input") {
    val lines = ParseOps.bdeckLines(spark, dir).cache()
    val n = lines.count()
    val fields = lines.select(size(split(col("value"), ",")).as("nf"))
      .groupBy("nf").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fields.keySet == Set(5, 18, 37), s"got $fields")
    assert(fields.values.sum == n)
    lines.unpersist()
  }

  test("parse drops ragged rows and null-pads short rows") {
    val parsed = ParseOps.parseBdeck(spark, dir).cache()
    val raw = ParseOps.bdeckLines(spark, dir)
    val kept = raw.filter(size(split(col("value"), ",")) >= 18).count()
    assert(parsed.count() == kept)
    // short rows: roci (col 19) null, pouter (col 18) present
    val short = parsed.filter(col("roci").isNull && col("userdata").isNull)
    assert(short.count() > 0)
    parsed.unpersist()
  }

  test("storm summaries: invests named ORG-nn, storms TYPE-Name") {
    val s = ParseOps.stormSummaries(spark, dir).cache()
    assert(s.count() > 0)
    val invest = s.filter(col("nhc_number") >= 70)
    assert(invest.count() > 0)
    assert(invest.filter(!col("name").rlike("^(NHC|JTWC)-")).count() == 0)
    val named = s.filter(col("nhc_number") < 70 && col("name").isNotNull)
    assert(named.filter(!col("name").contains("-")).count() == 0)
    s.unpersist()
  }

  test("observations pivot: one row per (file, datetime), 12 radial cols") {
    val o = ParseOps.observationsPivot(spark, dir).cache()
    val dupes = o.groupBy("file", "datetime_utc").count().filter(col("count") > 1)
    assert(dupes.count() == 0)
    assert(o.columns.count(_.startsWith("r")) >= 12)
    // validators: mslp defaults to 1000 outside [850, 1050]
    assert(o.filter(col("mslp_mb") < 850 || col("mslp_mb") > 1050).count() == 0)
    o.unpersist()
  }

  test("forecast steps: negative lead hours are validator-nulled") {
    val f = ParseOps.forecastSteps(spark, dir).cache()
    assert(f.count() > 0)
    assert(f.filter(col("hour") < 0).count() == 0)
    assert(f.filter(col("hour").isNull).count() > 0)
    f.unpersist()
  }

  test("tcvitals: sentinels decode to null") {
    val t = ParseOps.parseTcvitals(spark, dir).cache()
    assert(t.count() > 0)
    assert(t.filter(col("mslp_mb") === "-999").count() == 0)
    assert(t.filter(col("mslp_mb").isNull).count() > 0)
    assert(t.filter(col("org") =!= "NHC").count() == 0)
    t.unpersist()
  }
}
