package graft.resolve

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.schema.Schemas

/** FIXTURES.md §5 entity-resolution scenarios. */
class StormResolverSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val now = Timestamp.valueOf("2022-09-28 18:00:00")
  private def ts(s: String) = Timestamp.valueOf(s)

  private def summary(region: String, num: Int, nhcId: String,
      start: String, end: String, name: String,
      lat: Double = 26.8, lon: Double = -82.3, season: Int = 2022): DataFrame =
    Seq((region, num, nhcId, season, ts(start), ts(end), name, lat, lon))
      .toDF("region", "nhc_number", "nhc_id", "season", "start_date",
        "end_date", "name", "start_lat", "start_lon")

  private def storm(region: String, num: Int, nhcId: String, start: String,
      end: String, name: String, annual: Integer = 1, lat: Double = 26.8,
      lon: Double = -82.3, status: String = "Active",
      runId: String = "old"): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(
        annual, region, num, nhcId, 2022: Integer, ts(start), ts(end),
        status, name, lat, lon, runId, null))),
      Schemas.storms)

  private val empty = spark.createDataFrame(
    spark.sparkContext.emptyRDD[Row], Schemas.storms)

  test("new named storm inserts with annual_id 1 and Active status") {
    val out = StormResolver.resolve(empty,
      summary("AL", 9, "AL092022", "2022-09-28 00:00:00",
        "2022-09-28 12:00:00", "HU-Ian"), now, "r1").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Int]("annual_id") == 1)
    assert(r.getAs[String]("status") == "Active") // 6h old <= 16h
    assert(r.getAs[String]("run_id") == "r1")
  }

  test("named storm update wins; end_date regression rejected (T6)") {
    val existing = storm("AL", 9, "AL092022", "2022-09-28 00:00:00",
      "2022-09-28 12:00:00", "HU-Ian", 3)
    // newer end -> update applied
    val updated = StormResolver.resolve(existing,
      summary("AL", 9, "AL092022", "2022-09-28 00:00:00",
        "2022-09-28 18:00:00", "HU-Ian"), now, "r2").collect()(0)
    assert(updated.getAs[Timestamp]("end_date") == ts("2022-09-28 18:00:00"))
    assert(updated.getAs[Int]("annual_id") == 3) // preserved
    assert(updated.getAs[String]("run_id") == "r2")
    // older end -> rejected, run_id untouched
    val kept = StormResolver.resolve(existing,
      summary("AL", 9, "AL092022", "2022-09-28 00:00:00",
        "2022-09-28 06:00:00", "HU-Ian"), now, "r3").collect()(0)
    assert(kept.getAs[Timestamp]("end_date") == ts("2022-09-28 12:00:00"))
    assert(kept.getAs[String]("run_id") == "old")
  }

  test("unchanged update keeps old run_id") {
    val existing = storm("AL", 9, "AL092022", "2022-09-28 00:00:00",
      "2022-09-28 12:00:00", "HU-Ian")
    val out = StormResolver.resolve(existing,
      summary("AL", 9, "AL092022", "2022-09-28 00:00:00",
        "2022-09-28 12:00:00", "HU-Ian"), now, "r9").collect()(0)
    assert(out.getAs[String]("run_id") == "old")
  }

  test("named storm claims prior invest (transition, process_storms.py:145-164)") {
    val invest = storm("AL", 91, "AL912022", "2022-09-28 00:00:00",
      "2022-09-28 06:00:00", "NHC-91A", 5)
    val out = StormResolver.resolve(invest,
      summary("AL", 9, "AL092022", "2022-09-28 00:00:00",
        "2022-09-28 12:00:00", "HU-Ian", lat = 27.0, lon = -82.0),
      now, "r2").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("nhc_id") == "AL092022") // identity replaced
    assert(r.getAs[String]("name") == "HU-Ian")
    assert(r.getAs[Int]("annual_id") == 5) // invest's annual id kept
  }

  test("multi-candidate invest claim requires 100nm; nearest wins") {
    val far = storm("AL", 91, "AL912022", "2022-09-28 00:00:00",
      "2022-09-28 06:00:00", "NHC-91A", 5, lat = 40.0, lon = -60.0)
    val near = storm("AL", 92, "AL922022", "2022-09-28 00:00:00",
      "2022-09-28 06:00:00", "NHC-92A", 6, lat = 26.9, lon = -82.4)
    val out = StormResolver.resolve(far.union(near),
      summary("AL", 9, "AL092022", "2022-09-28 00:00:00",
        "2022-09-28 12:00:00", "HU-Ian"), now, "r2")
      .orderBy("nhc_id").collect()
    // near invest replaced; far invest untouched
    assert(out.map(_.getAs[String]("nhc_id")).toSeq == Seq("AL092022", "AL912022"))
    assert(out(0).getAs[Int]("annual_id") == 6)
  }

  test("stale invest (>24h) is ignored (process_storms.py:79-81)") {
    val out = StormResolver.resolve(empty,
      summary("AL", 91, "AL912022", "2022-09-26 00:00:00",
        "2022-09-27 12:00:00", "NHC-91A"), now, "r1").collect()
    assert(out.isEmpty)
  }

  test("invest skipped when a named storm matches (already transitioned)") {
    val named = storm("AL", 9, "AL092022", "2022-09-28 00:00:00",
      "2022-09-28 12:00:00", "HU-Ian")
    val out = StormResolver.resolve(named,
      summary("AL", 91, "AL912022", "2022-09-28 00:00:00",
        "2022-09-28 12:00:00", "NHC-91A"), now, "r2").collect()
    assert(out.length == 1 && out(0).getAs[String]("nhc_id") == "AL092022")
  }

  test("same-batch transition: named processed before invest") {
    val both = summary("AL", 9, "AL092022", "2022-09-28 00:00:00",
      "2022-09-28 12:00:00", "HU-Ian")
      .union(summary("AL", 91, "AL912022", "2022-09-28 00:00:00",
        "2022-09-28 12:00:00", "NHC-91A"))
    val out = StormResolver.resolve(empty, both, now, "r1").collect()
    assert(out.length == 1 && out(0).getAs[String]("nhc_id") == "AL092022")
  }

  test("invest re-observed updates within 24h start drift (process_storms.py:104-117)") {
    val existing = storm("AL", 91, "AL912022", "2022-09-28 00:00:00",
      "2022-09-28 06:00:00", "NHC-91A", 4)
    val out = StormResolver.resolve(existing,
      summary("AL", 91, "AL912022", "2022-09-28 06:00:00",
        "2022-09-28 12:00:00", "NHC-91A"), now, "r2").collect()
    assert(out.length == 1)
    assert(out(0).getAs[Timestamp]("start_date") == ts("2022-09-28 06:00:00"))
    assert(out(0).getAs[Int]("annual_id") == 4)
  }

  test("invest with >24h start drift becomes a new storm") {
    val existing = storm("AL", 91, "AL912022", "2022-09-20 00:00:00",
      "2022-09-28 12:00:00", "NHC-91A", 4)
    val out = StormResolver.resolve(existing,
      summary("AL", 91, "AL912022", "2022-09-28 06:00:00",
        "2022-09-28 12:00:00", "NHC-91A"), now, "r2").collect()
    // the reference would insert a second row with the same nhc_id; our
    // store is keyed by nhc_id so the incoming row replaces it — assert
    // the incoming start_date won
    assert(out.length == 1)
    assert(out(0).getAs[Timestamp]("start_date") == ts("2022-09-28 06:00:00"))
  }

  test("annual ids: max+1 per (season, region), named before invests (A11)") {
    val existing = storm("AL", 5, "AL052022", "2022-09-01 00:00:00",
      "2022-09-05 12:00:00", "TS-Old", 7)
    val batch = summary("AL", 9, "AL092022", "2022-09-28 00:00:00",
      "2022-09-28 12:00:00", "HU-Ian", lat = 10.0, lon = -40.0)
      .union(summary("AL", 91, "AL912022", "2022-09-28 06:00:00",
        "2022-09-28 12:00:00", "NHC-91A", lat = 20.0, lon = -60.0))
    val out = StormResolver.resolve(existing, batch, now, "r1")
      .orderBy("nhc_number").collect()
    assert(out.map(r => (r.getAs[Int]("nhc_number"), r.getAs[Int]("annual_id"))).toSeq
      == Seq((5, 7), (9, 8), (91, 9)))
  }
}
