package graft.schema

import org.apache.spark.sql.types._

/** Explicit schemas — no inference anywhere (SURVEY.md §1.2).
  *
  * Raw ATCF column lists follow the reference's positional headers
  * (tcdb/etl/atcf.py:31-49 a-deck 17 cols, :101-139 b-deck 36 cols);
  * store tables follow db/init_db_base.sql with natural keys instead of
  * AUTO_INCREMENT surrogates (SURVEY.md §7.3).
  */
object Schemas {

  /** a-deck positional column names (lower-cased). */
  val aDeckColumns: Seq[String] = Seq(
    "basin", "snum", "datetime", "technum", "tech", "tau", "lat", "lon",
    "vmax", "mslp", "ty", "rad", "windcode", "ne", "se", "sw", "nw")

  /** b-deck = a-deck + 19 extra columns. */
  val bDeckColumns: Seq[String] = aDeckColumns ++ Seq(
    "pouter", "roci", "rmw", "gusts", "eye", "subregion", "maxseas",
    "initials", "dir", "speed", "stormname", "depth", "seas", "seascode",
    "seas1", "seas2", "seas3", "seas4", "userdefined", "userdata")

  /** Columns coerced to double after read (tcdb/etl/atcf.py:76,156). */
  val aDeckNumeric: Seq[String] = Seq("vmax", "mslp", "ne", "se", "sw", "nw")
  val bDeckNumeric: Seq[String] = aDeckNumeric ++ Seq("pouter", "roci", "rmw")

  /** tcvitals whitespace-delimited columns
    * (scripts/download_parse_tcvitals.py:4-33). */
  val tcvitalsColumns: Seq[String] = Seq(
    "org", "system_id", "storm_name", "date", "time", "latitude",
    "longitude", "storm_direction_degrees", "storm_speed_dms", "mslp_mb",
    "env_press_mb", "roci_km", "vmax_ms", "rmw_km", "r34_ne_km",
    "r34_se_km", "r34_sw_km", "r34_nw_km", "storm_depth", "r50_ne_km",
    "r50_se_km", "r50_sw_km", "r50_nw_km", "max_forecast_hour",
    "max_forecast_lat", "max_forecast_lon", "r64_ne_km", "r64_se_km",
    "r64_sw_km", "r64_nw_km", "storm_type", "storm_priority")

  /** tcvitals NA sentinels (download_parse_tcvitals.py:35). */
  val tcvitalsNa: Seq[String] = Seq("-9", "-99", "-999", "-999W", "-999N", "-99N")

  val storms: StructType = StructType(Seq(
    StructField("annual_id", IntegerType),
    StructField("region", StringType, nullable = false),
    StructField("nhc_number", IntegerType, nullable = false),
    StructField("nhc_id", StringType, nullable = false),
    StructField("season", IntegerType, nullable = false),
    StructField("start_date", TimestampType, nullable = false),
    StructField("end_date", TimestampType),
    StructField("status", StringType),
    StructField("name", StringType),
    StructField("start_lat", DoubleType),
    StructField("start_lon", DoubleType),
    StructField("run_id", StringType),
    StructField("last_update", TimestampType)))

  val observations: StructType = StructType(Seq(
    StructField("nhc_id", StringType, nullable = false),
    StructField("start_date", TimestampType, nullable = false),
    StructField("datetime_utc", TimestampType, nullable = false),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("intensity_kts", DoubleType),
    StructField("mslp_mb", DoubleType),
    StructField("r34_ne", IntegerType), StructField("r34_se", IntegerType),
    StructField("r34_sw", IntegerType), StructField("r34_nw", IntegerType),
    StructField("r50_ne", IntegerType), StructField("r50_se", IntegerType),
    StructField("r50_sw", IntegerType), StructField("r50_nw", IntegerType),
    StructField("r64_ne", IntegerType), StructField("r64_se", IntegerType),
    StructField("r64_sw", IntegerType), StructField("r64_nw", IntegerType),
    StructField("pouter_mb", DoubleType),
    StructField("router_nmi", DoubleType),
    StructField("rmw_nmi", DoubleType),
    StructField("run_id", StringType)))

  val forecasts: StructType = StructType(Seq(
    StructField("region", StringType, nullable = false),
    StructField("data_source", StringType, nullable = false),
    StructField("model", StringType, nullable = false),
    StructField("datetime_utc", TimestampType, nullable = false),
    StructField("run_id", StringType)))

  val tracks: StructType = StructType(Seq(
    StructField("region", StringType, nullable = false),
    StructField("model", StringType, nullable = false),
    StructField("datetime_utc", TimestampType, nullable = false),
    StructField("nhc_id", StringType, nullable = false),
    StructField("ensemble_number", IntegerType, nullable = false),
    StructField("run_id", StringType)))

  val steps: StructType = StructType(Seq(
    StructField("region", StringType, nullable = false),
    StructField("model", StringType, nullable = false),
    StructField("datetime_utc", TimestampType, nullable = false),
    StructField("nhc_id", StringType, nullable = false),
    StructField("ensemble_number", IntegerType, nullable = false),
    StructField("hour", IntegerType, nullable = false),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("intensity_kts", DoubleType),
    StructField("mslp_mb", DoubleType),
    StructField("run_id", StringType)))
}

/** Typed row for ensemble-track long format (FIXTURES.md §6). */
case class TrackPoint(model: String, init: java.sql.Timestamp,
    annual_id: Int, ens: Int, ens_name: String, hour: Int,
    lat: Option[Double], lon: Option[Double],
    wind: Option[Double], mslp: Option[Double])
