package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ATCF-domain scalar functions, re-expressed as pure Spark column
  * expressions (codegen-friendly, no UDFs).
  *
  * Semantics derived from the reference implementation:
  *  - lat/lon decode: tcdb/etl/atcf.py:74-75,154-155
  *  - compact datetime: tcdb/etl/atcf.py:71,151
  *  - empty-string->null->double: tcdb/etl/atcf.py:76-86,156-166
  *  - storm type classifier: tcdb/utils.py:71-121
  *  - id composition: tcdb/etl/atcf.py:313-323
  *  - forecast cycle floor: tcdb/pipeline/adeck.py:243-246
  */
object Atcf {

  /** `"271N"` -> 27.1, `"271S"` -> -27.1 (tenths of a degree + hemisphere).
    * `+ 0.0` on the negated branch normalizes `"0S"` to 0.0, not -0.0. */
  def atcfLat(c: Column): Column = {
    val t   = trim(c)
    val mag = t.substr(lit(1), length(t) - 1).cast("double") / 10.0
    when(t.isNull, lit(null).cast("double"))
      .when(t.endsWith("N"), mag)
      .otherwise(-mag + lit(0.0))
  }

  /** `"829W"` -> -82.9, `"829E"` -> 82.9 (`"0W"` -> 0.0, not -0.0). */
  def atcfLon(c: Column): Column = {
    val t   = trim(c)
    val mag = t.substr(lit(1), length(t) - 1).cast("double") / 10.0
    when(t.isNull, lit(null).cast("double"))
      .when(t.endsWith("W"), -mag + lit(0.0))
      .otherwise(mag)
  }

  /** `"2022092800"` (yyyyMMddHH) -> naive-UTC timestamp (NTZ; the
    * reference strips time zones deliberately, tcdb/etl/atcf.py:71-72). */
  def parseAtcfDatetime(c: Column): Column =
    to_timestamp(trim(c), "yyyyMMddHH").cast("timestamp_ntz")

  /** trim, empty-string -> null, cast to double (the reference's NaN). */
  def numOrNull(c: Column): Column =
    when(trim(c) === "", lit(null)).otherwise(trim(c)).cast("double")

  /** trim, empty-string -> null (string columns). */
  def strOrNull(c: Column): Column =
    when(trim(c) === "", lit(null)).otherwise(trim(c))

  /** Basin-dependent storm classification from sustained wind (kts). */
  def stormType(windKts: Column, region: Column): Column =
    when(region.isin("AL", "EP"),
      when(windKts < 34, "TD").when(windKts < 63, "TS").otherwise("HU"))
    .when(region === "WP",
      when(windKts < 34, "TD").when(windKts < 63, "TS")
        .when(windKts < 130, "TY").otherwise("STY"))
    .when(region === "SH",
      when(windKts < 63, "TC").otherwise("STC"))
    .when(region === "IO",
      when(windKts < 28, "DE").when(windKts < 34, "DD")
        .when(windKts < 48, "CS").when(windKts < 64, "SCS")
        .when(windKts < 90, "VSCS").when(windKts < 120, "ESCS")
        .otherwise("SuCS"))
    .otherwise("CY")

  /** `nhc_id = upper(f"{region}{num:02d}{season}")`. */
  def nhcId(region: Column, nhcNumber: Column, season: Column): Column =
    upper(concat(region, lpad(nhcNumber.cast("string"), 2, "0"),
      season.cast("string")))

  /** Invest display name `f"{org}-{num:02d}{subregion}"`. */
  def investName(org: Column, nhcNumber: Column, subregion: Column): Column =
    concat(upper(org), lit("-"), lpad(nhcNumber.cast("string"), 2, "0"),
      coalesce(subregion, lit("")))

  /** ASCII title case matching Python `str.title()` (tcdb/etl/atcf.py:310):
    * capitalize the first letter after ANY non-letter boundary, so
    * `"ONE-E"` -> `"One-E"` where `initcap` (whitespace-split only) would
    * give `"One-e"`. Split keeps delimiters via a lookbehind on non-letters.
    */
  def titleCase(c: Column): Column =
    array_join(
      transform(split(lower(c), "(?<=[^a-z])"), t =>
        concat(upper(substring(t, 1, 1)), substring(t, 2, Int.MaxValue))),
      "")

  /** Floor a timestamp to the enclosing 6-hourly forecast cycle
    * (00/06/12/18Z). NTZ in, NTZ out (naive-UTC end to end).
    */
  def cycleFloor(ts: Column): Column =
    timestamp_seconds(floor(unix_timestamp(ts) / 21600L) * 21600L)
      .cast("timestamp_ntz")

  /** `valid = init + hour` forecast-step valid time. */
  def validTime(init: Column, hours: Column): Column =
    init + make_interval(hours = hours.cast("int"))

  private def make_interval(hours: Column): Column =
    call_function("make_interval", lit(0), lit(0), lit(0), lit(0), hours,
      lit(0), lit(0))
}
