package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables.load
import graft.functions.{Atcf, Geo, Validators}

/** SURVEY.md §2.7 scalar functions (F1–F20), exercised end-to-end through
  * the oracle gate: inputs are derived deterministically from the test
  * tables, the Spark side applies the real `graft.functions` column
  * expressions, and the oracle recomputes the expected values
  * independently in SQL — a true differential test of the function
  * semantics, not a string round-trip.
  */
object FunctionOps {

  /** F1/F2 — ATCF lat/lon decode ("271N" -> 27.1, "829W" -> -82.9). */
  def fnAtcfLatLon(spark: SparkSession, dir: String): DataFrame = {
    val p = load(spark, dir, "part")
    val latStr = concat((col("p_partkey") % 900).cast("string"),
      when(col("p_partkey") % 2 === 0, "N").otherwise("S"))
    val lonStr = concat((col("p_partkey") % 1800).cast("string"),
      when(col("p_partkey") % 3 === 0, "W").otherwise("E"))
    p.select(col("p_partkey"),
        Atcf.atcfLat(latStr).as("lat"),
        Atcf.atcfLon(lonStr).as("lon"))
      .orderBy("p_partkey")
  }

  /** F3/F19 — compact yyyyMMddHH format + parse round-trip. */
  def fnCompactDatetime(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .withColumn("dt_str", date_format(col("o_orderdate"), "yyyyMMddHH"))
      .select(col("o_orderkey"), col("dt_str"),
        Atcf.parseAtcfDatetime(col("dt_str")).as("dt"))
      .orderBy("o_orderkey")

  /** F8 — basin-dependent storm-type classifier (tcdb/utils.py:71-121). */
  def fnStormType(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    val region = element_at(
      array(lit("AL"), lit("EP"), lit("WP"), lit("SH"), lit("IO"), lit("XX")),
      (col("l_orderkey") % 6).cast("int") + 1)
    li.select(region.as("region"), (col("l_quantity") * 5).as("w"))
      .withColumn("storm_type", Atcf.stormType(col("w"), col("region")))
      .groupBy("region", "storm_type").agg(count(lit(1)).as("n"))
      .orderBy("region", "storm_type")
  }

  /** F9 — great-circle distance (haversine, nm) on synthetic coordinates. */
  def fnGreatCircle(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer")
    val lat1 = (col("c_custkey") % 120) / 2.0 - 30.0
    val lon1 = (col("c_custkey") % 300) / 2.0 - 75.0
    val lat2 = lat1 + ((col("c_custkey") % 7) - 3)
    val lon2 = lon1 + ((col("c_custkey") % 11) - 5)
    c.select(col("c_custkey"),
        round(Geo.greatCircle(lat1, lon1, lat2, lon2, "nm"), 3).as("dist_nm"),
        round(Geo.greatCircle(lat1, lon1, lat2, lon2, "km"), 3).as("dist_km"))
      .orderBy("c_custkey")
  }

  /** F16 — forecast-cycle floor to 00/06/12/18Z. */
  def fnCycleFloor(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .groupBy(Atcf.cycleFloor(col("ts")).as("cycle"))
      .agg(count(lit(1)).as("n"))
      .orderBy("cycle")

  /** F6 — id composition: nhc_id + invest name formatting. */
  def fnComposeId(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer")
    val region = element_at(array(lit("al"), lit("ep"), lit("wp")),
      (col("c_custkey") % 3).cast("int") + 1)
    val num = (col("c_custkey") % 99).cast("int")
    val season = (lit(2020) + (col("c_custkey") % 5)).cast("int")
    val org = when(col("c_custkey") % 2 === 0, "nhc").otherwise("jtwc")
    val sub = element_at(array(lit("E"), lit("W"), lit("C")),
      (col("c_custkey") % 3).cast("int") + 1)
    c.select(col("c_custkey"),
        Atcf.nhcId(region, num, season).as("nhc_id"),
        Atcf.investName(org, num, sub).as("invest_name"))
      .orderBy("c_custkey")
  }

  /** F10–F13 — validators with the reference's exact quirky defaults. */
  def fnValidators(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
      .withColumn("p", col("value") * 12.0)
      .withColumn("v", col("value") * 3.0)
      .withColumn("d", col("value") - 50.0)
    ev.groupBy("event_type")
      .agg(
        sum(Validators.validatePressure(col("p")).cast(DecimalType(18, 2)))
          .cast("double").as("sum_pressure"),
        sum(Validators.validateVelocity(col("v")).cast(DecimalType(18, 2)))
          .cast("double").as("sum_velocity"),
        count(Validators.validateDistance(col("d"))).as("n_valid_dist"),
        count(Validators.validateDirection(col("value") * 4).cast("double")).as("n_valid_dir"))
      .orderBy("event_type")
  }

  /** F5 — title case (initcap) on single-word-ish names. */
  def fnInitcap(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "nation")
      .select(col("n_nationkey"), initcap(lower(col("n_name"))).as("title_name"))
      .orderBy("n_nationkey")

  /** F15 — date arithmetic: valid = init + hour-offset interval. */
  def fnDateArith(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .withColumn("valid",
        Atcf.validTime(col("o_orderdate"), col("o_orderkey") % 73))
      .groupBy("o_orderpriority")
      .agg(min("valid").as("min_valid"), max("valid").as("max_valid"))
      .orderBy("o_orderpriority")

  /** F18-adjacent — extract a numeric field from a JSON-ish payload via
    * regexp (identical regex engines both sides for this pattern). */
  def fnExtractNumeric(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("k", regexp_extract(col("props"), "([0-9]+)", 1).cast("long"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type")

  private val stormTypeCase =
    """CASE WHEN region IN ('AL','EP') THEN
      |  (CASE WHEN w < 34 THEN 'TD' WHEN w < 63 THEN 'TS' ELSE 'HU' END)
      |WHEN region = 'WP' THEN
      |  (CASE WHEN w < 34 THEN 'TD' WHEN w < 63 THEN 'TS'
      |        WHEN w < 130 THEN 'TY' ELSE 'STY' END)
      |WHEN region = 'SH' THEN (CASE WHEN w < 63 THEN 'TC' ELSE 'STC' END)
      |WHEN region = 'IO' THEN
      |  (CASE WHEN w < 28 THEN 'DE' WHEN w < 34 THEN 'DD' WHEN w < 48 THEN 'CS'
      |        WHEN w < 64 THEN 'SCS' WHEN w < 90 THEN 'VSCS'
      |        WHEN w < 120 THEN 'ESCS' ELSE 'SuCS' END)
      |ELSE 'CY' END""".stripMargin

  /** Native codegen Jaro-Winkler vs DuckDB's independent C++
    * implementation — two from-scratch implementations of the classic
    * definition (byte-level, window floor(max/2)-1, 0.7 boost
    * threshold, prefix scale 0.1 capped at 4) differentially pinned
    * over every part name against two probe strings. Filter and rank
    * both run on the ROUNDED score so a last-ulp divergence cannot flip
    * a boundary. */
  def fnJaroWinkler(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.expressions.JaroWinkler.jaroWinklerNative
    load(spark, dir, "part")
      .select(col("p_partkey"), col("p_name"),
        round(jaroWinklerNative(col("p_name"), lit("red widget")), 6)
          .as("jw_widget"),
        round(jaroWinklerNative(col("p_name"), lit("small gizmo")), 6)
          .as("jw_gizmo"))
      .filter(col("jw_widget") >= 0.6 || col("jw_gizmo") >= 0.6)
      .orderBy(col("jw_widget").desc, col("p_partkey"))
      .limit(25)
  }

  private val fnJaroWinklerOracle: String =
    """SELECT p_partkey, p_name,
      |  round(jaro_winkler_similarity(p_name, 'red widget'), 6)
      |    AS jw_widget,
      |  round(jaro_winkler_similarity(p_name, 'small gizmo'), 6)
      |    AS jw_gizmo
      |FROM part
      |WHERE round(jaro_winkler_similarity(p_name, 'red widget'), 6) >= 0.6
      |   OR round(jaro_winkler_similarity(p_name, 'small gizmo'), 6) >= 0.6
      |ORDER BY jw_widget DESC, p_partkey LIMIT 25""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q_fn_jaro_winkler", fnJaroWinkler,
      Some(fnJaroWinklerOracle), "fn/jaro-winkler-native"),
    QuerySpec("q_fn_atcf_latlon", fnAtcfLatLon, Some(
      """SELECT p_partkey,
        |CASE WHEN p_partkey % 2 = 0 THEN (p_partkey % 900) / 10.0
        |     ELSE -(p_partkey % 900) / 10.0 END AS lat,
        |CASE WHEN p_partkey % 3 = 0 THEN -(p_partkey % 1800) / 10.0
        |     ELSE (p_partkey % 1800) / 10.0 END AS lon
        |FROM part ORDER BY p_partkey""".stripMargin), "F1/F2"),
    QuerySpec("q_fn_compact_datetime", fnCompactDatetime, Some(
      """SELECT o_orderkey, strftime(o_orderdate, '%Y%m%d%H') AS dt_str,
        |strptime(strftime(o_orderdate, '%Y%m%d%H'), '%Y%m%d%H') AS dt
        |FROM orders ORDER BY o_orderkey""".stripMargin), "F3/F19"),
    QuerySpec("q_fn_storm_type", fnStormType, Some(
      s"""WITH t AS (SELECT
         |  CASE CAST(l_orderkey % 6 AS INT) WHEN 0 THEN 'AL' WHEN 1 THEN 'EP'
         |    WHEN 2 THEN 'WP' WHEN 3 THEN 'SH' WHEN 4 THEN 'IO' ELSE 'XX' END AS region,
         |  l_quantity * 5 AS w FROM lineitem)
         |SELECT region, $stormTypeCase AS storm_type, count(*) AS n
         |FROM t GROUP BY region, storm_type ORDER BY region, storm_type""".stripMargin), "F8"),
    QuerySpec("q_fn_great_circle", fnGreatCircle, Some(
      """WITH t AS (SELECT c_custkey,
        |  (c_custkey % 120) / 2.0 - 30.0 AS lat1, (c_custkey % 300) / 2.0 - 75.0 AS lon1,
        |  (c_custkey % 120) / 2.0 - 30.0 + ((c_custkey % 7) - 3) AS lat2,
        |  (c_custkey % 300) / 2.0 - 75.0 + ((c_custkey % 11) - 5) AS lon2
        |  FROM customer),
        |d AS (SELECT c_custkey, 2.0 * asin(sqrt(
        |    pow(sin((lat1 * pi() / 180 - lat2 * pi() / 180) / 2), 2) +
        |    cos(lat1 * pi() / 180) * cos(lat2 * pi() / 180) *
        |    pow(sin((lon1 * pi() / 180 - lon2 * pi() / 180) / 2), 2))) AS ca
        |  FROM t)
        |SELECT c_custkey, round(ca * (180.0 / pi()) * 60, 3) AS dist_nm,
        |round(ca * (180.0 / pi()) * 60 * 1.852, 3) AS dist_km
        |FROM d ORDER BY c_custkey""".stripMargin), "F9"),
    QuerySpec("q_fn_cycle_floor", fnCycleFloor, Some(
      """SELECT TIMESTAMP '1970-01-01 00:00:00' + INTERVAL 1 SECOND *
        |CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS cycle, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY cycle""".stripMargin), "F16"),
    QuerySpec("q_fn_compose_id", fnComposeId, Some(
      """SELECT c_custkey,
        |upper((CASE CAST(c_custkey % 3 AS INT) WHEN 0 THEN 'al' WHEN 1 THEN 'ep' ELSE 'wp' END)
        |  || lpad(CAST(CAST(c_custkey % 99 AS INT) AS VARCHAR), 2, '0')
        |  || CAST(CAST(2020 + c_custkey % 5 AS INT) AS VARCHAR)) AS nhc_id,
        |upper(CASE WHEN c_custkey % 2 = 0 THEN 'nhc' ELSE 'jtwc' END)
        |  || '-' || lpad(CAST(CAST(c_custkey % 99 AS INT) AS VARCHAR), 2, '0')
        |  || (CASE CAST(c_custkey % 3 AS INT) WHEN 0 THEN 'E' WHEN 1 THEN 'W' ELSE 'C' END) AS invest_name
        |FROM customer ORDER BY c_custkey""".stripMargin), "F6"),
    QuerySpec("q_fn_validators", fnValidators, Some(
      """WITH t AS (SELECT event_type, value * 12.0 AS p, value * 3.0 AS v,
        |  value - 50.0 AS d, value * 4 AS dir FROM events)
        |SELECT event_type,
        |CAST(SUM(CAST(CASE WHEN p IS NULL THEN 1000.0
        |  WHEN (p >= 850 AND p <= 1050) OR p = 0 THEN p
        |  ELSE 1000.0 END AS DECIMAL(18,2))) AS DOUBLE) AS sum_pressure,
        |CAST(SUM(CAST(CASE WHEN v >= 0 AND v <= 250 THEN v END AS DECIMAL(18,2))) AS DOUBLE) AS sum_velocity,
        |count(CASE WHEN d >= 0 THEN d END) AS n_valid_dist,
        |count(CASE WHEN dir >= 0 AND dir <= 360 THEN dir END) AS n_valid_dir
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin), "F10-F13"),
    QuerySpec("q_fn_initcap", fnInitcap, Some(
      """SELECT n_nationkey,
        |upper(substr(lower(n_name), 1, 1)) || substr(lower(n_name), 2) AS title_name
        |FROM nation ORDER BY n_nationkey""".stripMargin), "F5"),
    QuerySpec("q_fn_date_arith", fnDateArith, Some(
      """SELECT o_orderpriority,
        |min(o_orderdate + INTERVAL 1 HOUR * CAST(o_orderkey % 73 AS INT)) AS min_valid,
        |max(o_orderdate + INTERVAL 1 HOUR * CAST(o_orderkey % 73 AS INT)) AS max_valid
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin), "F15"),
    QuerySpec("q_fn_extract_numeric", fnExtractNumeric, Some(
      """SELECT event_type,
        |CAST(sum(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |count(*) AS n FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin), "F18"),
  )
}
