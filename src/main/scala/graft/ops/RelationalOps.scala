package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables.load

/** SURVEY.md §2 relational operators (scans, filters, joins, aggregations,
  * windows, sorts, set ops) expressed over the driver's TPC-H-ish tables.
  *
  * Scale notes (100 TB): fact-fact joins shuffle on their equi keys and are
  * AQE-planned; dimension joins (`region`, `nation`, `supplier`) are
  * explicitly broadcast; every aggregation is a partial-agg-friendly
  * hash aggregate; no driver-side loops anywhere.
  */
object RelationalOps {

  /** Exact decimal sum of a double column, surfaced as double.
    * Keeps Spark-vs-DuckDB float accumulation order out of the diff. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")
  private val DSUM = "CAST(SUM(CAST(%s AS DECIMAL(18,2))) AS DOUBLE)"

  /** Exact revenue term: cast BOTH factors to decimal before multiplying —
    * decimal arithmetic is exact in every engine, whereas rounding the
    * double product to 2 decimals hits .005 ties that Spark (HALF_UP) and
    * other engines (HALF_EVEN) resolve differently. */
  private def drevenue(price: Column, discount: Column): Column =
    sum(price.cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(3, 2)) - discount.cast(DecimalType(3, 2))))
      .cast("double")
  private val DREV =
    "CAST(SUM(CAST(%s AS DECIMAL(18,2)) * (1 - CAST(%s AS DECIMAL(3,2)))) AS DOUBLE)"

  // ---------------------------------------------------------------- scans

  /** P1/P3/S8 — projection + filter pushed down to the parquet scan. */
  def scanProjectFilter(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .filter(col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy("l_orderkey", "l_linenumber")

  /** P2 — membership filter (the 23-model allowlist pattern,
    * tcdb/pipeline/adeck.py:90) + count by group. */
  def filterIsin(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase", "signup"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type")

  // --------------------------------------------------------- aggregations

  /** A1/A6 — TPC-H Q1-shaped pricing summary: multi-agg GROUP BY. */
  def aggPricingSummary(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        drevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        count(lit(1)).as("n"),
        min("l_shipdate").as("first_ship"),
        max("l_shipdate").as("last_ship"))
      .orderBy("l_returnflag", "l_linestatus")

  /** A2/O1 — multi-key GROUP BY with multi-key ORDER BY
    * (db/storm_track_counts_by_model.sql:12-15). */
  def aggGroupOrderby(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderpriority").asc, col("n").desc, col("o_orderstatus").asc)

  /** A6 — min/max per group (start/end dates, peak intensity:
    * tcdb/etl/atcf.py:308,318-319). */
  def aggMinMax(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "customer")
      .groupBy("c_nationkey")
      .agg(min("c_acctbal").as("min_bal"), max("c_acctbal").as("max_bal"),
        count(lit(1)).as("n_cust"))
      .orderBy("c_nationkey")

  /** A7 — mode with a deterministic tie-break (count desc, then value desc)
    * — the reference's `STORMNAME.mode()` / `Counter.most_common`
    * (tcdb/etl/atcf.py:168-169, syntracks.py:194-200). */
  def aggMode(spark: SparkSession, dir: String): DataFrame = {
    val counted = load(spark, dir, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("c").desc, col("event_type").desc)
    counted.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("mode_type"))
      .orderBy("user_id")
  }

  /** A8 — pivot rows→wide (the RAD 34/50/64 × quadrant pivot,
    * tcdb/etl/atcf.py:418-427). */
  def aggPivot(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("A", "N", "R"))
      .orderBy("l_linestatus")

  /** A11 — max+1 next-sequence per group (annual_id assignment,
    * tcdb/etl/process_storms.py:220-235). */
  def aggNextId(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "nation")
      .groupBy("n_regionkey")
      .agg((max("n_nationkey") + 1).as("next_id"))
      .orderBy("n_regionkey")

  /** A12/A13 — distinct counting (single-datetime invariants, distinct file
    * sets: tcdb/etl/atcf.py:350-355, pipeline/adeck.py:24). */
  def aggCountDistinct(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(col("l_orderkey")).as("n"))
      .orderBy("l_returnflag")

  /** A10 — non-null count semantics: count(col) skips nulls
    * (validSteps, tcdb/etl/syntracks.py:80-88). */
  def aggNonNullCount(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("v", when(col("value") > 50.0, col("value")))
      .groupBy("event_type")
      .agg(count(col("v")).as("n_high"), count(lit(1)).as("n_all"))
      .orderBy("event_type")

  // ---------------------------------------------------------------- joins

  /** J1/J9 — 5-way star join: facts sort-merge on keys, dims broadcast
    * (db/track_queries.sql:16-25). */
  def join5Way(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    val o  = load(spark, dir, "orders")
    val c  = load(spark, dir, "customer")
    val n  = load(spark, dir, "nation")
    val r  = load(spark, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_items"),
        drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy("r_name")
  }

  /** J2/J3 — join through dims with a dim-attribute filter pushed below the
    * join (db/model_counts_by_basin.sql:4-8). */
  def joinDimFilter(spark: SparkSession, dir: String): DataFrame = {
    val o = load(spark, dir, "orders")
    val c = load(spark, dir, "customer")
    val n = load(spark, dir, "nation").filter(col("n_name") === "NATION_3")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy("o_orderstatus")
  }

  /** J4(semi) / P9 — EXISTS probe as a left-semi join. */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val o  = load(spark, dir, "orders")
    val hi = load(spark, dir, "lineitem").filter(col("l_quantity") >= 49)
    o.join(hi, o("o_orderkey") === hi("l_orderkey"), "left_semi")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  /** J4(anti) — NOT EXISTS: the insert side of the upsert key-match split. */
  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer")
    // customers who never placed a HIGH-VALUE order — the filter on the
    // anti side keeps the gate non-vacuous at sf0.01 (the raw "no orders
    // at all" form returned 0 rows there, so its 0=0 hash match proved
    // nothing; round-16 verdict item 3). ~36% of customers qualify.
    val o = load(spark, dir, "orders").filter(col("o_totalprice") > 450000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_idle"))
      .orderBy("c_mktsegment")
  }

  /** J5 — band join: equi key + time-window predicate
    * (|Δstart_date| ≤ 24 h storm matching, tcdb/etl/process_storms.py:104-117).
    * The equi key keeps it a hash/sort-merge join, never nested-loop. */
  def joinRange(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    val o  = load(spark, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey") &&
        li("l_shipdate") >= o("o_orderdate") &&
        li("l_shipdate") <= o("o_orderdate") + expr("interval 60 days"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_in_window"))
      .orderBy("o_orderstatus")
  }

  /** J6/W3/O3 — nearest-neighbor theta join: equi-bucket candidates, a
    * distance metric, rank-1 with deterministic tie-break, threshold filter
    * (closest-storm search, tcdb/etl/process_storms.py:24-60). */
  def joinNearest(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer")
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val s = load(spark, dir, "supplier")
      .select("s_suppkey", "s_nationkey", "s_acctbal")
    val dist = abs(col("c_acctbal") - col("s_acctbal"))
    val w = Window.partitionBy("c_custkey")
      .orderBy(col("dist").asc, col("s_suppkey").asc)
    c.join(broadcast(s), col("c_nationkey") === col("s_nationkey"))
      .withColumn("dist", dist)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("dist") <= 100.0)
      .select(col("c_custkey"), col("s_suppkey").as("nearest_supp"),
        col("dist").cast("double").as("dist"))
      .orderBy("c_custkey")
  }

  /** J8 — as-of join: for each purchase, the latest click by the same user
    * at or before it (invest point-in-time snapshot,
    * tcdb/models/invest.py:60-80). */
  /** Pure range join — NO equi key, the shape that silently degrades to
    * a nested-loop/cartesian at scale — made hash-joinable by interval
    * bucketization: time is tiled into buckets as wide as the interval,
    * each interval explodes to the (≤2) buckets it covers, each point
    * joins its single bucket, and the exact range predicate filters
    * inside the hash join's output. Every qualifying pair matches in
    * exactly one bucket (the point's), so no dedup pass is needed. At
    * 100 TB both sides shuffle once on the bucket key instead of
    * nesting; the oracle is the PLAIN range join — bucketing must be
    * invisible in results.
    *
    * The point side PRE-AGGREGATES by value below the join (the count
    * is additive): a range join's output is quadratic in temporal
    * density — replicating the corpus 32× on a fixed time axis makes
    * every window 32× denser, so pair count grows 1024× — but the
    * (value, count) relation is bounded by the number of DISTINCT point
    * values, which scales with the time axis, not the corpus. The 32×
    * probe runs quadratic (hours) without this and linear with it. */
  def joinIntervalBucketed(spark: SparkSession, dir: String): DataFrame = {
    val bucketDays = 7
    val epoch = to_date(lit("1970-01-01"))
    def bkt(c: org.apache.spark.sql.Column) =
      floor(datediff(c, epoch) / bucketDays)
    val o = load(spark, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderdate").as("start"),
        (col("o_orderdate") + expr("interval 7 days")).as("end"))
      .withColumn("bkt",
        explode(sequence(bkt(col("start")), bkt(col("end")))))
    val li = load(spark, dir, "lineitem")
      .groupBy("l_shipdate").agg(count(lit(1)).as("pt_n"))
      .withColumn("bkt", bkt(col("l_shipdate")))
    o.join(li, Seq("bkt"))
      .filter(col("l_shipdate") >= col("start")
        && col("l_shipdate") <= col("end"))
      .groupBy("o_orderstatus")
      .agg(sum(col("pt_n")).as("n_in_window"))
      .orderBy("o_orderstatus")
  }

  def joinAsOf(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
    val p  = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val cl = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val w = Window.partitionBy("purchase_id")
      .orderBy(col("c_ts").desc, col("click_id").desc)
    p.join(cl, col("user_id") === col("c_user") && col("c_ts") <= col("p_ts"), "inner")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("purchase_id"), col("click_id"))
      .orderBy("purchase_id")
  }

  /** Zero-exchange co-located join through bucketed tables
    * ([[Bucketing]]) — the standing replacement for the reference's
    * natural-key B-tree indexes: pre-shuffle once at write time, then
    * repeated fact-fact joins on the bucket key read both sides already
    * partitioned AND sorted. The gate diffs the join's RESULT against
    * the plain-join DuckDB oracle while `require`-asserting the plan
    * contains no shuffle exchange in the same run — correctness and the
    * scale property, together. Table writes are memoized fixture prep
    * (a production run buckets once, queries many times). */
  private val bucketFixture = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, String)]

  def joinBucketed(spark: SparkSession, dir: String): DataFrame = {
    // synchronized: TrieMap.getOrElseUpdate may run a racing builder
    // twice and discard one — these builders write real tables
    val (tli, to) = bucketFixture.synchronized {
      bucketFixture.getOrElseUpdate((spark, dir), {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val base = SourceSinkOps.tmp("bucketed", dir)
      val (nli, no) = (s"b_lineitem_$sfx", s"b_orders_$sfx")
      Bucketing.writeBucketed(load(spark, dir, "lineitem")
          .select(col("l_orderkey").as("k"), col("l_quantity")),
        nli, 8, Seq("k"), Some(s"$base/li"))
      Bucketing.writeBucketed(load(spark, dir, "orders")
          .select(col("o_orderkey").as("k"), col("o_orderstatus"),
            col("o_totalprice")),
        no, 8, Seq("k"), Some(s"$base/o"))
      (nli, no)
    })}
    val j = Bucketing.coLocatedJoin(spark, tli, to, Seq("k"))
    require(Bucketing.exchangeCount(j) == 0,
      "bucketed co-located join planned a shuffle exchange")
    j.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  // -------------------------------------------------------------- windows

  /** W1/W2 — first/last value by event-time order with total tie-break
    * (tcdb/etl/atcf.py:310-326). Implemented as min/max over structs —
    * one agg pass, no window shuffle. */
  def windowFirstLast(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .groupBy("user_id")
      .agg(
        min(struct(col("ts"), col("event_id"), col("event_type"))).getField("event_type").as("first_type"),
        max(struct(col("ts"), col("event_id"), col("event_type"))).getField("event_type").as("last_type"))
      .orderBy("user_id")

  /** W3 — top-1 per group by metric (longest-track tie-break,
    * tcdb/etl/syntracks.py:366-371). */
  def windowTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    load(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("top_order"),
        col("o_totalprice").as("top_price"))
      .orderBy("o_custkey")
  }

  /** Running aggregate over an ordered frame (exposed for parity; the
    * reference's ordered iteration W6). */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    load(spark, dir, "events")
      .withColumn("running_value",
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double"))
      .select(col("event_id"), col("user_id"), col("running_value"))
      .orderBy("event_id")
  }

  /** Lead/lag gap analysis: seconds since the user's previous event. */
  def windowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    load(spark, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("gap_ms",
        unix_millis(col("ts").cast("timestamp")) -
          unix_millis(col("prev_ts").cast("timestamp")))
      .select(col("event_id"), col("user_id"), col("gap_ms"))
      .orderBy("event_id")
  }

  /** W5 — dense time-spine alignment: generate a monthly spine, left-join
    * sparse aggregates, fill gaps (xarray grid alignment,
    * tcdb/etl/syntracks.py:107-127). */
  def windowSpine(spark: SparkSession, dir: String): DataFrame = {
    val spine = spark.range(1).select(explode(expr(
      "sequence(timestamp_ntz'1995-01-01 00:00:00', timestamp_ntz'2001-08-01 00:00:00', interval 1 month)"))
      .as("month"))
    val monthly = load(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"))
    spine.join(monthly, Seq("month"), "left_outer")
      .select(col("month"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("month")
  }

  // ------------------------------------------------------- sort / set ops

  /** O1/O6 — global top-k with LIMIT and total order. */
  def sortTopkLimit(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** Set union with dedup (multi-basin frame concat,
    * tcdb/pipeline/bdeck.py:62 + W4 unionByName). */
  def setUnion(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer").select(col("c_nationkey").as("nk"))
    val s = load(spark, dir, "supplier").select(col("s_nationkey").as("nk"))
    c.union(s).distinct().orderBy("nk")
  }

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q_scan_project_filter", scanProjectFilter, Some(
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00'""".stripMargin), "S8/P1/P3"),
    QuerySpec("q_filter_isin", filterIsin, Some(
      """SELECT event_type, count(*) AS n FROM events
        |WHERE event_type IN ('click','purchase','signup')
        |GROUP BY event_type ORDER BY event_type""".stripMargin), "P2"),
    QuerySpec("q_agg_pricing_summary", aggPricingSummary, Some(
      s"""SELECT l_returnflag, l_linestatus,
         |${DSUM.format("l_quantity")} AS sum_qty,
         |${DSUM.format("l_extendedprice")} AS sum_price,
         |${DREV.format("l_extendedprice", "l_discount")} AS sum_disc_price,
         |count(*) AS n, min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin), "A1/A6"),
    QuerySpec("q_agg_group_orderby", aggGroupOrderby, Some(
      s"""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
         |${DSUM.format("o_totalprice")} AS total
         |FROM orders GROUP BY o_orderpriority, o_orderstatus
         |ORDER BY o_orderpriority ASC, n DESC, o_orderstatus ASC""".stripMargin), "A2/O1"),
    QuerySpec("q_agg_minmax", aggMinMax, Some(
      """SELECT c_nationkey, min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
        |count(*) AS n_cust FROM customer GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin), "A6"),
    QuerySpec("q_agg_mode", aggMode, Some(
      """SELECT user_id, event_type AS mode_type FROM (
        |  SELECT user_id, event_type, row_number() OVER (
        |    PARTITION BY user_id ORDER BY count(*) DESC, event_type DESC) AS rn
        |  FROM events GROUP BY user_id, event_type) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin), "A7"),
    QuerySpec("q_agg_pivot", aggPivot, Some(
      """SELECT l_linestatus,
        |count(*) FILTER (WHERE l_returnflag = 'A') AS "A",
        |count(*) FILTER (WHERE l_returnflag = 'N') AS "N",
        |count(*) FILTER (WHERE l_returnflag = 'R') AS "R"
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin), "A8"),
    QuerySpec("q_agg_next_id", aggNextId, Some(
      """SELECT n_regionkey, max(n_nationkey) + 1 AS next_id
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin), "A11"),
    QuerySpec("q_agg_count_distinct", aggCountDistinct, Some(
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        |count(DISTINCT l_partkey) AS n_part, count(l_orderkey) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin), "A12/A13"),
    QuerySpec("q_agg_nonnull_count", aggNonNullCount, Some(
      """SELECT event_type, count(CASE WHEN value > 50.0 THEN value END) AS n_high,
        |count(*) AS n_all FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin), "A10"),
    QuerySpec("q_join_5way", join5Way, Some(
      s"""SELECT r_name, count(*) AS n_items,
         |${DREV.format("l_extendedprice", "l_discount")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin), "J1/J9"),
    QuerySpec("q_join_dim_filter", joinDimFilter, Some(
      s"""SELECT o_orderstatus, count(*) AS n_orders,
         |${DSUM.format("o_totalprice")} AS total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE n_name = 'NATION_3'
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin), "J2/J3"),
    QuerySpec("q_join_semi", joinSemi, Some(
      """SELECT o_orderstatus, count(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin), "J4/P9"),
    QuerySpec("q_join_anti", joinAnti, Some(
      """SELECT c_mktsegment, count(*) AS n_idle FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_totalprice > 450000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin), "J4"),
    QuerySpec("q_join_range", joinRange, Some(
      """SELECT o_orderstatus, count(*) AS n_in_window
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin), "J5"),
    QuerySpec("q_join_interval", joinIntervalBucketed, Some(
      """SELECT o_orderstatus, count(*) AS n_in_window
        |FROM orders o JOIN lineitem l
        |  ON l.l_shipdate >= o.o_orderdate
        |  AND l.l_shipdate <= o.o_orderdate + INTERVAL 7 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin), "J5/keyless-bucketized"),
    QuerySpec("q_join_nearest", joinNearest, Some(
      """SELECT c_custkey, s_suppkey AS nearest_supp, CAST(dist AS DOUBLE) AS dist
        |FROM (
        |  SELECT c_custkey, s_suppkey, abs(c_acctbal - s_acctbal) AS dist,
        |    row_number() OVER (PARTITION BY c_custkey
        |      ORDER BY abs(c_acctbal - s_acctbal) ASC, s_suppkey ASC) AS rn
        |  FROM customer JOIN supplier ON c_nationkey = s_nationkey) t
        |WHERE rn = 1 AND dist <= 100.0 ORDER BY c_custkey""".stripMargin), "J6/W3/O3"),
    QuerySpec("q_join_asof", joinAsOf, Some(
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, ts FROM events
        |  WHERE event_type = 'click')
        |SELECT purchase_id, click_id FROM (
        |  SELECT p.purchase_id, c.click_id, row_number() OVER (
        |    PARTITION BY p.purchase_id ORDER BY c.ts DESC, c.click_id DESC) AS rn
        |  FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts) t
        |WHERE rn = 1 ORDER BY purchase_id""".stripMargin), "J8"),
    QuerySpec("q_join_bucketed", joinBucketed, Some(
      s"""SELECT o_orderstatus, count(*) AS n,
         |${DSUM.format("l_quantity")} AS sum_qty,
         |${DSUM.format("o_totalprice")} AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      "J-bucketed/zero-exchange"),
    QuerySpec("q_window_first_last", windowFirstLast, Some(
      """SELECT user_id,
        |max(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
        |max(CASE WHEN rn_d = 1 THEN event_type END) AS last_type
        |FROM (SELECT user_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn_a,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events) t
        |GROUP BY user_id ORDER BY user_id""".stripMargin), "W1/W2"),
    QuerySpec("q_window_topk", windowTopk, Some(
      """SELECT o_custkey, o_orderkey AS top_order, o_totalprice AS top_price
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
        |  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |  FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin), "W3"),
    QuerySpec("q_window_running", windowRunning, Some(
      """SELECT event_id, user_id,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events ORDER BY event_id""".stripMargin), "W6"),
    QuerySpec("q_window_lag", windowLag, Some(
      """SELECT event_id, user_id,
        |epoch_ms(ts) - epoch_ms(lag(ts, 1) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id)) AS gap_ms
        |FROM events ORDER BY event_id""".stripMargin), "W6"),
    QuerySpec("q_window_spine", windowSpine, Some(
      """WITH spine AS (SELECT unnest(generate_series(
        |  TIMESTAMP '1995-01-01', TIMESTAMP '2001-08-01', INTERVAL 1 MONTH)) AS month),
        |m AS (SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT spine.month AS month, COALESCE(m.n_orders, 0) AS n_orders
        |FROM spine LEFT JOIN m ON spine.month = m.month ORDER BY month""".stripMargin), "W5"),
    QuerySpec("q_sort_topk_limit", sortTopkLimit, Some(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin), "O1/O6"),
    QuerySpec("q_set_union", setUnion, Some(
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin), "W4/union"),
  )
}
