package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables.load

/** OLAP surface beyond the reference's own queries — outer joins, set
  * operations, grouping sets, exact percentiles, the full rank family,
  * and gap-based sessionization. The reference never needs these
  * (SURVEY.md §2.3 "no outer joins", §2.4 "no grouping sets"), but an
  * engine a reference user switches to should have the standard
  * relational algebra complete — and each op here is shuffle-planned the
  * way a 100 TB deployment needs (partial aggregation below the exchange,
  * broadcast dims, single window pass per partition spec).
  *
  * Determinism conventions (QuerySpec scaladoc): DECIMAL sums, total
  * tie-breaks, explicit NULLS FIRST to match Spark's ascending default.
  */
object OlapOps {

  /** Left-outer dim→fact join with null-preserving counts: customers with
    * zero orders stay (count(o_orderkey) skips nulls, count(*) doesn't). */
  def joinOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer")
    val o = load(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy("c_nationkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"),
        sum(when(col("o_orderkey").isNull, 1).otherwise(0)).cast("long")
          .as("n_childless"))
      .orderBy("c_nationkey")
  }

  /** EXCEPT — customers that never ordered (distinct set semantics). */
  /** EXCEPT — customer keys with no RECENT order. The date filter on the
    * subtracted side keeps the gate non-vacuous at sf0.01 (the unfiltered
    * form returned 0 rows there — every customer has some order — so its
    * 0=0 hash match proved nothing; round-16 verdict item 3). */
  def setExcept(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "customer").select(col("c_custkey").as("k"))
      .except(load(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("date"))
        .select(col("o_custkey").as("k")))
      .orderBy("k")

  /** INTERSECT — part keys present in both lineitem halves. */
  def setIntersect(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    li.filter(col("l_orderkey") % 2 === 0).select(col("l_partkey").as("k"))
      .intersect(
        li.filter(col("l_orderkey") % 2 === 1).select(col("l_partkey").as("k")))
      .orderBy("k")
  }

  /** ROLLUP over (returnflag, linestatus) with grouping indicators —
    * subtotals and grand total in one pass (partial-agg friendly). */
  def aggRollup(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("qty"),
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"))
      .orderBy(col("g_rf"), col("g_ls"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** CUBE over (orderpriority-prefix, orderstatus). */
  def aggCube(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .withColumn("pri", substring(col("o_orderpriority"), 1, 1))
      .cube("pri", "o_orderstatus")
      .agg(count(lit(1)).as("n"),
        grouping(col("pri")).as("g_p"),
        grouping(col("o_orderstatus")).as("g_s"))
      .orderBy(col("g_p"), col("g_s"),
        col("pri").asc_nulls_first, col("o_orderstatus").asc_nulls_first)

  /** GROUPING SETS — the general form rollup/cube are shorthands for:
    * an explicit, non-hierarchical set of grouping combinations in one
    * pass (Spark expands to one Expand node feeding one aggregate — no
    * per-set rescan). grouping() flags disambiguate real NULL keys from
    * set placeholders. Built on the DataFrame groupingSets API directly —
    * no session-global temp view, so concurrent gate runs in one
    * SparkSession can't race a view definition. */
  def aggGroupingSets(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .withColumn("pri", substring(col("o_orderpriority"), 1, 1))
      .groupingSets(
        Seq(Seq(col("pri"), col("o_orderstatus")), Seq(col("pri")),
          Seq(col("o_orderstatus"))),
        col("pri"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        grouping(col("pri")).as("g_p"),
        grouping(col("o_orderstatus")).as("g_s"))
      .orderBy(col("g_p"), col("g_s"), col("pri").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  /** EXCEPT ALL / INTERSECT ALL — multiset semantics (per-key
    * multiplicities subtract / take the minimum), which the DISTINCT
    * set ops above silently discard; one row per surviving duplicate. */
  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    val even = li.filter(col("l_orderkey") % 2 === 0)
      .select(col("l_partkey").as("k"))
    val odd = li.filter(col("l_orderkey") % 2 === 1)
      .select(col("l_partkey").as("k"))
    even.exceptAll(odd).groupBy("k").agg(count(lit(1)).as("n_except"))
      .join(even.intersectAll(odd).groupBy("k")
          .agg(count(lit(1)).as("n_intersect")),
        Seq("k"), "full_outer")
      .select(col("k"), coalesce(col("n_except"), lit(0L)).as("n_except"),
        coalesce(col("n_intersect"), lit(0L)).as("n_intersect"))
      .orderBy("k")
  }

  /** Equi-width histogram (the data-card / CBO bucketing primitive):
    * global min/max in one tiny aggregate (broadcast via cross join),
    * then one map-side bucket assignment + count — two narrow passes,
    * no sort. Bucket arithmetic stays in exact integer cents so the
    * bucket boundary decision replays identically in any engine (a
    * double `(v-min)/width` hits boundary-rounding ties); the `+1`
    * denominator keeps the max value inside bucket n-1 without a
    * clamp. */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val nBuckets = 10
    val li = load(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val bounds = li.agg(min("cents").as("lo"), max("cents").as("hi"))
    li.crossJoin(broadcast(bounds))
      // `div` = exact integer floor division (DuckDB `//`): a double
      // `/`-then-truncate can round a just-below-integer quotient UP
      // across the bucket boundary
      .withColumn("bucket", expr(
        s"CAST((cents - lo) * $nBuckets div (hi - lo + 1) AS INT)"))
      .groupBy("l_returnflag", "bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag", "bucket")
  }

  /** Exact continuous percentiles. l_quantity is integer-valued, so the
    * linear interpolation at .25/.5/.75 lands on exact binary fractions —
    * bit-identical across engines regardless of interpolation formula. */
  def aggPercentiles(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("p25"),
        expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50"),
        expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity)").as("p75"))
      .orderBy("l_returnflag")

  /** Pivot → unpivot (melt) round trip: the wide-to-long reshape every
    * feature pipeline needs as the inverse of the radial/A8 pivots. The
    * unpivot is map-side (one output row per (row, value column) — no
    * shuffle beyond the pivot's own aggregate); null cells (combinations
    * absent from the data) are dropped on both engines. */
  def unpivotMelt(spark: SparkSession, dir: String): DataFrame = {
    val members = (1 to 7)
    val wide = load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .pivot("l_linenumber", members.map(Int.box))
      .agg(count(lit(1)))
    wide.unpivot(Array(col("l_returnflag")),
        members.map(i => col(s"`$i`")).toArray, "member", "cnt")
      .filter(col("cnt").isNotNull)
      .select(col("l_returnflag"), col("member"), col("cnt"))
      .orderBy("l_returnflag", "member")
  }

  /** Rank family in one window pass: rank, dense_rank, percent_rank,
    * ntile, cume_dist — all over a TOTAL order (tie-break o_orderkey). */
  def windowRanks(spark: SparkSession, dir: String): DataFrame = {
    val o = load(spark, dir, "orders").filter(col("o_orderkey") % 97 === 0)
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.select(col("o_orderpriority"), col("o_orderkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("prnk"),
        ntile(4).over(w).as("quartile"),
        cume_dist().over(w).as("cd"))
      .orderBy("o_orderpriority", "rnk")
  }

  /** Gap-based sessionization (the batch shape of streaming session
    * windows): a new session starts when a user's inter-event gap EXCEEDS
    * 30 minutes — strict `>`, verified empirically against the
    * engine-native `session_window`, which merges an event landing
    * exactly at start+gap into the running session (adjacent windows
    * coalesce). Session id = running count of starts. One shuffle on
    * user_id serves both window passes AND the final rollup — the
    * partitioning is reused, exactly the plan wanted at 100 TB. */
  def sessionizeEvents(events: DataFrame): DataFrame = {
    HotKeyAdvisor.advise(events, Seq("user_id"),
      "OlapOps.sessionize", "sessionizeChunkedEvents")
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // gap test compares full-precision timestamps (interval arithmetic),
    // never truncated epoch seconds — ts carries microseconds.
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"))
  }

  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionizeEvents(load(spark, dir, "events"))
      .orderBy("user_id", "session_id")

  /** Skew-safe sessionization: [[sessionizeEvents]]'s per-user ordered
    * window puts EVERY event of a user in one task — the wave-2 skew
    * probe measured a mega-user (97% of events on one key at 32×) at
    * 1.79×, and at crawl scale a head user makes that task the job.
    * This form is the structural mitigation the probe row names:
    *
    *  1. events partition by (user, coarse TIME CHUNK) — the heavy
    *     per-event sort/lag runs chunk-parallel, so a user's volume
    *     spreads over span/chunk tasks;
    *  2. local sessions reduce to per-(user, chunk) SUMMARY rows
    *     (count, start, end) — corpus-sized data never crosses the
    *     second shuffle;
    *  3. a per-user window over those summaries stitches sessions
    *     across chunk boundaries (merge iff gap <= 30 min — EXACT: a
    *     boundary merge is the event-level rule applied to the last
    *     event before / first event after the cut, and chains merge
    *     transitively across any number of boundaries), then numbers
    *     chains in start order, reproducing the plain form's
    *     session_id bit-for-bit (pinned by OlapOpsSpec and the shared
    *     differential oracle).
    *
    * The stitch window is per-user over SESSIONS, not events — a
    * mega-user with months of activity contributes rows proportional
    * to its session count. `chunkHours` trades parallelism (smaller
    * chunks) against stitch-relation size (more boundary sessions);
    * it must exceed the 30-minute gap so a session never skips a
    * whole chunk. */
  def sessionizeChunkedEvents(events: DataFrame,
      chunkHours: Int = 24 * 7): DataFrame = {
    require(chunkHours >= 1, "chunkHours must cover the session gap")
    val chunkSec = chunkHours * 3600L
    val byChunk = Window.partitionBy("user_id", "chunk")
      .orderBy("ts", "event_id")
    val locals = events
      .withColumn("chunk",
        floor(unix_timestamp(col("ts")) / chunkSec).cast("long"))
      .withColumn("prev_ts", lag("ts", 1).over(byChunk))
      .withColumn("new_local",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("local_id", sum("new_local").over(
        byChunk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "chunk", "local_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"))
    // the stitch relation is session summaries — per-user row counts
    // are bounded by session counts, never event counts
    val byUser = Window.partitionBy("user_id")
      .orderBy("session_start", "session_end")
    locals
      .withColumn("prev_end", lag("session_end", 1).over(byUser))
      .withColumn("new_chain",
        when(col("prev_end").isNull ||
          col("session_start") > col("prev_end") +
            expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_chain").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(sum("n_events").as("n_events"),
        min("session_start").as("session_start"),
        max("session_end").as("session_end"))
  }

  def sessionizeChunked(spark: SparkSession, dir: String): DataFrame =
    sessionizeChunkedEvents(load(spark, dir, "events"))
      .orderBy("user_id", "session_id")

  /** Shared by q_sessionize and its chunk-and-stitch twin — the two
    * plans must be result-identical by construction. */
  private val sessionizeOracle: String =
    """WITH g AS (SELECT user_id, ts, event_id,
      |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |s AS (SELECT user_id, ts, event_id,
      |  CASE WHEN prev_ts IS NULL
      |         OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      |  FROM g),
      |i AS (SELECT user_id, ts, CAST(SUM(new_session) OVER (
      |  PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM s)
      |SELECT user_id, session_id, count(*) AS n_events,
      |min(ts) AS session_start, max(ts) AS session_end
      |FROM i GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Ordered funnel analysis (view → click → purchase): per user, the
    * earliest 'view', the earliest 'click' strictly AFTER that view, and
    * the earliest 'purchase' strictly after that click — the product
    * analytics primitive sequence-pattern engines special-case,
    * expressed relationally. `stage` = deepest step reached (0-3);
    * timestamps carry through so conversion lag is a subtraction away.
    *
    * Scale shape: every stage keys on user_id — one hash partitioning
    * serves all three min-aggregates and the final left joins (the
    * [[sessionizeEvents]] argument); per-stage frames shrink
    * monotonically (only users who passed stage k reach the k+1 join). */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val t1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val t2 = e.filter(col("event_type") === "click")
      .join(t1, Seq("user_id")).filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val t3 = e.filter(col("event_type") === "purchase")
      .join(t2, Seq("user_id")).filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    e.select("user_id").distinct()
      .join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1)
          .otherwise(0).cast("int").as("stage"))
      .orderBy("user_id")
  }

  /** Weekly cohort retention — the third classic product-analytics
    * primitive beside [[sessionizeEvents]] and [[funnel]]: users are
    * cohorted by the week of their FIRST event, and each later week of
    * activity counts toward (cohort, offset) retention. Returns the
    * retention triangle: cohort week, week offset, cohort size, active
    * users, retention fraction.
    *
    * Scale shape: the first-activity aggregate and the activity join
    * both key on user_id (one partitioning reused), then one aggregate
    * on the (cohort, offset) pair; the offset-0 cohort-size row set is
    * weeks-sized — broadcast back. Nothing scans events twice at full
    * width, no window over the whole relation.
    *
    * The synthetic events stream has every user active in every week
    * (one cohort, flat retention — a vacuous triangle), so the gate
    * PLANTS lifecycle structure the established way ([[CurateOps]]
    * piiRedact): user u signs up in week u%5 and churns after
    * 1 + u%7 active weeks — events outside [signup, churn) are
    * dropped before cohorting. Five staggered cohorts with a decaying
    * retention curve, replayed identically by the oracle. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val signup = pmod(col("user_id"), lit(5L))
    val e = load(spark, dir, "events")
      .select(col("user_id"),
        floor(datediff(to_date(col("ts")), to_date(lit("2024-01-01")))
          .cast("double") / 7).cast("long").as("wk"))
      .filter(col("wk") >= signup &&
        col("wk") < signup + 1L + pmod(col("user_id"), lit(7L)))
    val first = e.groupBy("user_id").agg(min("wk").as("cohort_week"))
    val ret = e.join(first, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct("user_id").as("n_active"))
    val size = ret.filter(col("week_offset") === 0L)
      .select(col("cohort_week"), col("n_active").as("cohort_size"))
    ret.join(broadcast(size), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("cohort_size"),
        col("n_active"),
        round(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention"))
      .orderBy("cohort_week", "week_offset")
  }

  private val cohortRetentionOracle: String =
    """WITH e0 AS (SELECT user_id,
      |    (CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS wk FROM events),
      |e AS (SELECT user_id, wk FROM e0
      |  WHERE wk >= user_id % 5
      |    AND wk < user_id % 5 + 1 + user_id % 7),
      |f AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY user_id),
      |r AS (SELECT f.cohort_week, e.wk - f.cohort_week AS week_offset,
      |    count(DISTINCT e.user_id) AS n_active
      |  FROM e JOIN f USING (user_id) GROUP BY 1, 2),
      |s AS (SELECT cohort_week, n_active AS cohort_size FROM r
      |  WHERE week_offset = 0)
      |SELECT r.cohort_week, CAST(r.week_offset AS BIGINT) AS week_offset,
      |  CAST(s.cohort_size AS BIGINT) AS cohort_size,
      |  CAST(r.n_active AS BIGINT) AS n_active,
      |  round(CAST(r.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
      |FROM r JOIN s USING (cohort_week)
      |ORDER BY cohort_week, week_offset""".stripMargin

  /** Skew-salted dimension join, oracled against the plain join: the big
    * side sprays each hot key over 8 salt replicas (deterministic spray
    * from row content, so retries re-land identically) and the small side
    * replicates — result is identical row-for-row to the unsalted join,
    * which is exactly what the oracle asserts. */
  def joinSalted(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
      .withColumnRenamed("l_partkey", "p_partkey")
    val part = load(spark, dir, "part").select("p_partkey", "p_brand")
    Skew.saltedJoinBy(li, part, Seq("p_partkey"),
        sprayCols = Seq(col("l_orderkey"), col("l_linenumber")), salt = 8,
        joinType = "inner")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("qty"))
      .orderBy("p_brand")
  }

  /** String-function surface: levenshtein, translate, replace, lpad,
    * repeat, reverse — all codegen'd built-ins, same semantics in DuckDB. */
  def fnStrings(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "nation")
      .select(col("n_nationkey"),
        levenshtein(col("n_name"), lit("UNITED STATES")).as("lev"),
        translate(col("n_name"), "AEIOU", "aeiou").as("tr"),
        regexp_replace(col("n_name"), "[^A-Z]", "_").as("re"),
        lpad(col("n_name"), 20, ".").as("pad"),
        reverse(col("n_name")).as("rev"))
      .orderBy("n_nationkey")

  /** RANGE-frame moving aggregate: events within the trailing hour per
    * user, ordered by exact epoch micros (a RANGE frame over event time —
    * the sliding-window shape streaming jobs aggregate with).
    *
    * DEFAULT PATH = the O(n) prefix-difference form
    * ([[windowRangeFramePrefixEvents]]): count/sum are subtractable, so
    * the naive sliding frame's O(Σ frame sizes) recompute is pure waste —
    * the wave-3 skew probe measured the naive plan at 4.90× under the
    * 32× dense mega-user (246× frame-mass concentration through one
    * task) while the prefix form ran 0.63× at the same replica,
    * bit-identical. A user reaching for the obvious name now gets the
    * scale-safe plan; the naive frame survives as
    * [[windowRangeFramePlainEvents]] (its own differential gate) for
    * cross-checking and as the probe baseline. */
  def windowRangeFrameEvents(events: DataFrame): DataFrame =
    windowRangeFramePrefixEvents(events)

  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame =
    windowRangeFrameEvents(
      load(spark, dir, "events").filter(col("event_id") % 17 === 0))

  /** The NAIVE sliding-frame form — Spark's `SlidingWindowFunctionFrame`
    * does not retract, so this pays O(Σ frame sizes) and funnels each
    * user through one task (the wave-3 4.90×/32× mega-user finding).
    * Retained, differential-gated, as the semantic baseline the three
    * scale-safe forms are probed and spec-checked against; not the
    * path [[windowRangeFrame]] routes to. */
  def windowRangeFramePlainEvents(events: DataFrame): DataFrame = {
    HotKeyAdvisor.advise(events, Seq("user_id"),
      "OlapOps.windowRangeFramePlain",
      "windowRangeFrame (the default prefix-difference path)")
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    events
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_trailing_hour"),
        sum(col("value").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("v_trailing_hour"))
      .orderBy("event_id")
  }

  def windowRangeFramePlain(spark: SparkSession, dir: String): DataFrame =
    windowRangeFramePlainEvents(
      load(spark, dir, "events").filter(col("event_id") % 17 === 0))

  /** Skew-safe trailing-hour aggregate: [[windowRangeFrame]]'s per-user
    * RANGE frame is the third per-key window pathology under a mega key
    * (after the running sum and the percentile rank) — one user's whole
    * event history slides through ONE task. Bounded-lookback frames
    * parallelize by TIME CHUNK with HALO rows (the overlap trick of
    * stencil/halo-exchange computations): every event lands in its own
    * chunk, and events in the last `lookback` of a chunk are COPIED into
    * the next chunk as context-only rows, so any row's [t−1h, t] frame
    * is complete within its (user, chunk) partition — frame contents are
    * IDENTICAL to the plain form's (own rows cover [chunk_start, t],
    * halo copies cover [t−1h, chunk_start); the two ranges are disjoint,
    * so nothing double-counts). Context rows contribute to frames but
    * their own outputs are dropped. A mega-user now costs span/chunk
    * tasks of bounded size; shuffle volume grows only by the halo
    * fraction (lookback/chunk ≈ 4% at the defaults). Bit-identical to
    * [[windowRangeFrame]]; shares its differential oracle. Epoch micros
    * are assumed non-negative (integer DIV truncation = floor). */
  def windowRangeFrameChunkedEvents(events: DataFrame,
      chunkHours: Int = 24): DataFrame = {
    val lookbackUs = 3600000000L
    val chunkUs = chunkHours.toLong * 3600000000L
    require(chunkUs >= lookbackUs, "chunk must cover the lookback")
    val base = events
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("chunk", expr(s"us DIV ${chunkUs}L"))
    val halo = base
      .filter(col("us") - col("chunk") * chunkUs >= chunkUs - lookbackUs)
      .withColumn("chunk", col("chunk") + lit(1L))
      .withColumn("ctx", lit(true))
    val w = Window.partitionBy("user_id", "chunk").orderBy(col("us"))
      .rangeBetween(-lookbackUs, 0L)
    base.withColumn("ctx", lit(false)).unionByName(halo)
      .select(col("event_id"), col("user_id"), col("ctx"),
        count(lit(1)).over(w).as("n_trailing_hour"),
        sum(col("value").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("v_trailing_hour"))
      .filter(!col("ctx")).drop("ctx")
      .orderBy("event_id")
  }

  def windowRangeFrameChunked(spark: SparkSession, dir: String,
      chunkHours: Int = 24): DataFrame =
    windowRangeFrameChunkedEvents(
      load(spark, dir, "events").filter(col("event_id") % 17 === 0),
      chunkHours)

  /** WORK-OPTIMAL trailing-hour aggregate: the halo form parallelizes
    * the mega-user but still pays Spark's sliding-frame recompute —
    * `SlidingWindowFunctionFrame` does not retract, so a RANGE frame
    * costs O(Σ frame sizes), and the wave-3 probe adjudicated a 246×
    * frame-mass blowup on the dense mega-user. Count/sum are
    * subtractable, so the frame aggregate is a DIFFERENCE OF PREFIX
    * sums — an O(n) computation:
    *
    *  1. every event emits TWO tagged rows: itself (`at = us`) and a
    *     PROBE at `at = us − lookback − 1` (one microsecond left of the
    *     inclusive frame edge, so "events strictly before t−1h" is
    *     exactly what the probe's prefix sees);
    *  2. one ordered pass per (user, chunk) — ORDER BY (at, is_probe)
    *     with the DEFAULT window frame (range-unbounded-preceding):
    *     incremental in Spark, peers share a value, so tied event
    *     times get the tie-inclusive count RANGE semantics require,
    *     and a probe tied with a real row sorts AFTER it (`is_probe`
    *     last) because us = t−1h−1 is inside the exclusion;
    *  3. chunk totals (real rows only) prefix per user over the tiny
    *     chunk relation and broadcast back as offsets — the same
    *     stitch as [[CurateOps.packSequencesChunked]], built over the
    *     union's own (user, chunk) key set so a probe landing in a
    *     chunk with no real rows still finds its offset;
    *  4. the per-event difference comes from one (event, user) hash
    *     aggregate: +global-prefix on the real row, − on the probe.
    *
    * All-null frames reproduce SQL semantics through a third prefix
    * (non-null value count): diff 0 → NULL, matching the frame sum.
    * Decimal prefixes subtract exactly — bit-identical to the plain
    * RANGE frame (shared differential oracle + OlapOpsSpec). Work is
    * O(n) regardless of frame density AND spread over span/chunkHours
    * tasks — both knives into the 4.90× probe finding at once.
    *
    * Null-ts rows take a separate exact branch: a RANGE frame makes all
    * of a user's null-ordered rows PEERS (the frame is the null peer
    * group), so their aggregate is one per-user hash aggregate joined
    * back — never a per-user window, so even a mega-user of null
    * timestamps stays parallel. The final (event_id, user_id) hash
    * aggregate assumes event_id is unique per user (the events table
    * key): duplicate (event_id, user_id) rows would collapse into one
    * summed row where the plain frame emits one row each. Epoch micros
    * are assumed non-negative (integer DIV truncation = floor). */
  def windowRangeFramePrefixEvents(events: DataFrame,
      chunkHours: Int = 24): DataFrame = {
    require(chunkHours >= 1, "chunkHours must be positive")
    val lookbackUs = 3600000000L
    val chunkUs = chunkHours.toLong * 3600000000L
    val e0 = events
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("v", col("value").cast(DecimalType(18, 2)))
      .select(col("event_id"), col("user_id"), col("us"), col("v"))
    val nullRows = e0.filter(col("us").isNull)
    val nullOut = nullRows
      .join(broadcast(nullRows.groupBy(col("user_id").as("nu"))
          .agg(count(lit(1)).as("n_peers"), sum("v").as("v_peers"))),
        col("user_id") <=> col("nu"))
      .select(col("event_id"), col("user_id"),
        col("n_peers").as("n_trailing_hour"),
        col("v_peers").cast("double").as("v_trailing_hour"))
    val e = e0.filter(col("us").isNotNull)
    val real = e.withColumn("at", col("us")).withColumn("is_probe", lit(0))
    val probe = e
      .withColumn("at", col("us") - lit(lookbackUs + 1L))
      .withColumn("is_probe", lit(1))
    val tagged = real.unionByName(probe)
      .withColumn("chunk", expr(s"at DIV ${chunkUs}L"))
      .withColumn("cn", when(col("is_probe") === 0, lit(1L)).otherwise(lit(0L)))
      .withColumn("cv", when(col("is_probe") === 0, col("v")))
      .withColumn("cnn", when(col("is_probe") === 0 && col("v").isNotNull,
        lit(1L)).otherwise(lit(0L)))
    // default frame = RANGE UNBOUNDED PRECEDING..CURRENT ROW with PEERS:
    // incremental (no sliding recompute) and tie-inclusive
    val wLocal = Window.partitionBy("user_id", "chunk")
      .orderBy(col("at"), col("is_probe"))
    val local = tagged
      .withColumn("ln", sum("cn").over(wLocal))
      .withColumn("lv", sum("cv").over(wLocal))
      .withColumn("lnn", sum("cnn").over(wLocal))
    // chunk-total stitch over the union's OWN key set (a probe chunk
    // with no real rows still needs its prefix offset)
    val wChunks = Window.partitionBy("o_user").orderBy("o_chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = tagged.groupBy(
        col("user_id").as("o_user"), col("chunk").as("o_chunk"))
      .agg(sum("cn").as("tn"), sum("cv").as("tv"), sum("cnn").as("tnn"))
      .select(col("o_user"), col("o_chunk"),
        coalesce(sum("tn").over(wChunks), lit(0L)).as("on"),
        sum("tv").over(wChunks).as("ov"),
        coalesce(sum("tnn").over(wChunks), lit(0L)).as("onn"))
    // conditional negation, not sign multiplication: a bigint × wide
    // decimal product would exceed Spark's 38-digit precision cap
    def signed(c: org.apache.spark.sql.Column) =
      when(col("is_probe") === 0, c).otherwise(-c)
    local
      // user_id is null-safe (a null user is a real window partition);
      // chunk is non-null by the us-split above
      .join(broadcast(offsets), col("user_id") <=> col("o_user") &&
        col("chunk") === col("o_chunk"))
      .withColumn("gn", col("ln") + col("on"))
      .withColumn("gv", coalesce(col("lv"), lit(0).cast(DecimalType(18, 2)))
        + coalesce(col("ov"), lit(0).cast(DecimalType(18, 2))))
      .withColumn("gnn", col("lnn") + col("onn"))
      .groupBy("event_id", "user_id")
      .agg(sum(signed(col("gn"))).as("n_trailing_hour"),
        sum(signed(col("gv"))).as("dv"),
        sum(signed(col("gnn"))).as("dnn"))
      .select(col("event_id"), col("user_id"), col("n_trailing_hour"),
        when(col("dnn") > 0, col("dv")).cast("double")
          .as("v_trailing_hour"))
      .unionByName(nullOut)
      .orderBy("event_id")
  }

  def windowRangeFramePrefix(spark: SparkSession, dir: String,
      chunkHours: Int = 24): DataFrame =
    windowRangeFramePrefixEvents(
      load(spark, dir, "events").filter(col("event_id") % 17 === 0),
      chunkHours)

  /** The SQL-TEXT sliding RANGE frame: the exact `RANGE BETWEEN n
    * PRECEDING AND CURRENT ROW` idiom a SQL user writes, run through
    * `spark.sql` — which [[graft.plans.PrefixFrameRewriteRule]]
    * rewrites into the prefix-difference shape (the `WHERE us IS NOT
    * NULL` inside the query is what licenses the rewrite: the rule
    * requires the order key provably non-null). Differentially gated
    * against the same-text DuckDB oracle, so the rewrite's
    * bit-identity claim is load-bearing, not spec-only. */
  def windowRangeFrameSql(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.synchronized {
      // only the events view: partial replicas (skew probes) carry no
      // TPC-H tables, and the query reads nothing else
      load(spark, dir, "events").createOrReplaceTempView("events")
      spark.sql(
        """SELECT event_id, user_id,
          |count(*) OVER w AS n_trailing_hour,
          |CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
          |  AS v_trailing_hour
          |FROM (SELECT event_id, user_id, value,
          |        unix_micros(CAST(ts AS TIMESTAMP)) AS us
          |      FROM events WHERE event_id % 17 = 0) t
          |WHERE us IS NOT NULL
          |WINDOW w AS (PARTITION BY user_id ORDER BY us
          |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
          |ORDER BY event_id""".stripMargin)
    }

  private val windowRangeFrameOracle: String =
    """SELECT event_id, user_id,
      |count(*) OVER w AS n_trailing_hour,
      |CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_trailing_hour
      |FROM (SELECT event_id, user_id, value, epoch_us(ts) AS us FROM events
      |      WHERE event_id % 17 = 0) t
      |WINDOW w AS (PARTITION BY user_id ORDER BY us
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Ordered distinct string aggregation (deterministic collect):
    * alphabetical comma-join of each user's event types. An all-null
    * group yields NULL, matching SQL string_agg (collect_set drops
    * nulls, so empty set = no non-null values). */
  def aggStringAgg(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .groupBy("user_id")
      .agg(array_sort(collect_set(col("event_type"))).as("arr"),
        count(lit(1)).as("n"))
      .select(col("user_id"),
        when(size(col("arr")) === 0, lit(null).cast("string"))
          .otherwise(array_join(col("arr"), ",")).as("types"),
        col("n"))
      .orderBy("user_id")

  /** Datetime part extraction (fields with identical cross-engine
    * definitions; day-of-week normalized to ISO 1=Monday..7=Sunday). */
  def fnDatetimeParts(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders").filter(col("o_orderkey") % 101 === 0)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        hour(col("o_orderdate")).as("h"),
        ((dayofweek(col("o_orderdate")) + 5) % 7 + 1).as("iso_dow"),
        last_day(col("o_orderdate")).cast("date").as("month_end"),
        add_months(col("o_orderdate").cast("date"), 2).as("plus2m"))
      .orderBy("o_orderkey")

  /** Conditional / null-handling functions over nullable-by-construction
    * inputs. */
  def fnConditionals(spark: SparkSession, dir: String): DataFrame = {
    val o = load(spark, dir, "orders").filter(col("o_orderkey") % 101 === 0)
      .withColumn("a", when(col("o_orderkey") % 3 === 0, col("o_totalprice")))
      .withColumn("b", when(col("o_orderkey") % 2 === 0, col("o_totalprice") * 2))
    o.select(col("o_orderkey"),
        coalesce(col("a"), col("b"), lit(-1.0)).as("c1"),
        nullif(col("o_orderstatus"), lit("O")).as("c2"),
        greatest(col("a"), col("b")).as("c3"),
        least(col("a"), col("b")).as("c4"),
        when(col("a").isNotNull, lit("dated")).otherwise(lit("undated")).as("c5"))
      .orderBy("o_orderkey")
  }

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q_window_range_frame", windowRangeFrame,
      Some(windowRangeFrameOracle),
      "window/range-frame (DEFAULT = prefix-difference O(n) path)"),
    QuerySpec("q_window_range_frame_plain", windowRangeFramePlain,
      Some(windowRangeFrameOracle),
      "window/range-frame (naive sliding frame, retained baseline)"),
    QuerySpec("q_window_range_frame_sql", windowRangeFrameSql, Some(
      """SELECT event_id, user_id,
        |count(*) OVER w AS n_trailing_hour,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |  AS v_trailing_hour
        |FROM (SELECT event_id, user_id, value, epoch_us(ts) AS us
        |      FROM events WHERE event_id % 17 = 0) t
        |WHERE us IS NOT NULL
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin),
      "window/range-frame (SQL text -> PrefixFrameRewriteRule)"),
    QuerySpec("q_window_range_frame_chunked",
      (s: SparkSession, d: String) => windowRangeFrameChunked(s, d),
      Some(windowRangeFrameOracle),
      "window/range-frame (time-chunk halo rows, mega-user-safe)"),
    QuerySpec("q_window_range_frame_prefix",
      (s: SparkSession, d: String) => windowRangeFramePrefix(s, d),
      Some(windowRangeFrameOracle),
      "window/range-frame (prefix-difference, O(n) work-optimal)"),
    QuerySpec("q_agg_string_agg", aggStringAgg, Some(
      """SELECT user_id,
        |string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
        |count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      "agg/string-agg"),
    QuerySpec("q_fn_datetime_parts", fnDatetimeParts, Some(
      """SELECT o_orderkey,
        |CAST(year(o_orderdate) AS INT) AS y, CAST(quarter(o_orderdate) AS INT) AS q,
        |CAST(month(o_orderdate) AS INT) AS m, CAST(day(o_orderdate) AS INT) AS d,
        |CAST(hour(o_orderdate) AS INT) AS h,
        |CAST(isodow(o_orderdate) AS INT) AS iso_dow,
        |CAST(last_day(o_orderdate) AS DATE) AS month_end,
        |CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m
        |FROM orders WHERE o_orderkey % 101 = 0
        |ORDER BY o_orderkey""".stripMargin), "fn/datetime-parts"),
    QuerySpec("q_fn_conditionals", fnConditionals, Some(
      """WITH t AS (SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice END AS a,
        |  CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 2 END AS b
        |  FROM orders WHERE o_orderkey % 101 = 0)
        |SELECT o_orderkey, coalesce(a, b, -1.0) AS c1,
        |nullif(o_orderstatus, 'O') AS c2,
        |greatest(a, b) AS c3, least(a, b) AS c4,
        |CASE WHEN a IS NOT NULL THEN 'dated' ELSE 'undated' END AS c5
        |FROM t ORDER BY o_orderkey""".stripMargin), "fn/conditionals"),
    QuerySpec("q_join_outer", joinOuter, Some(
      """SELECT c_nationkey, count(o_orderkey) AS n_orders, count(*) AS n_rows,
        |CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_childless
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin), "join/outer"),
    QuerySpec("q_set_except", setExcept, Some(
      """SELECT c_custkey AS k FROM customer
        |EXCEPT SELECT o_custkey AS k FROM orders
        |WHERE o_orderdate >= DATE '2001-01-01' ORDER BY k""".stripMargin),
      "set/except"),
    QuerySpec("q_set_intersect", setIntersect, Some(
      """SELECT l_partkey AS k FROM lineitem WHERE l_orderkey % 2 = 0
        |INTERSECT SELECT l_partkey AS k FROM lineitem WHERE l_orderkey % 2 = 1
        |ORDER BY k""".stripMargin), "set/intersect"),
    QuerySpec("q_agg_rollup", aggRollup, Some(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |CAST(GROUPING(l_linestatus) AS INT) AS g_ls
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
      "agg/rollup"),
    QuerySpec("q_agg_cube", aggCube, Some(
      """SELECT substr(o_orderpriority, 1, 1) AS pri, o_orderstatus, count(*) AS n,
        |CAST(GROUPING(substr(o_orderpriority, 1, 1)) AS INT) AS g_p,
        |CAST(GROUPING(o_orderstatus) AS INT) AS g_s
        |FROM orders GROUP BY CUBE(substr(o_orderpriority, 1, 1), o_orderstatus)
        |ORDER BY g_p, g_s, pri NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin),
      "agg/cube"),
    QuerySpec("q_histogram", histogram, Some(
      """WITH c AS (SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |b AS (SELECT min(cents) AS lo, max(cents) AS hi FROM c)
        |SELECT l_returnflag,
        |  CAST((cents - lo) * 10 // (hi - lo + 1) AS INT) AS bucket,
        |  count(*) AS n
        |FROM c, b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      "datacard/equi-width-histogram"),
    QuerySpec("q_agg_grouping_sets", aggGroupingSets, Some(
      """SELECT substr(o_orderpriority, 1, 1) AS pri, o_orderstatus,
        |count(*) AS n,
        |CAST(GROUPING(substr(o_orderpriority, 1, 1)) AS INT) AS g_p,
        |CAST(GROUPING(o_orderstatus) AS INT) AS g_s
        |FROM orders GROUP BY GROUPING SETS (
        |  (substr(o_orderpriority, 1, 1), o_orderstatus),
        |  (substr(o_orderpriority, 1, 1)), (o_orderstatus))
        |ORDER BY g_p, g_s, pri NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin),
      "agg/grouping-sets"),
    QuerySpec("q_set_ops_all", setOpsAll, Some(
      """WITH e AS (SELECT l_partkey AS k FROM lineitem WHERE l_orderkey % 2 = 0),
        |o AS (SELECT l_partkey AS k FROM lineitem WHERE l_orderkey % 2 = 1),
        |ec AS (SELECT k, count(*) AS c FROM e GROUP BY 1),
        |oc AS (SELECT k, count(*) AS c FROM o GROUP BY 1),
        |j AS (SELECT coalesce(ec.k, oc.k) AS k,
        |    coalesce(ec.c, 0) AS ce, coalesce(oc.c, 0) AS co
        |  FROM ec FULL OUTER JOIN oc ON ec.k = oc.k)
        |SELECT k, greatest(ce - co, 0) AS n_except,
        |  least(ce, co) AS n_intersect
        |FROM j WHERE greatest(ce - co, 0) > 0 OR least(ce, co) > 0
        |ORDER BY k""".stripMargin), "setops/except-intersect-all"),
    QuerySpec("q_agg_percentiles", aggPercentiles, Some(
      """SELECT l_returnflag,
        |quantile_cont(l_quantity, 0.25) AS p25,
        |quantile_cont(l_quantity, 0.5) AS p50,
        |quantile_cont(l_quantity, 0.75) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      "agg/percentile"),
    QuerySpec("q_unpivot", unpivotMelt, Some(
      """SELECT l_returnflag, CAST(l_linenumber AS VARCHAR) AS member,
        |count(*) AS cnt FROM lineitem
        |WHERE l_linenumber BETWEEN 1 AND 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin), "A8-inverse/unpivot"),
    QuerySpec("q_window_ranks", windowRanks, Some(
      """SELECT o_orderpriority, o_orderkey,
        |rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |percent_rank() OVER w AS prnk,
        |CAST(ntile(4) OVER w AS INT) AS quartile, cume_dist() OVER w AS cd
        |FROM orders WHERE o_orderkey % 97 = 0
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_orderpriority, rnk""".stripMargin), "window/ranks"),
    QuerySpec("q_sessionize", sessionize, Some(sessionizeOracle),
      "window/sessionize"),
    QuerySpec("q_sessionize_chunked", sessionizeChunked,
      Some(sessionizeOracle),
      "window/sessionize-chunk-and-stitch (mega-user skew mitigation)"),
    QuerySpec("q_funnel", funnel, Some(
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |v AS (SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
        |  JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
        |  JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
        |SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
        |  CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
        |       WHEN c.user_id IS NOT NULL THEN 2
        |       WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage
        |FROM u LEFT JOIN v ON v.user_id = u.user_id
        |       LEFT JOIN c ON c.user_id = u.user_id
        |       LEFT JOIN p ON p.user_id = u.user_id
        |ORDER BY u.user_id""".stripMargin), "olap/ordered-funnel"),
    QuerySpec("q_cohort_retention", cohortRetention,
      Some(cohortRetentionOracle), "olap/cohort-retention"),
    QuerySpec("q_join_salted", joinSalted, Some(
      """SELECT p_brand, count(*) AS n,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin), "skew/salted-join"),
    QuerySpec("q_fn_strings", fnStrings, Some(
      """SELECT n_nationkey,
        |levenshtein(n_name, 'UNITED STATES') AS lev,
        |translate(n_name, 'AEIOU', 'aeiou') AS tr,
        |regexp_replace(n_name, '[^A-Z]', '_', 'g') AS re,
        |lpad(n_name, 20, '.') AS pad,
        |reverse(n_name) AS rev
        |FROM nation ORDER BY n_nationkey""".stripMargin), "fn/strings"),
  )
}
