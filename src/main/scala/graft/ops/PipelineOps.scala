package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables.load
import graft.merge.Merge

/** SURVEY.md §2.1/§2.8 pipeline semantics — upsert MERGE, cascading
  * delete, content-hash dedup, tumbling event-time cycles — expressed as
  * oracle-checkable batch queries over the test tables.
  */
object PipelineOps {

  /** S11/J4/F20/T5 — the upsert workhorse, driven by graft.merge.Merge.
    * "Existing" and "incoming" are deterministic slices of `orders`;
    * incoming rows win, new keys are inserted. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val o = load(spark, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val existing = o.filter(col("o_orderkey") % 3 === 0)
    val incoming = o.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    Merge.upsert(existing, incoming, Seq("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
      .orderBy("o_orderstatus")
  }

  /** T5 — idempotent re-run as a DIFFERENTIAL: the same incoming batch
    * MERGEd twice must equal the oracle's single application (natural-key
    * upserts are replay-safe — the reference's cron re-runs depend on
    * this, tcdb/pipeline/bdeck.py re-entry). Shares q_merge_upsert's
    * oracle SQL, which applies incoming exactly once. */
  def mergeIdempotent(spark: SparkSession, dir: String): DataFrame = {
    val o = load(spark, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val existing = o.filter(col("o_orderkey") % 3 === 0)
    val incoming = o.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    val once = Merge.upsert(existing, incoming, Seq("o_orderkey"))
    Merge.upsert(once, incoming, Seq("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
      .orderBy("o_orderstatus")
  }

  /** T6 — monotonic-update guard: updates that would regress the guarded
    * column are rejected (old-file protection,
    * tcdb/etl/process_storms.py:136-139). Incoming lowers the price, so
    * every matched update is rejected; only inserts land. */
  def mergeMonotonicGuard(spark: SparkSession, dir: String): DataFrame = {
    val o = load(spark, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val existing = o.filter(col("o_orderkey") % 3 === 0)
    val incoming = o.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") - 1000.0)
    Merge.upsert(existing, incoming, Seq("o_orderkey"),
        monotonicCol = Some("o_totalprice"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
      .orderBy("o_orderstatus")
  }

  /** S12 — cascading delete as an anti-join: drop lineitems of "deleted"
    * orders (tcdb/pipeline/routines.py:33-63). */
  def cascadeDelete(spark: SparkSession, dir: String): DataFrame = {
    val deleted = load(spark, dir, "orders").filter(col("o_orderstatus") === "F")
    val li = load(spark, dir, "lineitem")
    Merge.cascadeDelete(li, deleted, "l_orderkey", "o_orderkey")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n_left"))
      .orderBy("l_returnflag")
  }

  /** S13/O5 — content-hash dedup: sha2 over the payload, keep the first
    * row per hash (byte-identical file skip, tcdb/pipeline/fs_utils.py:10-56). */
  def dedupContentHash(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .withColumn("h", sha2(col("text"), 256))
      .groupBy("h")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  /** T8 — tumbling 6-hour event-time cycles via the streaming-compatible
    * window() function (00/06/12/18Z forecast cycles,
    * tcdb/pipeline/adeck.py:243-246). */
  def tumblingCycles(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .groupBy(window(col("ts"), "6 hours").getField("start").as("cycle"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("v"))
      .orderBy("cycle")

  /** T8 sliding form — HOPPING windows (size 12 h, slide 6 h): every
    * event lands in exactly size/slide = 2 overlapping windows, the
    * windowed-analytics shape tumbling can't express (a reading
    * contributes to every window covering it). Spark expands the
    * assignment map-side (no self-join); the oracle enumerates the two
    * covering window starts per row with the same epoch-anchored floor
    * arithmetic as the tumbling gate. */
  def hoppingWindows(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .groupBy(window(col("ts"), "12 hours", "6 hours")
        .getField("start").as("win_start"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("v"))
      .orderBy("win_start")

  /** T3 — stateful status transition as a batch rule: a user is "Archive"
    * when their last event is >24h before the global max ts, else "Active"
    * (tcdb/pipeline/routines.py:14-31). */
  def statusTransition(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
    val lastByUser = ev.groupBy("user_id").agg(max("ts").as("last_ts"))
    val maxTs = ev.agg(max("ts").as("max_ts"))
    lastByUser.crossJoin(broadcast(maxTs))
      .withColumn("status",
        when(col("last_ts") < col("max_ts") - expr("interval 24 hours"), "Archive")
          .otherwise("Active"))
      .select("user_id", "status")
      .orderBy("user_id")
  }

  /** Single-application upsert oracle — shared by q_merge_upsert and the
    * double-applied q_merge_idempotent (idempotence IS the shared SQL). */
  private val upsertOracle =
    """WITH existing AS (SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 3 = 0),
      |incoming AS (SELECT o_orderkey, 'U' AS o_orderstatus,
      |  o_totalprice + 1000.0 AS o_totalprice FROM orders WHERE o_orderkey % 2 = 0),
      |merged AS (SELECT
      |  CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_orderstatus ELSE e.o_orderstatus END AS o_orderstatus,
      |  CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_totalprice ELSE e.o_totalprice END AS o_totalprice
      |  FROM existing e FULL OUTER JOIN incoming i ON e.o_orderkey = i.o_orderkey)
      |SELECT o_orderstatus, count(*) AS n,
      |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q_merge_upsert", mergeUpsert, Some(upsertOracle), "S11/J4/F20/T5"),
    QuerySpec("q_merge_idempotent", mergeIdempotent, Some(upsertOracle), "T5"),
    QuerySpec("q_merge_monotonic_guard", mergeMonotonicGuard, Some(
      """WITH existing AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |incoming AS (SELECT o_orderkey, 'U' AS o_orderstatus,
        |  o_totalprice - 1000.0 AS o_totalprice FROM orders WHERE o_orderkey % 2 = 0),
        |merged AS (SELECT
        |  CASE WHEN i.o_orderkey IS NOT NULL
        |         AND (e.o_orderkey IS NULL OR e.o_totalprice IS NULL
        |              OR i.o_totalprice >= e.o_totalprice)
        |       THEN i.o_orderstatus ELSE e.o_orderstatus END AS o_orderstatus,
        |  CASE WHEN i.o_orderkey IS NOT NULL
        |         AND (e.o_orderkey IS NULL OR e.o_totalprice IS NULL
        |              OR i.o_totalprice >= e.o_totalprice)
        |       THEN i.o_totalprice ELSE e.o_totalprice END AS o_totalprice
        |  FROM existing e FULL OUTER JOIN incoming i ON e.o_orderkey = i.o_orderkey)
        |SELECT o_orderstatus, count(*) AS n,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin), "T6"),
    QuerySpec("q_cascade_delete", cascadeDelete, Some(
      """SELECT l_returnflag, count(*) AS n_left FROM lineitem
        |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin), "S12"),
    QuerySpec("q_dedup_content_hash", dedupContentHash, Some(
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY sha256(text) ORDER BY keep_id""".stripMargin), "S13/O5"),
    QuerySpec("q_tumbling_cycles", tumblingCycles, Some(
      """SELECT TIMESTAMP '1970-01-01 00:00:00' + INTERVAL 1 SECOND *
        |CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS cycle,
        |count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |FROM events GROUP BY 1 ORDER BY cycle""".stripMargin), "T8"),
    QuerySpec("q_window_hopping", hoppingWindows, Some(
      """SELECT TIMESTAMP '1970-01-01 00:00:00' + INTERVAL 1 SECOND *
        |CAST((floor(epoch(ts) / 21600) - k.k) * 21600 AS BIGINT) AS win_start,
        |count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |FROM events, (VALUES (0), (1)) k(k)
        |GROUP BY 1 ORDER BY win_start""".stripMargin), "T8-sliding"),
    QuerySpec("q_status_transition", statusTransition, Some(
      """WITH m AS (SELECT max(ts) AS max_ts FROM events),
        |l AS (SELECT user_id, max(ts) AS last_ts FROM events GROUP BY user_id)
        |SELECT user_id, CASE WHEN last_ts < max_ts - INTERVAL 24 HOUR
        |  THEN 'Archive' ELSE 'Active' END AS status
        |FROM l, m ORDER BY user_id""".stripMargin), "T3"),
  )
}
