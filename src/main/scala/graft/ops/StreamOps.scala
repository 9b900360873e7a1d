package graft.ops

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Store
import graft.schema.Schemas
import graft.streaming.StreamingIngest

/** End-to-end DIFFERENTIAL gates for the streaming ingest path (SURVEY
  * §2.8 T1/T2/T5/T7 + §3 E1/E2 made continuous): the generated deck
  * fixtures are written as REAL files in a landing directory, the
  * Structured Streaming jobs ([[StreamingIngest.bdeckStream]] /
  * [[StreamingIngest.adeckStream]]) ingest them through foreachBatch into
  * a parquet [[Store]], and the FINAL TABLES are diffed against a DuckDB
  * batch replay of the same lines — upgrading the streaming semantics
  * from stream-vs-batch equivalence specs to CORRECTNESS rows.
  *
  * What each gate proves:
  *  - q_stream_storms: b-deck file-source ingest (T1) → storm summaries →
  *    entity resolution → status stamp vs a fixed event-time "now".
  *  - q_stream_adeck_e2e: the E1→E2 chain — a-deck ingest gated by the
  *    model allowlist (P2), steps semi-joined to the stream-resolved
  *    storms, natural-key MERGE, run-lineage stamp (T7) — after a FULL
  *    REPLAY with a fresh checkpoint, so the diff also proves replay
  *    idempotence (T5) including NULL-hour key rows (negative lead
  *    times), which plain-equality merges would duplicate.
  *  - q_stream_late: the 48 h late-data recency gate (T2) — only
  *    forecasts within the watermark of "now" land.
  *
  * The landing-dir construction and stream execution are FIXTURE PREP,
  * memoized per (session, dir) like the ref-track store: the timed gates
  * read the resulting parquet tables. The driver-side per-file write is
  * inherent to the contract under test (file NAMES carry storm identity)
  * and bounded by the ~MB deck fixture.
  */
object StreamOps {

  /** Fixed event-time "now": inside the fixture's datetime range at EVERY
    * gate scale (sf0.01 spans 2020-06-01..2020-09-02, sf0.1 through
    * 2022-12) so the T2 recency slice both DROPS and KEEPS real rows.
    * Built from an Instant, not a local-time string — run_id embeds
    * `now.toInstant`, which must be the same literal in the oracle
    * regardless of JVM zone. */
  private val now = Timestamp.from(Instant.parse("2020-08-01T00:00:00Z"))

  /** P2 model allowlist: drops HWRF (~25% of fixture lines) so the gate
    * exercises a REAL filter, not a pass-through. */
  private val allowedModels = Seq("AVNO", "GFSO", "OFCL")

  private val adeckRunId = s"ADECK__${now.toInstant}"

  /** Write generated (file, value) deck lines as real files. Driver-side
    * by necessity — the file source under test derives storm identity
    * from file NAMES — and fixture-prep only (never on a timed path). */
  private def writeLanding(lines: DataFrame, dirPath: String): Unit = {
    val dir = java.nio.file.Paths.get(dirPath)
    java.nio.file.Files.createDirectories(dir)
    lines.select("file", "value").collect()
      .groupBy(_.getString(0))
      .foreach { case (name, rows) =>
        java.nio.file.Files.write(dir.resolve(name),
          rows.map(_.getString(1)).mkString("", "\n", "\n").getBytes("UTF-8"))
      }
  }

  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (Store, Store)]

  /** Build landing dirs, run the streams, return (main store, T2 store). */
  private def stores(spark: SparkSession, dir: String): (Store, Store) =
    cache.getOrElseUpdate((spark, dir), {
      val base = SourceSinkOps.tmp("stream", dir)
      // clean slate: a partially-built fixture (stale stream checkpoints
      // from an interrupted attempt) must not leak into this build
      graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
      val bLanding = s"$base/landing_b"
      val aLanding = s"$base/landing_a"
      writeLanding(ParseOps.bdeckLines(spark, dir), bLanding)
      writeLanding(ParseOps.adeckLines(spark, dir), aLanding)
      val s1 = new Store(spark, s"$base/store1")
      StreamingIngest.bdeckStream(spark, bLanding, s1, s"$base/ck_b1",
        () => now).awaitTermination()
      StreamingIngest.adeckStream(spark, aLanding, s1, s"$base/ck_a1",
        () => now, allowedModels, recencyHours = None).awaitTermination()
      // T5: a FULL second pass with a fresh checkpoint re-processes every
      // file; the natural-key MERGEs must leave the store byte-identical
      // (the oracle replays a single pass).
      StreamingIngest.adeckStream(spark, aLanding, s1, s"$base/ck_a2",
        () => now, allowedModels, recencyHours = None).awaitTermination()
      // T2: the 48 h recency gate into a separate store seeded with the
      // same resolved storms.
      val s2 = new Store(spark, s"$base/store2")
      s2.write("storms", s1.read("storms", Schemas.storms))
      StreamingIngest.adeckStream(spark, aLanding, s2, s"$base/ck_a3",
        () => now, allowedModels, recencyHours = Some(48)).awaitTermination()
      (s1, s2)
    })

  private def stepsProjection(store: Store): DataFrame =
    store.read("steps", Schemas.steps)
      .select(col("nhc_id"), col("model"), col("datetime_utc"), col("hour"),
        col("latitude"), col("longitude"), col("intensity_kts"),
        col("mslp_mb"), col("run_id"))
      .orderBy("nhc_id", "model", "datetime_utc", "hour")

  def streamStorms(spark: SparkSession, dir: String): DataFrame =
    stores(spark, dir)._1.read("storms", Schemas.storms)
      .select(col("region"), col("nhc_number"), col("nhc_id"), col("season"),
        col("start_date"), col("end_date"), col("status"), col("name"),
        col("start_lat"), col("start_lon"))
      .orderBy("nhc_id")

  def streamAdeckE2e(spark: SparkSession, dir: String): DataFrame =
    stepsProjection(stores(spark, dir)._1)

  def streamLate(spark: SparkSession, dir: String): DataFrame =
    stepsProjection(stores(spark, dir)._2)

  // ------------------------------------------------------------- oracles

  private val nowSql = "TIMESTAMP '2020-08-01 00:00:00'"

  /** Storms replay: the (green) summaries oracle as a nested scope, plus
    * the 16 h Active/Archive status stamp (process_storms.py:205-208).
    * annual_id / run_id / last_update are resolver-assignment audit
    * columns gated by q_agg_next_id + StormResolverSpec, not here.
    *
    * NOTE: stripMargin is applied to the TEMPLATE lines before the inner
    * oracles interpolate — the embedded SQL contains `||` concat
    * operators at line starts, which a post-interpolation stripMargin
    * would truncate to `|`. */
  private val streamStormsOracle: String = Seq(
    "SELECT region, nhc_number, nhc_id, season, start_date, end_date,",
    s"  CASE WHEN epoch($nowSql) - epoch(end_date) <= 16*3600",
    "    THEN 'Active' ELSE 'Archive' END AS status,",
    "  name, start_lat, start_lon",
    s"FROM ( ${ParseOps.stormSummariesOracle} ) s",
    "ORDER BY nhc_id").mkString("\n")

  /** Steps-table replay: a-deck vsteps (shared CTE) filtered by the model
    * allowlist, semi-joined to the b-deck storm-id set (nested scope —
    * the two fixtures' CTE names collide, and SQL WITH scoping shadows
    * cleanly), stamped with the deterministic run id. */
  private def stepsOracle(recencyFilter: String): String = {
    val allow = allowedModels.map(m => s"'$m'").mkString(", ")
    Seq(
      s"${ParseOps.adeckStepsCte},",
      "ash AS (SELECT",
      "    upper(region || lpad(CAST(nhc_number AS VARCHAR),2,'0') ||",
      "      CAST(season AS VARCHAR)) AS nhc_id,",
      "    model, datetime_utc, hour, latitude, longitude,",
      "    intensity_kts, mslp_mb",
      s"  FROM vsteps WHERE model IN ($allow) $recencyFilter),",
      "bn AS (SELECT DISTINCT nhc_id FROM",
      s"  ( ${ParseOps.stormSummariesOracle} ) s)",
      "SELECT a.nhc_id, a.model, a.datetime_utc, a.hour, a.latitude,",
      "  a.longitude, a.intensity_kts, a.mslp_mb,",
      s"  '$adeckRunId' AS run_id",
      "FROM ash a JOIN bn USING (nhc_id)",
      "ORDER BY nhc_id, model, datetime_utc, hour").mkString("\n")
  }

  private val streamAdeckOracle = stepsOracle("")

  private val streamLateOracle = stepsOracle(
    s"AND epoch($nowSql) - epoch(datetime_utc) <= 48*3600")

  /** Spark's BUILT-IN streaming dedup (`dropDuplicatesWithinWatermark`)
    * — the watermark-state-scoped semantics users reach for before the
    * index-backed [[graft.streaming.StreamingDedup]] paths: events
    * arrive as two mtime-ordered micro-batches, the second RE-SENDS a
    * quarter of the first (exact copies — at-least-once delivery), and
    * the keyed state dedups them. The watermark delay (3650 days)
    * exceeds the fixture's whole event-time span, so no row is late and
    * state never expires → the output is exactly one row per event_id,
    * which is what the oracle asserts. At 100 TB the state store is
    * bounded by keys-within-watermark — the delay IS the memory knob. */
  private val ddCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  def streamDropDuplicates(spark: SparkSession, dir: String): DataFrame = {
    val out = ddCache.synchronized {
      ddCache.getOrElseUpdate((spark, dir), {
        val base = SourceSinkOps.tmp("streamdd", dir)
        graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
        // watermarks require TIMESTAMP (LTZ); session tz is UTC, so the
        // NTZ→LTZ cast here and the inverse on read-back are lossless
        val ev = graft.Tables.load(spark, dir, "events")
          .select(col("event_id"), col("user_id"),
            col("ts").cast("timestamp").as("ts"), col("event_type"))
        val landing = s"$base/landing"
        new java.io.File(landing).mkdirs()
        def writeBatchFile(df: DataFrame, name: String, mtime: Long): Unit = {
          val tmpd = s"$base/tmp_$name"
          df.coalesce(1).write.mode("overwrite").parquet(tmpd)
          val part = new java.io.File(tmpd).listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          val dst = new java.io.File(s"$landing/$name")
          java.nio.file.Files.move(part.toPath, dst.toPath)
          require(dst.setLastModified(mtime),
            s"could not pin mtime on $dst — batch order would be undefined")
        }
        val t0 = 1700000000000L
        writeBatchFile(ev.filter(col("event_id") % 2 === 0), "b0.parquet", t0)
        writeBatchFile(ev.filter(col("event_id") % 2 === 1)
            .unionAll(ev.filter(col("event_id") % 4 === 0)),
          "b1.parquet", t0 + 3600000L)
        val q = spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(landing)
          .withWatermark("ts", "3650 days")
          .dropDuplicatesWithinWatermark("event_id")
          .writeStream
          .format("parquet")
          .option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ck")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s"$base/out"
      })
    }
    spark.read.parquet(out)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .orderBy("event_id")
  }

  /** STREAM-STREAM inner join — the hardest streaming semantic Spark
    * offers (both sides buffer keyed state; the event-time range
    * condition plus watermarks bound how long): clicks and purchases
    * arrive as two independent file streams, joined on user_id with
    * purchases within 7 days AFTER the click. The watermark delay
    * exceeds the fixture span so no state is evicted mid-run and the
    * append output equals the batch join exactly — which is what the
    * oracle replays. At 100 TB the delay IS the state bound: state per
    * side ≈ rate × (delay + range). */
  private val ssjCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  def streamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val out = ssjCache.synchronized {
      ssjCache.getOrElseUpdate((spark, dir), {
        val base = SourceSinkOps.tmp("ssj", dir)
        graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
        val ev = graft.Tables.load(spark, dir, "events")
          .select(col("event_id"), col("user_id"),
            col("ts").cast("timestamp").as("ts"), col("event_type"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts").as("c_ts"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("user_id").as("b_user"), col("ts").as("p_ts"))
        clicks.coalesce(1).write.parquet(s"$base/clicks")
        buys.coalesce(1).write.parquet(s"$base/buys")
        val cs = spark.readStream.schema(clicks.schema)
          .parquet(s"$base/clicks")
          .withWatermark("c_ts", "3650 days")
        val bs = spark.readStream.schema(buys.schema)
          .parquet(s"$base/buys")
          .withWatermark("p_ts", "3650 days")
        val q = intervalJoinPairs(cs, bs)
          .writeStream.format("parquet")
          .option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ck")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s"$base/out"
      })
    }
    spark.read.parquet(out).orderBy("click_id", "purchase_id")
  }

  /** The gate's join expression, shared with the chunked sibling and
    * its equality spec: purchases within 7 days AFTER the click, keyed
    * by user. */
  private[ops] def intervalJoinPairs(cs: DataFrame,
      bs: DataFrame): DataFrame =
    cs.join(bs,
        col("user_id") === col("b_user")
          && col("p_ts") >= col("c_ts")
          && col("p_ts") <= col("c_ts") + expr("interval 7 days"))
      .select("click_id", "purchase_id", "user_id")

  /** CHUNK-KEYED form of [[intervalJoinPairs]] — identical pairs, but
    * the equi-key gains a coarse time chunk (width = the 7-day range):
    * clicks explode to their chunk and the next (a purchase inside
    * [c_ts, c_ts+7d] lands in exactly ONE of the two, so no pair is
    * duplicated or lost), purchases carry their own chunk. Spark keys
    * stream-stream join state by the equality keys, so a mega user's
    * state rows spread over (user, chunk) groups and each input row
    * scans only its two chunks' occupancy — instead of the symmetric
    * hash join's per-key full-state scan, which the round-18 wave-5b
    * probe measured QUADRATIC in the hot key's share (420 s vs 13 s
    * uniform at identical 100k-row volume, µs/output-row 2.44× when
    * the mega shape doubles). Epochs are assumed non-negative (integer
    * DIV truncation = floor; the events fixture is 2024+). */
  private[ops] def intervalJoinPairsChunked(cs: DataFrame,
      bs: DataFrame): DataFrame = {
    val c = cs.withColumn("k",
      explode(array(expr("unix_seconds(c_ts) DIV 604800"),
        expr("unix_seconds(c_ts) DIV 604800 + 1L"))))
    val b = bs.withColumn("bk", expr("unix_seconds(p_ts) DIV 604800"))
    c.join(b,
        col("user_id") === col("b_user") && col("k") === col("bk")
          && col("p_ts") >= col("c_ts")
          && col("p_ts") <= col("c_ts") + expr("interval 7 days"))
      .select("click_id", "purchase_id", "user_id")
  }

  /** STREAM-STREAM interval join with CHUNK-KEYED state — the
    * mega-key-safe sibling of [[streamStreamJoin]] (same oracle, same
    * rows). Wave-5b (round 18, `graft.tools.StreamJoinSkewProbe`)
    * measured the plain form's per-key state scan quadratic in the hot
    * key's share: each input row of a key scans ALL of that key's
    * state rows (Spark's symmetric hash join keeps an unindexed list
    * per key), so one mega user concentrating both sides makes every
    * micro-batch O(input_k × state_k) in ONE task. Adding the time
    * chunk to the join key bounds each scan by two chunks' occupancy —
    * the keyed-streaming analogue of the batch chunk-and-stitch
    * taxonomy (sessionizeChunkedEvents, windowRangeFramePrefixEvents). */
  private val ssjcCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  def streamStreamJoinChunked(spark: SparkSession, dir: String): DataFrame = {
    val out = ssjcCache.synchronized {
      ssjcCache.getOrElseUpdate((spark, dir), {
        val base = SourceSinkOps.tmp("ssjc", dir)
        graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
        val ev = graft.Tables.load(spark, dir, "events")
          .select(col("event_id"), col("user_id"),
            col("ts").cast("timestamp").as("ts"), col("event_type"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts").as("c_ts"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("user_id").as("b_user"), col("ts").as("p_ts"))
        clicks.coalesce(1).write.parquet(s"$base/clicks")
        buys.coalesce(1).write.parquet(s"$base/buys")
        val cs = spark.readStream.schema(clicks.schema)
          .parquet(s"$base/clicks")
          .withWatermark("c_ts", "3650 days")
        val bs = spark.readStream.schema(buys.schema)
          .parquet(s"$base/buys")
          .withWatermark("p_ts", "3650 days")
        val q = intervalJoinPairsChunked(cs, bs)
          .writeStream.format("parquet")
          .option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ck")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s"$base/out"
      })
    }
    spark.read.parquet(out).orderBy("click_id", "purchase_id")
  }

  /** STREAM-STREAM LEFT OUTER join — the semantic the inner join above
    * cannot express: a click with NO purchase inside its 7-day window
    * must still emit (with a null purchase), but only once the
    * watermark PROVES no matching purchase can ever arrive — the
    * abandoned-cart / unattributed-conversion shape. State on both
    * sides is bounded by delay + range, and the null-extended rows are
    * the watermark's certificates.
    *
    * Determinism protocol (the q_stream_session_append playbook): the
    * delay exceeds the fixture's whole event-time span, so during the
    * data run nothing drops and no null-extended row can emit (matched
    * pairs emit as they join — exact either way); a sentinel run
    * advances BOTH streams' watermarks (the join watermark is their
    * min) past every click's window-close, flushing every unmatched
    * click exactly once; a final LATE click inside the real range must
    * be dropped by the advanced watermark. Sentinels use distinct
    * users and a 100-day separation so they can never match each
    * other, and their own rows never finalize (nothing follows them).
    * The differential pins all three: every unmatched click present
    * with a null purchase, no user -1/-3 row, no user -2 row. */
  private val ssojCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  def streamStreamJoinOuter(spark: SparkSession, dir: String): DataFrame = {
    val out = ssojCache.synchronized {
      ssojCache.getOrElseUpdate((spark, dir), {
        val base = SourceSinkOps.tmp("ssoj", dir)
        graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
        val ev = graft.Tables.load(spark, dir, "events")
          .select(col("event_id"), col("user_id"),
            col("ts").cast("timestamp").as("ts"), col("event_type"))
        val mm = ev.agg(min("ts").as("lo"), max("ts").as("hi")).collect()(0)
        val (lo, hi) = (mm.getTimestamp(0), mm.getTimestamp(1))
        val spanDays = (hi.getTime - lo.getTime) / 86400000L + 2
        val delay = s"$spanDays days"
        val clicksDir = s"$base/clicks"; val buysDir = s"$base/buys"
        def clicksOf(df: DataFrame) = df.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts").as("c_ts"))
        def buysOf(df: DataFrame) = df.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("user_id").as("b_user"), col("ts").as("p_ts"))
        clicksOf(ev).coalesce(1).write.parquet(clicksDir)
        buysOf(ev).coalesce(1).write.parquet(buysDir)
        def run(): Unit = {
          val cs = spark.readStream.schema(clicksOf(ev).schema)
            .parquet(clicksDir).withWatermark("c_ts", delay)
          val bs = spark.readStream.schema(buysOf(ev).schema)
            .parquet(buysDir).withWatermark("p_ts", delay)
          cs.join(bs,
              col("user_id") === col("b_user")
                && col("p_ts") >= col("c_ts")
                && col("p_ts") <= col("c_ts") + expr("interval 7 days"),
              "leftOuter")
            .select("click_id", "user_id", "purchase_id")
            .writeStream.format("parquet")
            .option("path", s"$base/out")
            .option("checkpointLocation", s"$base/ck")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start().awaitTermination()
        }
        run() // data run: matches emit; no null-extension can finalize
        import spark.implicits._
        val sentC = new java.sql.Timestamp(
          hi.getTime + (spanDays + 8) * 86400000L)
        val sentP = new java.sql.Timestamp(sentC.getTime + 100 * 86400000L)
        Seq((-1L, -1L, sentC)).toDF("click_id", "user_id", "c_ts")
          .coalesce(1).write.mode("append").parquet(clicksDir)
        Seq((-3L, -3L, sentP)).toDF("purchase_id", "b_user", "p_ts")
          .coalesce(1).write.mode("append").parquet(buysDir)
        run() // flush run: min-watermark passes every click's window
        Seq((-2L, -2L, new java.sql.Timestamp(
            (lo.getTime + hi.getTime) / 2)))
          .toDF("click_id", "user_id", "c_ts")
          .coalesce(1).write.mode("append").parquet(clicksDir)
        run() // late run: the -2 click is behind the watermark — dropped
        s"$base/out"
      })
    }
    spark.read.parquet(out).orderBy("click_id", "purchase_id")
  }

  private val streamStreamJoinOuterOracle: String =
    """SELECT c.event_id AS click_id, c.user_id, b.event_id AS purchase_id
      |FROM events c LEFT JOIN events b ON b.user_id = c.user_id
      |  AND b.event_type = 'purchase'
      |  AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 7 DAY
      |WHERE c.event_type = 'click'
      |ORDER BY click_id, purchase_id""".stripMargin

  /** Streaming SESSION windows ([[graft.streaming.StreamingIngest
    * .sessionStream]], the built-in `session_window` gap-merge): events
    * arrive as two mtime-ordered micro-batches split by event_id parity
    * — each user's session events are SPLIT ACROSS batches, so the
    * merging state (extend a live session, fuse two adjacent ones) is
    * genuinely exercised, not just replayed within one batch. Complete
    * output mode through foreachBatch-overwrite: the final state after
    * AvailableNow is every session, including the tail ones an
    * append-mode watermark would still be holding (at 100 TB you run
    * append + a real watermark and accept finalize-on-watermark; the
    * gate needs the exact total answer). Oracle: the batch gap rule —
    * session_window merges an exactly-at-gap event (pinned in
    * StreamingSessionSpec), matching the strict-> lag/cumsum
    * sessionization, with session_end = last event + gap. */
  private val ssessCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  def streamSession(spark: SparkSession, dir: String): DataFrame = {
    val out = ssessCache.synchronized {
      ssessCache.getOrElseUpdate((spark, dir), {
        val base = SourceSinkOps.tmp("ssess", dir)
        graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
        val ev = graft.Tables.load(spark, dir, "events")
          .select(col("event_id"), col("user_id"),
            col("ts").cast("timestamp").as("ts"))
        val landing = s"$base/landing"
        new java.io.File(landing).mkdirs()
        def writeBatchFile(df: DataFrame, name: String, mtime: Long): Unit = {
          val tmpd = s"$base/tmp_$name"
          df.coalesce(1).write.mode("overwrite").parquet(tmpd)
          val part = new java.io.File(tmpd).listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          val dst = new java.io.File(s"$landing/$name")
          java.nio.file.Files.move(part.toPath, dst.toPath)
          require(dst.setLastModified(mtime),
            s"could not pin mtime on $dst — batch order would be undefined")
        }
        val t0 = 1700000000000L
        writeBatchFile(ev.filter(col("event_id") % 2 === 0), "b0.parquet", t0)
        writeBatchFile(ev.filter(col("event_id") % 2 === 1), "b1.parquet",
          t0 + 3600000L)
        val src = spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(landing)
        val q = graft.streaming.StreamingIngest
          .sessionStream(src, "ts", "user_id",
            gap = "30 minutes", watermark = "3650 days")
          .writeStream
          .outputMode("complete")
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.write.mode("overwrite").parquet(s"$base/out"); ()
          }
          .option("checkpointLocation", s"$base/ck")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s"$base/out"
      })
    }
    spark.read.parquet(out)
      .select(col("user_id"),
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  /** APPEND-mode sessionization with a REAL watermark
    * ([[graft.streaming.StreamingSessions.appendSessionStream]]) — the
    * production shape [[streamSession]]'s complete-mode gate defers:
    * sessions are emitted exactly once, when the watermark PROVES them
    * closed, and keyed state is evicted as they close. Three runs on one
    * checkpoint make append-mode emission deterministic (the protocol is
    * documented on the streaming object): (1) the data run, with the
    * watermark delay sized past the fixture's whole event-time span so
    * nothing can drop or emit regardless of file batching; (2) a
    * sentinel event far enough ahead that the persisted watermark passes
    * every real session's close; (3) a LATE event inside the real range
    * that the advanced watermark must DROP. The differential then pins
    * all three semantics at once: every real session present exactly
    * once (flush), no user -1 row (the sentinel's own session never
    * finalizes), no user -2 contribution (late drop). `id_sum` is an
    * exact integer membership checksum per session. */
  private val sessApCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  def streamSessionAppend(spark: SparkSession, dir: String): DataFrame = {
    val out = sessApCache.synchronized {
      sessApCache.getOrElseUpdate((spark, dir), {
        val base = SourceSinkOps.tmp("ssessap", dir)
        graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
        val ev = graft.Tables.load(spark, dir, "events")
          .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
            col("user_id"))
        val landing = s"$base/landing"
        new java.io.File(landing).mkdirs()
        def writeBatchFile(df: DataFrame, name: String, mtime: Long): Unit = {
          val tmpd = s"$base/tmp_$name"
          df.coalesce(1).write.mode("overwrite").parquet(tmpd)
          val part = new java.io.File(tmpd).listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          val dst = new java.io.File(s"$landing/$name")
          java.nio.file.Files.move(part.toPath, dst.toPath)
          require(dst.setLastModified(mtime),
            s"could not pin mtime on $dst — batch order would be undefined")
        }
        val mm = ev.agg(min("ts").as("lo"), max("ts").as("hi")).collect()(0)
        val (lo, hi) = (mm.getTimestamp(0), mm.getTimestamp(1))
        val spanDays = (hi.getTime - lo.getTime) / 86400000L + 2
        val delay = s"$spanDays days"
        val t0 = 1700000000000L
        (0 to 3).foreach(i => writeBatchFile(
          ev.filter(col("event_id") % 4 === i), s"b$i.parquet",
          t0 + i * 3600000L))
        def run(): Unit = graft.streaming.StreamingSessions
          .appendSessionStream(spark, landing, s"$base/out", s"$base/ck",
            gapMinutes = 30, delay = delay).awaitTermination()
        run() // data run: watermark below every event — no emit, no drop
        import spark.implicits._
        val sentinelTs = new java.sql.Timestamp(
          hi.getTime + (spanDays + 1) * 86400000L)
        writeBatchFile(Seq((-1L, sentinelTs, -1L))
          .toDF("event_id", "ts", "user_id"), "b4.parquet", t0 + 4 * 3600000L)
        run() // flush run: watermark lands at hi + 1 day
        val lateTs = new java.sql.Timestamp((lo.getTime + hi.getTime) / 2)
        writeBatchFile(Seq((-2L, lateTs, -2L))
          .toDF("event_id", "ts", "user_id"), "b5.parquet", t0 + 5 * 3600000L)
        run() // late run: the -2 event is behind the watermark — dropped
        s"$base/out"
      })
    }
    spark.read.parquet(out)
      .select(col("user_id"),
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"),
        col("n_events"), col("id_sum"))
      .orderBy("user_id", "session_start")
  }

  private val streamSessionAppendOracle: String =
    """WITH g AS (SELECT user_id, ts, event_id,
      |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |s AS (SELECT user_id, ts, event_id,
      |  CASE WHEN prev_ts IS NULL
      |         OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      |  FROM g),
      |i AS (SELECT user_id, ts, event_id, CAST(SUM(new_session) OVER (
      |  PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM s)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events, CAST(sum(event_id) AS BIGINT) AS id_sum
      |FROM i GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  private val streamSessionOracle: String =
    """WITH g AS (SELECT user_id, ts, event_id,
      |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |s AS (SELECT user_id, ts, event_id,
      |  CASE WHEN prev_ts IS NULL
      |         OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      |  FROM g),
      |i AS (SELECT user_id, ts, CAST(SUM(new_session) OVER (
      |  PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM s)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events
      |FROM i GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  private val streamStreamJoinOracle: String =
    """SELECT c.event_id AS click_id, b.event_id AS purchase_id, c.user_id
      |FROM events c JOIN events b ON b.user_id = c.user_id
      |  AND c.event_type = 'click' AND b.event_type = 'purchase'
      |  AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 7 DAY
      |ORDER BY click_id, purchase_id""".stripMargin

  private val streamDropDuplicatesOracle: String =
    """SELECT event_id, user_id, ts, event_type FROM events
      |ORDER BY event_id""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q_stream_storms", streamStorms,
      Some(streamStormsOracle), "stream/T1-bdeck-e2e"),
    QuerySpec("q_stream_adeck_e2e", streamAdeckE2e,
      Some(streamAdeckOracle), "stream/T1-T5-T7-adeck-e2e"),
    QuerySpec("q_stream_late", streamLate,
      Some(streamLateOracle), "stream/T2-late-gate"),
    QuerySpec("q_stream_dropdup", streamDropDuplicates,
      Some(streamDropDuplicatesOracle), "stream/T5-dropdup-watermark"),
    QuerySpec("q_stream_join", streamStreamJoin,
      Some(streamStreamJoinOracle), "stream/stream-stream-join"),
    QuerySpec("q_stream_session", streamSession,
      Some(streamSessionOracle), "stream/session-window"),
    QuerySpec("q_stream_session_append", streamSessionAppend,
      Some(streamSessionAppendOracle), "stream/session-append-watermark"),
    QuerySpec("q_stream_join_outer", streamStreamJoinOuter,
      Some(streamStreamJoinOuterOracle), "stream/stream-stream-outer-join"),
    QuerySpec("q_stream_join_chunked", streamStreamJoinChunked,
      Some(streamStreamJoinOracle),
      "stream/stream-stream-join (chunk-keyed state, mega-key-safe)"),
  )
}
