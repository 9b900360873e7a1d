package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.datasets.Ensemble

/** DuckDB-differential gate for J7 track claiming (SURVEY.md §2.3) —
  * the reference's unclaimed-track → invest assignment
  * (tcdb/etl/syntracks.py:281-375): time gate, great-circle distance
  * gate, longest-track-wins per (invest, member), lowest-annual-id wins
  * per track.
  *
  * Synthetic ensemble tracks are derived from `customer` keys: t ∈
  * [0, 240) decomposes bijectively into (init, ens, track_no) =
  * (t%4, t/4%10, t/40), so track identity is unique by construction and
  * both engines rebuild identical points. Invests come from `nation`.
  */
object EnsembleOps {

  /** Long-format track points: ~240 tracks × 1..9 six-hourly steps, some
    * pre-assigned (annual_id > 0), some steps with null lat (skipped by
    * the claimer's first-step search). */
  def trackPoints(spark: SparkSession, dir: String): DataFrame = {
    val t = col("t")
    val s = col("s")
    load(spark, dir, "customer")
      .select((col("c_custkey") % 240).as("t")).distinct()
      .withColumn("s", explode(sequence(lit(0L), t % 9)))
      .select(
        lit("GEFS").as("model"),
        timestamp_seconds(lit(1590969600L) + (t % 4) * 21600).as("init"),
        ((t / 4).cast("long") % 10 + 1).as("ens"),
        ((t / 40).cast("long") + 1).as("track_no"),
        when(t % 7 === 3, t % 3 + 1).otherwise(0L).as("annual_id"),
        ((t % 3) * 6 + s * 6).as("hour"),
        when((t + s) % 17 === 0, lit(null).cast("double"))
          .otherwise((t % 40) - 20 + s / 4.0).as("lat"),
        (((t * 11) % 60) + 70 + s / 2.0).as("lon"),
        (lit(20) + (t * 3 + s * 7) % 80).as("wind"),
        when(t % 7 === 3, concat(lit("PRE_"), t.cast("string")))
          .otherwise(lit(null).cast("string")).as("storm_name"))
  }

  /** Invest positions/times from `nation`: valid times spread ±60 h so the
    * one-sided 1.5-day time gate both passes and fails. */
  def invests(spark: SparkSession, dir: String): DataFrame = {
    val nk = col("n_nationkey")
    load(spark, dir, "nation").select(
      (nk + 1).as("inv_annual_id"),
      concat(lit("INV"), lpad(nk.cast("string"), 2, "0")).as("inv_name"),
      timestamp_seconds(lit(1590969600L) + ((nk * 7) % 20 - 10) * 21600)
        .as("inv_valid"),
      ((nk * 13) % 40 - 20 + 3 / 10.0).as("inv_lat"),
      ((nk * 17) % 60 + 70 + 4 / 10.0).as("inv_lon"))
  }

  /** J7 — the claimed track set (points with invest ids/names applied). */
  def claimTracks(spark: SparkSession, dir: String): DataFrame =
    Ensemble.claimTracks(trackPoints(spark, dir), invests(spark, dir))

  /** Wide-grid export → intake round trip (the .mat-converted Parquet
    * contract, syntracks.py:203-269): toWide collects hour-ordered step
    * arrays per member, fromWide normalizes them back to long — the
    * oracle is the original point set, so any loss/dup/reorder in either
    * direction fails the diff. One track per member (track_no 1). */
  def ensWideRoundtrip(spark: SparkSession, dir: String): DataFrame =
    Ensemble.fromWide(Ensemble.toWide(
      trackPoints(spark, dir).filter(col("track_no") === 1)
        .withColumn("ens_name", concat(lit("M"), col("ens")))
        .withColumn("mslp", lit(1010) - col("wind") / 2.0)
        .drop("track_no", "storm_name")))

  /** The composed syntracks flow, end to end in ONE differential — the
    * reference's makeSyntracks orchestration
    * (tcdb/etl/syntracks.py:281-325 claim → :152-191 ens-mean append →
    * :91-149 dense xarray grid → step rows to the DB): wide-grid intake
    * ([[Ensemble.fromWide]]) → invest claiming
    * ([[Ensemble.claimTracks]]) → synthetic mean member
    * ([[Ensemble.withEnsMean]], members 1..8 of 10, appended as ens 11)
    * → dense 6-hourly spine alignment ([[Ensemble.denseGrid]], 0..48 h
    * × ens 1..11) → published to a parquet [[graft.pipeline.Store]] and
    * read back. Each stage is separately gated (q_ens_wide_roundtrip,
    * q_claim_tracks, q_ens_mean_member, q_window_spine); this gate pins
    * the COMPOSITION — column contracts between stages, claim labels
    * flowing into the mean groups, spine nulls for missing steps — the
    * way q_curation_pipeline does for the curation chain.
    *
    * Scale shape: the claim fan-out is bounded by invests × members
    * (broadcast), the mean is one map-side-combinable aggregate, the
    * spine explode is (inits × 9 hours × 11 members) rows joined
    * left — no shuffle grows super-linearly in track points. */
  def syntracksE2e(spark: SparkSession, dir: String): DataFrame = {
    val memberTracks = trackPoints(spark, dir)
      .filter(col("track_no") === 1)
      .withColumn("ens_name", concat(lit("M"), col("ens")))
      .withColumn("mslp", lit(1010) - col("wind") / 2.0)
      .drop("track_no", "storm_name")
    // wide-grid intake contract (the .mat-converted Parquet shape)
    val longIn = Ensemble.fromWide(Ensemble.toWide(memberTracks))
      .withColumn("track_no", lit(1L))
    val claimed = Ensemble
      .claimTracks(longIn, invests(spark, dir))
      .drop("track_no")
    val withMean = Ensemble.withEnsMean(claimed, numEns = 10)
    val dense = Ensemble.denseGrid(withMean, numEns = 11, maxStep = 48)
    val store = new graft.pipeline.Store(spark, SourceSinkOps.tmp("syn", dir))
    store.write("syntracks", dense)
    store.read("syntracks", dense.schema)
  }

  private val syntracksE2eOracle =
    s"""WITH tr AS (SELECT DISTINCT c_custkey % 240 AS t FROM customer),
       |stepsrc AS (SELECT t, unnest(range(0, t % 9 + 1)) AS s FROM tr
       |  WHERE t // 40 = 0),
       |pts AS (SELECT
       |  'GEFS' AS model,
       |  TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND *
       |    CAST(1590969600 + (t % 4) * 21600 AS INT) AS init,
       |  (t // 4) % 10 + 1 AS ens,
       |  'M' || CAST((t // 4) % 10 + 1 AS VARCHAR) AS ens_name,
       |  CASE WHEN t % 7 = 3 THEN t % 3 + 1 ELSE 0 END AS annual_id,
       |  (t % 3) * 6 + 6 * s AS hour,
       |  CASE WHEN (t + s) % 17 = 0 THEN NULL
       |       ELSE (t % 40) - 20 + s / 4.0 END AS lat,
       |  ((t * 11) % 60) + 70 + s / 2.0 AS lon,
       |  20 + (t * 3 + s * 7) % 80 AS wind,
       |  1010 - (20 + (t * 3 + s * 7) % 80) / 2.0 AS mslp
       |  FROM stepsrc),
       |inv AS (SELECT
       |  n_nationkey + 1 AS inv_annual_id,
       |  TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND *
       |    CAST(1590969600 + ((n_nationkey * 7) % 20 - 10) * 21600 AS INT) AS inv_valid,
       |  (n_nationkey * 13) % 40 - 20 + 3 / 10.0 AS inv_lat,
       |  (n_nationkey * 17) % 60 + 70 + 4 / 10.0 AS inv_lon
       |  FROM nation),
       |fs AS (SELECT model, init, ens,
       |    min(hour) AS hour0, arg_min(lat, hour) AS lat0,
       |    arg_min(lon, hour) AS lon0, count(*) AS n_steps,
       |    min(annual_id) AS annual_id
       |  FROM pts WHERE lat IS NOT NULL GROUP BY 1, 2, 3),
       |un AS (SELECT *, init + INTERVAL 1 SECOND * CAST(hour0 * 3600 AS INT)
       |    AS valid0 FROM fs WHERE annual_id = 0),
       |cand AS (SELECT un.*, inv.inv_annual_id
       |  FROM un CROSS JOIN inv
       |  WHERE epoch(valid0) - epoch(inv_valid) < 129600
       |    AND ${gcNm("lat0", "lon0", "inv_lat", "inv_lon")} <= 310.0),
       |r1 AS (SELECT *, row_number() OVER (
       |    PARTITION BY model, init, inv_annual_id, ens
       |    ORDER BY n_steps DESC) AS rn FROM cand),
       |r2 AS (SELECT *, row_number() OVER (
       |    PARTITION BY model, init, ens
       |    ORDER BY inv_annual_id ASC) AS rt FROM r1 WHERE rn = 1),
       |cl AS (SELECT model, init, ens, inv_annual_id FROM r2 WHERE rt = 1),
       |claimed AS (SELECT p.model, p.init, p.ens, p.ens_name,
       |  CASE WHEN p.annual_id = 0 AND c.inv_annual_id IS NOT NULL
       |       THEN c.inv_annual_id ELSE p.annual_id END AS annual_id,
       |  p.hour, p.lat, p.lon, p.wind, p.mslp
       |  FROM pts p LEFT JOIN cl c
       |    ON p.model = c.model AND p.init = c.init AND p.ens = c.ens),
       |mn AS (SELECT model, init, CAST(11 AS BIGINT) AS ens,
       |    'ENS_MEAN' AS ens_name, annual_id, hour,
       |    round(avg(lat), 3) AS lat, round(avg(lon), 3) AS lon,
       |    round(avg(wind), 3) AS wind, round(avg(mslp), 3) AS mslp
       |  FROM claimed WHERE ens BETWEEN 1 AND 8
       |  GROUP BY model, init, annual_id, hour),
       |allm AS (SELECT model, init, ens, ens_name, annual_id, hour,
       |    lat, lon, wind, mslp FROM claimed
       |  UNION ALL SELECT model, init, ens, ens_name, annual_id, hour,
       |    lat, lon, wind, mslp FROM mn),
       |spine AS (SELECT mi.model, mi.init, h.hour, e.ens,
       |    mi.init + INTERVAL 1 SECOND * CAST(h.hour * 3600 AS INT) AS valid
       |  FROM (SELECT DISTINCT model, init FROM allm) mi
       |  CROSS JOIN (SELECT unnest(range(0, 49, 6)) AS hour) h
       |  CROSS JOIN (SELECT unnest(range(1, 12)) AS ens) e)
       |SELECT sp.model, sp.init, sp.hour, sp.ens, sp.valid,
       |  a.ens_name, a.annual_id, a.lat, a.lon, a.wind, a.mslp
       |FROM spine sp LEFT JOIN allm a
       |  ON a.model = sp.model AND a.init = sp.init
       |  AND a.ens = sp.ens AND a.hour = sp.hour""".stripMargin

  /** W-family extension — linear gap interpolation
    * ([[Ensemble.interpolate]]) over the ensemble points: the fixture
    * plants null lat at (t + s) % 17 == 0, and each gap fills from its
    * nearest non-null neighbors within the track (edge gaps stay
    * null). Exact differential: the lerp is IEEE double arithmetic in
    * a pinned operation order on both engines (integer hour deltas,
    * one float division), rounded to 6 at the edge. */
  def tsInterpolate(spark: SparkSession, dir: String): DataFrame =
    Ensemble.interpolate(trackPoints(spark, dir),
        Seq("model", "init", "ens", "track_no"), "hour", Seq("lat"))
      .select(col("model"), col("init"), col("ens"), col("track_no"),
        col("hour"), round(col("lat"), 6).as("lat"), col("wind"))
      .orderBy("init", "ens", "track_no", "hour")

  private val tsInterpolateOracle: String =
    s"""WITH tr AS (SELECT DISTINCT c_custkey % 240 AS t FROM customer),
       |steps AS (SELECT t, unnest(range(0, t % 9 + 1)) AS s FROM tr),
       |pts AS (SELECT
       |  'GEFS' AS model,
       |  TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND *
       |    CAST(1590969600 + (t % 4) * 21600 AS INT) AS init,
       |  (t // 4) % 10 + 1 AS ens,
       |  t // 40 + 1 AS track_no,
       |  (t % 3) * 6 + 6 * s AS hour,
       |  CASE WHEN (t + s) % 17 = 0 THEN NULL
       |       ELSE (t % 40) - 20 + s / 4.0 END AS lat,
       |  20 + (t * 3 + s * 7) % 80 AS wind
       |  FROM steps),
       |wd AS (SELECT model, init, ens, track_no, hour, lat, wind,
       |  last_value(CASE WHEN lat IS NOT NULL
       |      THEN struct_pack(o := hour, x := lat) END IGNORE NULLS)
       |    OVER (PARTITION BY model, init, ens, track_no ORDER BY hour
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
       |  first_value(CASE WHEN lat IS NOT NULL
       |      THEN struct_pack(o := hour, x := lat) END IGNORE NULLS)
       |    OVER (PARTITION BY model, init, ens, track_no ORDER BY hour
       |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
       |  FROM pts)
       |SELECT model, init, ens, track_no, hour,
       |  round(CASE WHEN lat IS NOT NULL THEN lat
       |    ELSE pv.x + (nv.x - pv.x) * ((hour - pv.o) / (nv.o - pv.o))
       |    END, 6) AS lat,
       |  wind
       |FROM wd ORDER BY init, ens, track_no, hour""".stripMargin

  /** Haversine in nm, matching Geo.greatCircle's operation order:
    * multiply by the precomputed (pi()/180) factor, not (x*pi())/180. */
  private def gcNm(lat1: String, lon1: String, lat2: String, lon2: String) =
    s"""2.0 * asin(sqrt(
       |  pow(sin(($lat1 * (pi() / 180) - $lat2 * (pi() / 180)) / 2), 2) +
       |  cos($lat1 * (pi() / 180)) * cos($lat2 * (pi() / 180)) *
       |  pow(sin(($lon1 * (pi() / 180) - $lon2 * (pi() / 180)) / 2), 2)))
       |* (180.0 / pi()) * 60""".stripMargin

  private val claimTracksOracle =
    s"""WITH tr AS (SELECT DISTINCT c_custkey % 240 AS t FROM customer),
       |steps AS (SELECT t, unnest(range(0, t % 9 + 1)) AS s FROM tr),
       |pts AS (SELECT
       |  'GEFS' AS model,
       |  TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND *
       |    CAST(1590969600 + (t % 4) * 21600 AS INT) AS init,
       |  (t // 4) % 10 + 1 AS ens,
       |  t // 40 + 1 AS track_no,
       |  CASE WHEN t % 7 = 3 THEN t % 3 + 1 ELSE 0 END AS annual_id,
       |  (t % 3) * 6 + 6 * s AS hour,
       |  CASE WHEN (t + s) % 17 = 0 THEN NULL
       |       ELSE (t % 40) - 20 + s / 4.0 END AS lat,
       |  ((t * 11) % 60) + 70 + s / 2.0 AS lon,
       |  20 + (t * 3 + s * 7) % 80 AS wind,
       |  CASE WHEN t % 7 = 3 THEN 'PRE_' || CAST(t AS VARCHAR) END AS storm_name
       |  FROM steps),
       |inv AS (SELECT
       |  n_nationkey + 1 AS inv_annual_id,
       |  'INV' || lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS inv_name,
       |  TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND *
       |    CAST(1590969600 + ((n_nationkey * 7) % 20 - 10) * 21600 AS INT) AS inv_valid,
       |  (n_nationkey * 13) % 40 - 20 + 3 / 10.0 AS inv_lat,
       |  (n_nationkey * 17) % 60 + 70 + 4 / 10.0 AS inv_lon
       |  FROM nation),
       |fs AS (SELECT model, init, ens, track_no,
       |    min(hour) AS hour0, arg_min(lat, hour) AS lat0,
       |    arg_min(lon, hour) AS lon0, count(*) AS n_steps,
       |    min(annual_id) AS annual_id
       |  FROM pts WHERE lat IS NOT NULL GROUP BY 1, 2, 3, 4),
       |un AS (SELECT *, init + INTERVAL 1 SECOND * CAST(hour0 * 3600 AS INT)
       |    AS valid0 FROM fs WHERE annual_id = 0),
       |cand AS (SELECT un.*, inv.inv_annual_id, inv.inv_name
       |  FROM un CROSS JOIN inv
       |  WHERE epoch(valid0) - epoch(inv_valid) < 129600
       |    AND ${gcNm("lat0", "lon0", "inv_lat", "inv_lon")} <= 310.0),
       |r1 AS (SELECT *, row_number() OVER (
       |    PARTITION BY model, init, inv_annual_id, ens
       |    ORDER BY n_steps DESC, track_no ASC) AS rn FROM cand),
       |r2 AS (SELECT *, row_number() OVER (
       |    PARTITION BY model, init, ens, track_no
       |    ORDER BY inv_annual_id ASC) AS rt FROM r1 WHERE rn = 1),
       |cl AS (SELECT model, init, ens, track_no, inv_annual_id, inv_name
       |  FROM r2 WHERE rt = 1)
       |SELECT p.model, p.init, p.ens, p.track_no,
       |  CASE WHEN p.annual_id = 0 AND c.inv_annual_id IS NOT NULL
       |       THEN c.inv_annual_id ELSE p.annual_id END AS annual_id,
       |  p.hour, p.lat, p.lon, p.wind,
       |  CASE WHEN p.annual_id = 0 AND c.inv_annual_id IS NOT NULL
       |       THEN c.inv_name ELSE p.storm_name END AS storm_name
       |FROM pts p LEFT JOIN cl c
       |  ON p.model = c.model AND p.init = c.init AND p.ens = c.ens
       |  AND p.track_no = c.track_no""".stripMargin

  /** S-source — MAT v5 syntracks intake (tcdb/etl/syntracks.py:203-269):
    * the reference's one remaining source format. The 240-track ensemble
    * fixture is serialized into per-init MATLAB v5 files (struct array
    * `tracks` with fields ens/stormName/annual_id/hour/lat/lon/wind/mslp,
    * alternating miCOMPRESSED and raw — both reader paths exercised every
    * run), read back through Spark's binaryFile source, and normalized
    * exactly as toSyntrackObjects does: the ens field decodes as −1→DET
    * (member num_ens=10), 0→CTRL (member 1), k→ENS (member k+1); valid =
    * init + hour; a non-string stormName becomes ""; NaN steps surface
    * as NULL lat. The DuckDB oracle recomputes every row arithmetically
    * from `customer`, so the whole binary codec (header, tags, struct
    * recursion, UTF-16 chars, zlib, IEEE doubles incl. NaN) sits inside
    * the differential. All doubles are integer-derived quarters/halves —
    * exactly representable, so no rounding enters the diff (the
    * PortableMath conventions; the reference's round-to-3 is an identity
    * on this grid and is deliberately omitted).
    *
    * Scale shape: a syntracks archive is MANY SMALL FILES (one per model
    * init); the binaryFile source gives one task per file and the decode
    * is per-file imperative binary parsing — the documented last-resort
    * case for row-level code, with nothing corpus-sized on the driver
    * (the fixture WRITER collects, but over the ≤240-track fixture only;
    * real intake never collects). */
  def matIntake(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = SourceSinkOps.tmp("mat", dir)
    writeMatFixture(spark, dir, path)
    val numEns = 10L // the model-settings constant (settings.num_ens)
    spark.read.format("binaryFile").load(s"$path/*.mat")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val epoch = "gefs_(\\d+)\\.mat".r.findFirstMatchIn(p)
          .getOrElse(throw new IllegalArgumentException(
            s"unrecognized syntracks file name: $p")).group(1).toLong
        val init = java.time.LocalDateTime
          .ofEpochSecond(epoch, 0, java.time.ZoneOffset.UTC)
        def nums(el: Map[String, graft.parse.MatFile.Value],
            f: String): Array[Double] = el(f) match {
          case graft.parse.MatFile.Num(_, d) => d
          case v => throw new IllegalArgumentException(s"$f: $v")
        }
        graft.parse.MatFile.read(bytes)
          .collect { case (_, s: graft.parse.MatFile.Struct) => s }
          .flatMap(_.elements.flatMap { el =>
            val ens = nums(el, "ens")(0).toLong
            val (ensName, ensNum) =
              if (ens == -1L) ("DET", numEns)
              else if (ens == 0L) ("CTRL", 1L)
              else ("ENS", ens + 1)
            val storm = el.get("stormName") match {
              case Some(graft.parse.MatFile.Str(s)) => s
              case _ => "" // non-string stormName → "" (syntracks.py:240)
            }
            val aid = nums(el, "annual_id")(0).toLong
            val hour = nums(el, "hour")
            val lat = nums(el, "lat")
            val lon = nums(el, "lon")
            val wind = nums(el, "wind")
            val mslp = nums(el, "mslp")
            hour.indices.map { i =>
              val h = hour(i).toLong
              MatTrackRow(init, ensNum, ensName, storm, aid, h,
                init.plusHours(h),
                if (lat(i).isNaN) null else Double.box(lat(i)),
                lon(i), wind(i), mslp(i))
            }
          })
      }.toDF()
  }

  /** Group the 240-track fixture into per-init struct arrays and write
    * them as .mat files (even inits compressed, odd raw). Bounded by the
    * fixture's %240 collapse at every sf. */
  private def writeMatFixture(spark: SparkSession, dir: String,
      path: String): Unit = {
    import graft.parse.MatFile
    val rows = trackPoints(spark, dir)
      .select(col("init").cast("long").as("epoch"), col("ens"),
        col("track_no"), col("annual_id"), col("hour"), col("lat"),
        col("lon"), col("wind").cast("double").as("wind"),
        col("storm_name"))
      .collect()
    val dirF = new java.io.File(path)
    graft.pipeline.FsUtils.deleteRecursively(dirF)
    dirF.mkdirs()
    val fields = Seq("ens", "stormName", "annual_id", "hour", "lat",
      "lon", "wind", "mslp")
    rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .zipWithIndex.foreach { case ((epoch, rs), fi) =>
        val tracks = rs.groupBy(r => (r.getLong(1), r.getLong(2))).toSeq
          .sortBy(_._1).map { case ((ens, _), steps) =>
            val s = steps.sortBy(_.getLong(4))
            def arr(f: Int => Double): MatFile.Num =
              MatFile.Num(Seq(1, s.length), s.indices.map(f).toArray)
            Map[String, MatFile.Value](
              "ens" -> MatFile.Num(Seq(1, 1), Array((ens - 2).toDouble)),
              "stormName" -> MatFile.Str(
                if (s.head.isNullAt(8)) "" else s.head.getString(8)),
              "annual_id" -> MatFile.Num(Seq(1, 1),
                Array(s.head.getLong(3).toDouble)),
              "hour" -> arr(i => s(i).getLong(4).toDouble),
              "lat" -> arr(i =>
                if (s(i).isNullAt(5)) Double.NaN else s(i).getDouble(5)),
              "lon" -> arr(i => s(i).getDouble(6)),
              "wind" -> arr(i => s(i).getDouble(7)),
              "mslp" -> arr(i => 1010.0 - s(i).getDouble(7) / 2.0))
          }
        MatFile.writeFile(new java.io.File(dirF, s"gefs_$epoch.mat"),
          Seq("tracks" -> MatFile.Struct(fields, tracks)),
          compress = fi % 2 == 0)
      }
  }

  private val matIntakeOracle =
    """WITH tr AS (SELECT DISTINCT c_custkey % 240 AS t FROM customer),
      |steps AS (SELECT t, unnest(range(0, t % 9 + 1)) AS s FROM tr),
      |pts AS (SELECT t, s, (t // 4) % 10 + 1 AS ens,
      |  (t % 3) * 6 + 6 * s AS hour FROM steps)
      |SELECT
      |  TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND *
      |    CAST(1590969600 + (t % 4) * 21600 AS INT) AS init,
      |  CAST(CASE WHEN ens = 1 THEN 10 WHEN ens = 2 THEN 1
      |       ELSE ens - 1 END AS BIGINT) AS ens_num,
      |  CASE WHEN ens = 1 THEN 'DET' WHEN ens = 2 THEN 'CTRL'
      |       ELSE 'ENS' END AS ens_name,
      |  CASE WHEN t % 7 = 3 THEN 'PRE_' || CAST(t AS VARCHAR)
      |       ELSE '' END AS storm_name,
      |  CAST(CASE WHEN t % 7 = 3 THEN t % 3 + 1 ELSE 0 END AS BIGINT)
      |    AS annual_id,
      |  CAST(hour AS BIGINT) AS hour,
      |  TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND *
      |    CAST(1590969600 + (t % 4) * 21600 + hour * 3600 AS INT) AS valid,
      |  CASE WHEN (t + s) % 17 = 0 THEN NULL
      |       ELSE (t % 40) - 20 + s / 4.0 END AS lat,
      |  ((t * 11) % 60) + 70 + s / 2.0 AS lon,
      |  CAST(20 + (t * 3 + s * 7) % 80 AS DOUBLE) AS wind,
      |  1010 - (20 + (t * 3 + s * 7) % 80) / 2.0 AS mslp
      |FROM pts""".stripMargin

  private val ensWideRoundtripOracle =
    s"""WITH tr AS (SELECT DISTINCT c_custkey % 240 AS t FROM customer),
       |steps AS (SELECT t, unnest(range(0, t % 9 + 1)) AS s FROM tr
       |  WHERE t // 40 = 0),
       |pts AS (SELECT
       |  'GEFS' AS model,
       |  TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND *
       |    CAST(1590969600 + (t % 4) * 21600 AS INT) AS init,
       |  (t // 4) % 10 + 1 AS ens,
       |  'M' || CAST((t // 4) % 10 + 1 AS VARCHAR) AS ens_name,
       |  CASE WHEN t % 7 = 3 THEN t % 3 + 1 ELSE 0 END AS annual_id,
       |  (t % 3) * 6 + 6 * s AS hour,
       |  CASE WHEN (t + s) % 17 = 0 THEN NULL
       |       ELSE (t % 40) - 20 + s / 4.0 END AS lat,
       |  ((t * 11) % 60) + 70 + s / 2.0 AS lon,
       |  20 + (t * 3 + s * 7) % 80 AS wind,
       |  1010 - (20 + (t * 3 + s * 7) % 80) / 2.0 AS mslp
       |  FROM steps)
       |SELECT * FROM pts""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q_claim_tracks", claimTracks, Some(claimTracksOracle), "J7"),
    QuerySpec("q_ens_wide_roundtrip", ensWideRoundtrip,
      Some(ensWideRoundtripOracle), "W5/intake"),
    QuerySpec("q_syntracks_e2e", syntracksE2e,
      Some(syntracksE2eOracle), "J7/A9/W5/S8 composed"),
    QuerySpec("q_ts_interpolate", tsInterpolate,
      Some(tsInterpolateOracle), "W5-gap-fill"),
    QuerySpec("q_mat_intake", matIntake, Some(matIntakeOracle),
      "S-source: MAT v5 syntracks intake (tcdb/etl/syntracks.py:203-269)"))
}

/** One normalized syntracks step row ([[EnsembleOps.matIntake]]);
  * LocalDateTime fields encode as TIMESTAMP_NTZ, nullable lat as a
  * boxed Double. */
final case class MatTrackRow(init: java.time.LocalDateTime,
    ens_num: Long, ens_name: String, storm_name: String, annual_id: Long,
    hour: Long, valid: java.time.LocalDateTime, lat: java.lang.Double,
    lon: Double, wind: Double, mslp: Double)
