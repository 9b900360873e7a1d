package graft.pipeline

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.parse.Fixtures
import graft.schema.Schemas

/** End-to-end E1/E2 over real files in a temp landing dir (SURVEY.md §5.4). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val now = Timestamp.valueOf("2022-09-28 18:00:00")

  private def tmpDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit(); d
  }

  private def writeLanding(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name), lines.mkString("\n").getBytes)

  test("E1 bdeck ingest: storms resolved, observations pivoted + upserted") {
    val landing = tmpDir("landing_b")
    val storeDir = tmpDir("store1")
    writeLanding(landing, "bal092022.dat", Seq(
      Fixtures.bdeck("2022092800", 34), Fixtures.bdeck("2022092800", 50),
      Fixtures.bdeck("2022092806", 34, vmax = 110, mslp = 940)))
    writeLanding(landing, "bal912022.dat", Seq(
      Fixtures.bdeck("2022092806", 34, snum = 91, name = "INVEST",
        lat = "150N", lon = "400W")))
    val store = new Store(spark, storeDir.toString)

    Pipelines.runBdeck(spark, landing.toString, store, now)

    val storms = store.read("storms", Schemas.storms).orderBy("nhc_number")
      .collect()
    assert(storms.map(_.getAs[String]("nhc_id")).toSeq
      == Seq("AL092022", "AL912022"))
    assert(storms.map(_.getAs[Int]("annual_id")).toSeq == Seq(1, 2))
    assert(storms.forall(_.getAs[String]("status") == "Active"))

    val obs = store.read("observations", Schemas.observations)
    assert(obs.count() == 3) // two datetimes for IAN + one for invest
    val o = obs.filter(col("nhc_id") === "AL092022" &&
      col("datetime_utc") === Timestamp.valueOf("2022-09-28 00:00:00"))
      .collect()(0)
    assert(o.getAs[Int]("r50_ne") == 140)
    assert(o.getAs[Double]("intensity_kts") == 105.0)

    // re-run is idempotent (T5)
    Pipelines.runBdeck(spark, landing.toString, store, now)
    assert(store.read("storms", Schemas.storms).count() == 2)
    assert(store.read("observations", Schemas.observations).count() == 3)

    // incremental update: newer file extends end_date and adds an obs
    writeLanding(landing, "bal092022.dat", Seq(
      Fixtures.bdeck("2022092800", 34), Fixtures.bdeck("2022092800", 50),
      Fixtures.bdeck("2022092806", 34, vmax = 110, mslp = 940),
      Fixtures.bdeck("2022092812", 34, vmax = 120, mslp = 930)))
    Pipelines.runBdeck(spark, landing.toString, store, now)
    val ian = store.read("storms", Schemas.storms)
      .filter(col("nhc_id") === "AL092022").collect()(0)
    assert(ian.getAs[Timestamp]("end_date")
      == Timestamp.valueOf("2022-09-28 12:00:00"))
    assert(store.read("observations", Schemas.observations).count() == 4)
  }

  test("E2 adeck ingest: forecasts -> tracks -> steps with model allowlist") {
    val landingB = tmpDir("landing_b2")
    val landingA = tmpDir("landing_a2")
    val storeDir = tmpDir("store2")
    val store = new Store(spark, storeDir.toString)
    // storms must exist first (file-name inference skips unknown storms)
    writeLanding(landingB, "bal092022.dat", Seq(
      Fixtures.bdeck("2022092800", 34),
      Fixtures.bdeck("2022092812", 34, vmax = 110)))
    Pipelines.runBdeck(spark, landingB.toString, store, now)

    writeLanding(landingA, "aal092022.dat", Seq(
      Fixtures.adeck("2022092812", "OFCL", 0, 34),
      Fixtures.adeck("2022092812", "OFCL", 12, 34),
      Fixtures.adeck("2022092812", "OFCL", 12, 50),
      Fixtures.adeck("2022092812", "HWRF", 12, 34),
      Fixtures.adeck("2022092812", "XTRP", 12, 34),   // not allowlisted
      Fixtures.adeck("2022092000", "OFCL", 12, 34)))  // too old (>48h)
    // unknown storm file is skipped entirely
    writeLanding(landingA, "aal552022.dat", Seq(
      Fixtures.adeck("2022092812", "OFCL", 12, 34)))

    Pipelines.runAdeck(spark, landingA.toString, store, now,
      allowedModels = Seq("OFCL", "HWRF"))

    val fc = store.read("forecasts", Schemas.forecasts).orderBy("model").collect()
    assert(fc.map(_.getAs[String]("model")).toSeq == Seq("HWRF", "OFCL"))
    assert(fc.forall(_.getAs[String]("data_source") == "NHC"))

    val tracks = store.read("tracks", Schemas.tracks)
    assert(tracks.count() == 2)
    assert(tracks.collect().forall(_.getAs[Int]("ensemble_number") == 1))

    val steps = store.read("steps", Schemas.steps)
      .filter(col("model") === "OFCL").orderBy("hour").collect()
    assert(steps.map(_.getAs[Int]("hour")).toSeq == Seq(0, 12))
    assert(steps(1).getAs[Double]("latitude") == 27.1)

    // idempotent re-run
    Pipelines.runAdeck(spark, landingA.toString, store, now,
      allowedModels = Seq("OFCL", "HWRF"))
    assert(store.read("steps", Schemas.steps).count() == 3)
  }

  test("store layout gives partition pruning on (region, season) predicates") {
    val storeDir = tmpDir("store_prune")
    val store = new Store(spark, storeDir.toString)
    import spark.implicits._
    val storms = Seq(
      ("AL092022", "AL", 2022, "Ian"), ("AL012021", "AL", 2021, "Ana"),
      ("EP052022", "EP", 2022, "Estelle"))
      .toDF("nhc_id", "region", "season", "name")
    store.write("storms_p", storms)
    val pruned = spark.read.parquet(store.path("storms_p"))
      .filter(col("region") === "AL" && col("season") === 2022)
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: ["), s"no partition filters in:\n$plan")
    assert(plan.contains("region") && plan.contains("season"),
      s"partition predicates not pushed to directory pruning in:\n$plan")
    // the pruned scan must not read the 2021/EP directories
    val files = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty &&
      files.forall(f => f.contains("region=AL") && f.contains("season=2022")),
      s"scan read non-matching partitions: ${files.mkString(", ")}")
  }

  test("dim-filtered join triggers DYNAMIC partition pruning on the fact scan") {
    // the flagship 100 TB star-join read path: the region predicate
    // lives on the DIM side, so static pruning can't touch the fact
    // scan — the runtime dynamicpruning subquery (fed by the broadcast)
    // must prune the (region=...) directories instead
    val storeDir = tmpDir("store_dpp")
    val store = new Store(spark, storeDir.toString)
    import spark.implicits._
    val fact = (1 to 300).map(i =>
      (s"ID$i", Seq("AL", "EP", "WP")(i % 3), 2020 + (i % 2), i.toDouble))
      .toDF("nhc_id", "region", "season", "v")
    store.write("fact_dpp", fact)
    // the dim must be a FILE-backed scan: a LocalRelation's filter
    // constant-folds away before the PartitionPruning rule looks for a
    // selective predicate over a scan, and no DPP is ever inserted
    Seq(("AL", "Atlantic"), ("EP", "EastPac"), ("WP", "WestPac"))
      .toDF("region", "basin")
      .write.mode("overwrite").parquet(s"$storeDir/dim_dpp")
    val dim = spark.read.parquet(s"$storeDir/dim_dpp")
    val q = spark.read.parquet(store.path("fact_dpp"))
      .join(broadcast(dim.filter(col("basin") === "Atlantic")), "region")
      .agg(org.apache.spark.sql.functions.sum("v"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n$plan")
  }

  test("maintenance: archive stale storms, expire old invests with cascade") {
    val landing = tmpDir("landing_m")
    val storeDir = tmpDir("store_m")
    val store = new Store(spark, storeDir.toString)
    writeLanding(landing, "bal092022.dat", Seq(
      Fixtures.bdeck("2022092800", 34), Fixtures.bdeck("2022092812", 34)))
    writeLanding(landing, "bal912022.dat", Seq(
      Fixtures.bdeck("2022092806", 34, snum = 91, name = "INVEST",
        lat = "150N", lon = "400W")))
    Pipelines.runBdeck(spark, landing.toString, store, now)
    assert(store.read("storms", Schemas.storms).count() == 2)

    // a day later: both stale -> archived
    val later = Timestamp.valueOf("2022-09-30 00:00:00")
    Maintenance.archiveStale(store, later, hours = 24)
    val statuses = store.read("storms", Schemas.storms)
      .collect().map(r => r.getAs[String]("nhc_id") -> r.getAs[String]("status")).toMap
    assert(statuses.values.forall(_ == "Archive"))

    // 31 days later: the invest expires, its observations cascade away
    val muchLater = Timestamp.valueOf("2022-10-29 00:00:00")
    Maintenance.expireInvests(store, muchLater, days = 30)
    val ids = store.read("storms", Schemas.storms)
      .collect().map(_.getAs[String]("nhc_id")).toSet
    assert(ids == Set("AL092022")) // named storm kept
    val obsIds = store.read("observations", Schemas.observations)
      .select("nhc_id").distinct().collect().map(_.getString(0)).toSet
    assert(obsIds == Set("AL092022"))
  }
}
