package graft.analytics

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.parse.Fixtures
import graft.pipeline.{Pipelines, Store}

/** The db SQL files analytics surface over a store built by the real E1/E2
  * pipelines — the automated version of the reference's manual
  * sql_export.py golden-output workflow (SURVEY.md §5). */
class ReferenceQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val now = Timestamp.valueOf("2022-09-28 18:00:00")

  private lazy val store: Store = {
    val landingB = Files.createTempDirectory("rq_b")
    val landingA = Files.createTempDirectory("rq_a")
    val storeDir = Files.createTempDirectory("rq_store")
    Files.write(landingB.resolve("bal092022.dat"),
      Seq(Fixtures.bdeck("2022092800", 34),
        Fixtures.bdeck("2022092812", 34, vmax = 110))
        .mkString("\n").getBytes)
    Files.write(landingA.resolve("aal092022.dat"),
      Seq(Fixtures.adeck("2022092812", "OFCL", 0, 34),
        Fixtures.adeck("2022092812", "OFCL", 12, 34),
        Fixtures.adeck("2022092812", "HWRF", 12, 34),
        Fixtures.adeck("2022092812", "HWRF", 24, 34))
        .mkString("\n").getBytes)
    val s = new Store(spark, storeDir.toString)
    Pipelines.runBdeck(spark, landingB.toString, s, now)
    Pipelines.runAdeck(spark, landingA.toString, s, now,
      graft.schema.Seeds.modelAllowlist)
    s
  }

  test("basin_model_counts: tracks per model, count desc") {
    val out = ReferenceQueries.basinModelCounts(spark, store, "AL").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("HWRF", 1L), ("OFCL", 1L)))
  }

  test("basin_track_counts_by_model + model_counts_by_basin") {
    val byModel = ReferenceQueries
      .basinTrackCountsByModel(spark, store, "AL").collect()
    assert(byModel.map(_.getString(0)).toSet == Set("OFCL", "HWRF"))
    val byBasin = ReferenceQueries
      .modelCountsByBasin(spark, store, "HWRF").collect()
    assert(byBasin.map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("AL", 1L)))
  }

  test("storm_track_counts_by_model joins storm names") {
    val out = ReferenceQueries
      .stormTrackCountsByModel(spark, store, "AL").collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq
      == Seq(("HU-Ian", "HWRF"), ("HU-Ian", "OFCL")))
  }

  test("track extraction: per-step rows filtered by init and model") {
    val out = ReferenceQueries.trackExtraction(spark, store, "AL092022",
      init = Some(Timestamp.valueOf("2022-09-28 12:00:00")),
      model = Some("OFCL")).collect()
    assert(out.map(_.getAs[Int]("hour")).toSeq == Seq(0, 12))
    assert(out.forall(_.getAs[String]("name") == "HU-Ian"))
    assert(out.forall(_.getAs[Int]("annual_id") == 1))
  }

  test("dimension seeds match the reference DDL") {
    assert(graft.schema.Seeds.regions(spark).count() == 6)
    assert(graft.schema.Seeds.dataSources(spark).count() == 5)
    assert(graft.schema.Seeds.modelAllowlist.length == 23)
  }
}
