package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.parse.Fixtures
import graft.pipeline.Store
import graft.schema.Schemas

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val now = Timestamp.valueOf("2022-09-28 18:00:00")

  test("T1/T5 streaming bdeck ingest matches the batch result") {
    val landing = Files.createTempDirectory("s_landing")
    val storeDir = Files.createTempDirectory("s_store")
    val ckpt = Files.createTempDirectory("s_ckpt")
    Files.write(landing.resolve("bal092022.dat"),
      Seq(Fixtures.bdeck("2022092800", 34),
        Fixtures.bdeck("2022092806", 34, vmax = 110))
        .mkString("\n").getBytes)
    val store = new Store(spark, storeDir.toString)

    val q = StreamingIngest.bdeckStream(spark, landing.toString, store,
      ckpt.toString, () => now)
    q.awaitTermination(60000)

    val storms = store.read("storms", Schemas.storms).collect()
    assert(storms.length == 1)
    assert(storms(0).getAs[String]("nhc_id") == "AL092022")
    assert(storms(0).getAs[Int]("annual_id") == 1)

    // second micro-batch: new file claims next annual id (stateful resume)
    Files.write(landing.resolve("bal912022.dat"),
      Seq(Fixtures.bdeck("2022092812", 34, snum = 91, name = "INVEST",
        lat = "150N", lon = "400W")).mkString("\n").getBytes)
    val q2 = StreamingIngest.bdeckStream(spark, landing.toString, store,
      ckpt.toString, () => now)
    q2.awaitTermination(60000)
    val after = store.read("storms", Schemas.storms).orderBy("nhc_number").collect()
    assert(after.map(_.getAs[Int]("annual_id")).toSeq == Seq(1, 2))
  }

  test("E2 streaming adeck ingest matches the batch result") {
    import graft.pipeline.Pipelines
    val landing = Files.createTempDirectory("a_landing")
    Files.write(landing.resolve("bal092022.dat"),
      Seq(Fixtures.bdeck("2022092800", 34)).mkString("\n").getBytes)
    val adeckDir = Files.createTempDirectory("a_adeck")
    Files.write(adeckDir.resolve("aal092022.dat"),
      Seq(
        Fixtures.adeck("2022092800", "AVNO", 0, 34),
        Fixtures.adeck("2022092800", "AVNO", 12, 34, lat = "275N", vmax = 80),
        Fixtures.adeck("2022092800", "AVNO", 12, 50, lat = "275N", vmax = 80),
        Fixtures.adeck("2022092800", "OFCL", 0, 34),
        Fixtures.adeck("2022092800", "XTRA", 0, 34), // not allowlisted
        Fixtures.adeck("2022092500", "AVNO", 0, 34)) // stale (>48 h)
        .mkString("\n").getBytes)

    def freshStore(): Store = {
      val store = new Store(spark,
        Files.createTempDirectory("a_store").toString)
      Pipelines.runBdeck(spark, landing.toString, store, now)
      store
    }
    val models = Seq("AVNO", "OFCL")

    val batchStore = freshStore()
    Pipelines.runAdeck(spark, adeckDir.toString, batchStore, now, models)

    val streamStore = freshStore()
    val ckpt = Files.createTempDirectory("a_ckpt")
    val q = StreamingIngest.adeckStream(spark, adeckDir.toString,
      streamStore, ckpt.toString, () => now, models)
    q.awaitTermination(60000)

    for (t <- Seq("forecasts", "tracks", "steps")) {
      val schema = t match {
        case "forecasts" => Schemas.forecasts
        case "tracks" => Schemas.tracks
        case _ => Schemas.steps
      }
      val a = batchStore.read(t, schema).drop("run_id")
      val b = streamStore.read(t, schema).drop("run_id")
      assert(a.count() > 0, s"$t empty in batch store")
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"$t differs between batch and stream")
    }
    // allowlist + recency gates applied: only AVNO/OFCL at the recent init
    val models2 = batchStore.read("steps", Schemas.steps)
      .select("model").distinct().collect().map(_.getString(0)).toSet
    assert(models2 == Set("AVNO", "OFCL"))
  }

  test("T8-sliding hopping aggregation: real stream equals batch, each " +
      "row lands in 2 windows") {
    val obs = Seq(
      ("AL092022", "2022-09-28 00:15:00", 100.0),
      ("AL092022", "2022-09-28 05:59:00", 105.0),
      ("AL092022", "2022-09-28 06:01:00", 110.0),
      ("EP052022", "2022-09-28 11:30:00", 65.0))
      .map { case (id, t, k) => (id, Timestamp.valueOf(t), k) }
      .toDF("nhc_id", "datetime_utc", "intensity_kts")
    val base = s"/tmp/graft_ss/p${ProcessHandle.current().pid}" +
      s"/sliding_${System.nanoTime()}"
    obs.coalesce(1).write.parquet(s"$base/in")
    val sink = s"m${System.nanoTime()}"
    StreamingIngest.slidingAggStream(
        spark.readStream.schema(obs.schema).parquet(s"$base/in"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("complete")
      .option("checkpointLocation", s"$base/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Timestamp]("win_start"), r.getAs[String]("nhc_id"),
        r.getAs[Long]("n_obs"), r.getAs[Double]("peak_kts"))
    val streamed = spark.table(sink).collect().map(key).toSet
    val batch = StreamingIngest.slidingAggStream(obs).collect().map(key).toSet
    assert(streamed == batch)
    // 4 rows x 2 windows each = 8 contributions across the groups
    assert(batch.toSeq.map(_._3).sum == 8L)
  }

  test("T2/T8 windowed cycle aggregation equals the batch computation") {
    val obs = Seq(
      ("AL092022", "2022-09-28 00:15:00", 100.0),
      ("AL092022", "2022-09-28 05:59:00", 105.0),
      ("AL092022", "2022-09-28 06:01:00", 110.0))
      .map { case (id, t, k) => (id, Timestamp.valueOf(t), k) }
      .toDF("nhc_id", "datetime_utc", "intensity_kts")
    val out = StreamingIngest.cycleAggStream(obs)
      .orderBy("cycle").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_obs") == 2 &&
      out(0).getAs[Double]("peak_kts") == 105.0)
    assert(out(1).getAs[Double]("peak_kts") == 110.0)
  }
}
