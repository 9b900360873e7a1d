package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StormStateTracker.{Obs, StormStatus}

class StormStateTrackerSpec extends AnyFunSuite {
  implicit lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("mapGroupsWithState tracks latest obs and archives on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Obs]
    val query = StormStateTracker.track(input.toDS(), archiveAfterHours = 24)
      .writeStream.format("memory").queryName("storm_state")
      .outputMode(OutputMode.Update()).start()

    input.addData(
      Obs("AL092022", ts("2022-09-28 00:00:00")),
      Obs("AL092022", ts("2022-09-28 06:00:00")),
      Obs("AL912022", ts("2022-09-28 00:00:00")))
    query.processAllAvailable()
    val active = spark.table("storm_state").as[StormStatus].collect()
    assert(active.forall(_.status == "Active"))
    assert(active.find(_.nhc_id == "AL092022").get.last_obs
      == ts("2022-09-28 06:00:00"))

    // advance the watermark far past AL91's timeout; only AL09 gets data
    input.addData(Obs("AL092022", ts("2022-09-30 12:00:00")))
    query.processAllAvailable()
    input.addData(Obs("AL092022", ts("2022-09-30 18:00:00")))
    query.processAllAvailable()
    val rows = spark.table("storm_state").as[StormStatus].collect()
    assert(rows.exists(r => r.nhc_id == "AL912022" && r.status == "Archive"))
    query.stop()
  }

  test("batch equivalent computes the same statuses") {
    val obs = Seq(Obs("A", ts("2022-09-28 00:00:00")),
      Obs("B", ts("2022-09-26 00:00:00"))).toDS()
    val out = StormStateTracker
      .trackBatch(obs, ts("2022-09-28 12:00:00"), 24)
      .collect().map(s => s.nhc_id -> s.status).toMap
    assert(out == Map("A" -> "Active", "B" -> "Archive"))
  }
}
