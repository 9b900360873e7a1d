package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T3 as true streaming state: per-storm Active→Archive transitions via
  * `mapGroupsWithState` with event-time timeout — the continuous version
  * of the reference's periodic maintenance cron
  * (tcdb/pipeline/routines.py:14-31).
  *
  * State per storm = latest observation time. When no observation arrives
  * for `archiveAfterHours` past the watermark, the timeout fires and the
  * storm is emitted as Archive.
  */
object StormStateTracker {

  case class Obs(nhc_id: String, datetime_utc: Timestamp)
  case class StormStatus(nhc_id: String, last_obs: Timestamp, status: String)

  def track(obs: Dataset[Obs], archiveAfterHours: Int = 24)(
      implicit spark: SparkSession): Dataset[StormStatus] = {
    import spark.implicits._
    obs
      .withWatermark("datetime_utc", s"$archiveAfterHours hours")
      .groupByKey(_.nhc_id)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout()) {
        (id: String, rows: Iterator[Obs], state: GroupState[Timestamp]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            StormStatus(id, last, "Archive")
          } else {
            val newest = (rows.map(_.datetime_utc) ++ state.getOption)
              .maxBy(_.getTime)
            state.update(newest)
            state.setTimeoutTimestamp(
              newest.getTime + archiveAfterHours * 3600L * 1000L)
            StormStatus(id, newest, "Active")
          }
      }
  }

  /** Batch-equivalent computation, for differential testing. */
  def trackBatch(obs: Dataset[Obs], asOf: Timestamp,
      archiveAfterHours: Int = 24)(
      implicit spark: SparkSession): Dataset[StormStatus] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    obs.groupBy("nhc_id").agg(max("datetime_utc").as("last_obs"))
      .withColumn("status",
        when(col("last_obs") <
            lit(asOf) - expr(s"interval $archiveAfterHours hours"), "Archive")
          .otherwise("Active"))
      .as[StormStatus]
  }
}
