package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** APPEND-mode event-time sessionization — the production form of the
  * complete-mode [[StreamingIngest.sessionStream]] gate (whose docstring
  * defers exactly this): a real watermark bounds lateness, closed
  * sessions are FINALIZED by watermark passage and appended exactly-once
  * to the parquet sink's file log, and state is evicted as sessions
  * close — the only shape whose state and output are both sustainable on
  * an unbounded clickstream (complete mode rewrites every session every
  * batch; its state never shrinks).
  *
  * Determinism protocol (what makes this gateable): emission time in
  * append mode depends on watermark progression, which depends on
  * micro-batch boundaries — unobservable from outside. The gate
  * therefore (1) sets the watermark delay LONGER than the fixture's
  * whole event-time span, so during the data run the watermark can never
  * pass any real event — nothing drops, nothing emits, regardless of
  * how the file source batches; (2) replays the SAME query on the same
  * checkpoint with one SENTINEL event far enough ahead that the
  * persisted watermark advances past every real session's close; (3)
  * replays once more with one LATE event inside the real range, which
  * the now-advanced watermark MUST drop. After the three runs the sink
  * holds every real session exactly once, the sentinel's own session is
  * still open (never emitted), and the late event appears nowhere —
  * each of the three facts is load-bearing in the differential (a
  * leaked sentinel/late row or a withheld session hash-mismatches).
  *
  * Scale shape: state is keyed by (user, open session), partitioned by
  * user; size ∝ users active within the watermark horizon — the delay
  * IS the memory knob. Output is append-only; nothing is rewritten.
  */
object StreamingSessions {

  /** Landing-file schema. `ts` is TIMESTAMP (LTZ): Spark watermarks
    * require it; the UTC session zone makes the NTZ↔LTZ casts at the
    * fixture/read-back boundary lossless. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType)))

  /** Watch `landing` for parquet event files, sessionize with a
    * `gapMinutes` inactivity gap and a `delay` watermark, append
    * WATERMARK-FINALIZED sessions to `outPath`. `AvailableNow` drains
    * the backlog then stops; rerunnable on the same checkpoint as more
    * files land — the watermark persists in the checkpoint's commit log,
    * so a later run finalizes (or drops) what an earlier one left open.
    * `id_sum` is an exact integer membership checksum: two engines can
    * only agree on it by placing exactly the same events in exactly the
    * same sessions. */
  def appendSessionStream(spark: SparkSession, landing: String,
      outPath: String, checkpoint: String, gapMinutes: Int,
      delay: String): StreamingQuery =
    spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "2")
      .parquet(landing)
      .withWatermark("ts", delay)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum("event_id").as("id_sum"))
      .select(col("user_id"),
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("n_events"), col("id_sum"))
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
}
