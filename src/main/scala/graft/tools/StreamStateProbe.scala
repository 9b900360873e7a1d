package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Session, Tables}

/** Streaming state-growth probe: measures keyed-state size vs watermark
  * delay at replicated event volume, to confirm the documented scale
  * model `state ≈ rate × (delay + range)` on the two stateful gates
  * whose state the differentials can't observe:
  *
  *  - stream-stream LEFT OUTER join (q_stream_join_outer's shape):
  *    both sides buffer keyed rows until the min watermark passes the
  *    join range — state should scale with the delay, NOT the corpus.
  *  - append-mode session windows (q_stream_session_append's shape):
  *    open sessions are held until the watermark proves them closed.
  *
  * Method: events are replicated `factor`× ([[Replicate]]), sliced into
  * event-time-ordered files with ascending mtimes (the mtime pin makes
  * file order — and therefore watermark progression — deterministic),
  * and streamed with `maxFilesPerTrigger = 1` so the watermark advances
  * once per slice. For each watermark delay the probe reports the MAX
  * across micro-batches of total state rows and state memory from
  * `StreamingQueryProgress.stateOperators`. A delay-independent state
  * ceiling (state ≈ whole corpus at every delay) would mean eviction is
  * broken; the expected shape is monotone growth with delay, saturating
  * at the full-span delay. */
object StreamStateProbe {

  private def writeSlices(df: DataFrame, dir: String, tsCol: String,
      slices: Int, loMs: Long, hiMs: Long): Unit = {
    new java.io.File(dir).mkdirs()
    val width = math.max(1L, (hiMs - loMs) / slices + 1L)
    val mt0 = 1700000000000L
    (0 until slices).foreach { i =>
      val lo = loMs + i * width
      val hi = lo + width
      val slice = df.filter(
        col(tsCol).cast("long") * 1000L >= lo &&
          col(tsCol).cast("long") * 1000L < hi)
      val tmpd = s"$dir/../tmp_slice"
      slice.coalesce(1).write.mode("overwrite").parquet(tmpd)
      val part = new java.io.File(tmpd).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir, f"s$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      require(dst.setLastModified(mt0 + i * 60000L),
        s"could not pin mtime on $dst")
    }
  }

  private def maxState(q: org.apache.spark.sql.streaming.StreamingQuery)
      : (Long, Long, Long) = {
    val progs = q.recentProgress.toSeq
    val rows = progs.map(_.stateOperators.map(_.numRowsTotal).sum)
    val bytes = progs.map(_.stateOperators.map(_.memoryUsedBytes).sum)
    (if (rows.isEmpty) 0L else rows.max,
      if (bytes.isEmpty) 0L else bytes.max, progs.size.toLong)
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(32)
    val slices = if (args.length > 1) args(1).toInt else 16
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/sfx$factor"
    val spark = Session.local()
    Replicate.build(spark, src, dst, factor)

    val ev = Tables.load(spark, dst, "events")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").as("ts"), col("event_type"))
    val mm = ev.agg(min("ts"), max("ts")).collect()(0)
    val (loMs, hiMs) =
      (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
    val spanDays = (hiMs - loMs) / 86400000L + 1
    val provider = spark.conf.getOption(
        "spark.sql.streaming.stateStore.providerClass")
      .map(c => if (c.contains("RocksDB")) "rocksdb" else c)
      .getOrElse("heap")
    println(s"[streamstate] events=${ev.count()} span=${spanDays}d " +
      s"slices=$slices factor=$factor provider=$provider")

    val delays = Seq(
      math.max(1L, spanDays / 16), math.max(2L, spanDays / 4),
      spanDays + 2).distinct

    // ---- stream-stream LEFT OUTER join (7-day range), per delay
    val base = s"/tmp/stream_state_probe_x$factor"
    graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("c_ts"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("b_user"), col("ts").as("p_ts"))
    delays.foreach { d =>
      val dir = s"$base/join_d$d"
      writeSlices(clicks, s"$dir/clicks", "c_ts", slices, loMs, hiMs)
      writeSlices(buys, s"$dir/buys", "p_ts", slices, loMs, hiMs)
      val cs = spark.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/clicks")
        .withWatermark("c_ts", s"$d days")
      val bs = spark.readStream.schema(buys.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/buys")
        .withWatermark("p_ts", s"$d days")
      val q = cs.join(bs,
          col("user_id") === col("b_user")
            && col("p_ts") >= col("c_ts")
            && col("p_ts") <= col("c_ts") + expr("interval 7 days"),
          "leftOuter")
        .select("click_id", "user_id", "purchase_id")
        .writeStream.format("noop")
        .option("checkpointLocation", s"$dir/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val (rows, bytes, nb) = maxState(q)
      println(f"[streamstate] join_outer  delay=${d}%4dd  " +
        f"maxStateRows=$rows%10d  maxStateMB=${bytes / 1e6}%8.1f  " +
        f"batches=$nb")
    }

    // ---- append-mode session windows (30-minute gap), per delay
    delays.foreach { d =>
      val dir = s"$base/sess_d$d"
      writeSlices(ev.select("event_id", "user_id", "ts"), s"$dir/events",
        "ts", slices, loMs, hiMs)
      val src2 = spark.readStream
        .schema(ev.select("event_id", "user_id", "ts").schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/events")
        .withWatermark("ts", s"$d days")
      val q = src2
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_events"))
        .writeStream.outputMode("append").format("noop")
        .option("checkpointLocation", s"$dir/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val (rows, bytes, nb) = maxState(q)
      println(f"[streamstate] session_app delay=${d}%4dd  " +
        f"maxStateRows=$rows%10d  maxStateMB=${bytes / 1e6}%8.1f  " +
        f"batches=$nb")
    }
    spark.stop()
  }
}
