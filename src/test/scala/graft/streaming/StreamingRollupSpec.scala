package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.{Rollup, Store}

/** Streaming incremental-view maintenance: each micro-batch's partial
  * aggregate folds into the stored rollup via `foreachBatch` +
  * [[Rollup.applyDelta]] — the streaming form of the q_store_rollup
  * lifecycle. The monoid contract (RollupProps) is what makes the
  * at-micro-batch-granularity merge equal the one-shot aggregate. */
class StreamingRollupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def partials(rows: DataFrame): DataFrame = rows
    .groupBy("k")
    .agg(count(lit(1)).as("n"),
      sum(col("v").cast(DecimalType(18, 2))).as("s"))

  test("foreachBatch rollup ticks equal the one-shot batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val store = new Store(spark,
      s"/tmp/graft_test/stream_rollup_${System.nanoTime()}")
    val input = MemoryStream[(String, Long)]
    val q = input.toDF().toDF("k", "v")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // partial-aggregate the batch, merge into the stored state —
        // the corpus-sized history is never re-read
        Rollup.applyDelta(store, "r", partials(batch), Seq("k"))
        ()
      }
      .start()
    try {
      val all = (1 to 120).map(i => (s"k${i % 4}", (i * 13 % 37).toLong))
      input.addData(all.take(40): _*); q.processAllAvailable()
      input.addData(all.slice(40, 90): _*); q.processAllAvailable()
      input.addData(all.drop(90): _*); q.processAllAvailable()
      val want = partials(all.toDF("k", "v")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
      val got = store.read("r", partials(all.toDF("k", "v")).schema)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
      assert(got == want)
    } finally q.stop()
  }
}
