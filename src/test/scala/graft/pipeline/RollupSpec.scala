package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark

/** The property incremental maintenance rests on: the stored partials
  * form a commutative monoid, so ANY batching of the input — one shot,
  * many ticks, any order — must merge to the same rollup. */
object RollupProps extends Properties("rollup") {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def partials(rows: Seq[(String, Long)]) =
    rows.toDF("k", "v")
      .groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(DecimalType(18, 2))).as("s"))

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet

  private val rows = (1 to 200).map(i => (s"k${i % 7}", (i * 31 % 101).toLong))
  private lazy val oneShot = asSet(partials(rows))

  property("merge is invariant to how the input was batched") =
    Prop.forAll(Gen.chooseNum(1, 5), Gen.chooseNum(0, 1000)) {
      (nBatches: Int, seed: Int) =>
        val rnd = new scala.util.Random(seed)
        val batches = rows.groupBy(_ => rnd.nextInt(nBatches)).values.toSeq
        val merged = Rollup.merge(
          batches.map(partials).reduce(_ unionByName _), Seq("k"))
        asSet(merged) == oneShot
    }

  property("applyDelta ticks accumulate through the store") = Prop.secure {
    val store = new Store(spark,
      s"/tmp/graft_test/rollup_${System.nanoTime()}")
    val (a, b, c) = (rows.take(70), rows.slice(70, 140), rows.drop(140))
    Seq(a, b, c).foreach(batch =>
      Rollup.applyDelta(store, "r", partials(batch), Seq("k")))
    asSet(store.read("r", partials(rows).schema)) == oneShot
  }
}
