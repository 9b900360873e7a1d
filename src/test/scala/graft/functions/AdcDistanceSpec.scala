package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.expressions.AdcDistance.adcNative

/** Native ADC lookup sum vs the interpreted HOF fold it replaced, plus
  * the NULL contract on corrupt inputs. */
class AdcDistanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bit-identical to the aggregate/element_at fold on generated data") {
    val m = 8; val k = 16
    val g = spark.range(500).select(
      col("id"),
      transform(sequence(lit(0), lit(m - 1)),
        s => pmod(col("id") * 7 + s * 3, lit(k)).cast("int")).as("codes"),
      transform(sequence(lit(0), lit(m - 1)), s =>
        transform(sequence(lit(0), lit(k - 1)),
          c => (col("id") + s * 31 + c * 17).cast("long"))).as("dt"))
    val hof = aggregate(sequence(lit(0), lit(m - 1)), lit(0L),
      (acc, s) => acc +
        element_at(element_at(col("dt"), s + 1),
          element_at(col("codes"), s + 1) + 1))
    val diff = g.select(adcNative(col("codes"), col("dt")).as("nat"),
        hof.as("hof"))
      .filter(col("nat") =!= col("hof") || col("nat").isNull)
      .count()
    assert(diff == 0L)
  }

  test("nulls on mismatched m, out-of-range code, or null input") {
    val rows = Seq(
      (Seq(0, 1), Seq(Seq(10L, 20L), Seq(30L, 40L)), Some(50L)), // ok
      (Seq(0), Seq(Seq(10L, 20L), Seq(30L, 40L)), None),         // |codes| != |dt|
      (Seq(0, 9), Seq(Seq(10L, 20L), Seq(30L, 40L)), None)       // code out of range
    ).toDF("codes", "dt", "expect")
    val got = rows.select(adcNative(col("codes"), col("dt")).as("got"),
        col("expect")).collect()
    got.foreach { r =>
      val e = if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))
      val v = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
      assert(v == e, r.toString)
    }
    assert(rows.select(adcNative(lit(null).cast("array<int>"),
      col("dt"))).head().isNullAt(0))
  }
}
