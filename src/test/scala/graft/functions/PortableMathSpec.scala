package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The portable-log2 contract: the column form, the Scala constant form
  * and (via the gates) the DuckDB CTE form are the SAME algorithm over
  * exact-IEEE ops, so they must agree bit-for-bit on every input. */
class PortableMathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("column log2Micro == Scala log2MicroConst on a dense input grid") {
    val pairs = for {
      num <- (1L to 300L) ++ Seq(1023L, 1024L, 1025L, 65535L, 65536L, 999999L)
      den <- Seq(1L, 2L, 3L, 7L, 10L, 64L, 100L) if den <= num
    } yield (num, den)
    val got = pairs.toDF("num", "den")
      .select(col("num"), col("den"),
        PortableMath.log2Micro(col("num"), col("den")).as("l"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (n, d) =>
      assert(got((n, d)) == PortableMath.log2MicroConst(n, d),
        s"mismatch at ($n, $d)")
    }
  }

  test("log2Micro is exact on powers of two and monotone in the ratio") {
    (0 to 20).foreach { e =>
      assert(PortableMath.log2MicroConst(1L << e, 1L) == e.toLong * 1048576L)
    }
    // floor semantics: value never exceeds the true log, never trails by
    // more than one 2^-20 quantum (checked against strict rational
    // bounds 2^acc <= (num/den)^(2^20) — here via the double log with a
    // generous margin, monotonicity carries the exactness)
    val vals = (2L to 2000L).map(n => PortableMath.log2MicroConst(n, 1L))
    assert(vals == vals.sorted)
    (2L to 2000L).foreach { n =>
      val t = math.log(n.toDouble) / math.log(2.0) * 1048576.0
      val got = PortableMath.log2MicroConst(n, 1L)
      assert(got <= t + 1 && got >= t - 2, s"n=$n got=$got true=$t")
    }
  }

  test("lnNano matches ln to the documented 1e-9-relative constant") {
    Seq((3L, 1L), (10L, 1L), (100L, 7L), (999L, 998L)).foreach {
      case (n, d) =>
        val got = PortableMath.log2MicroConst(n, d) * 693147181L / 1048576L
        val t = math.log(n.toDouble / d) * 1e9
        assert(math.abs(got - t) < 1500.0, s"($n,$d) got=$got true=$t")
    }
  }
}
