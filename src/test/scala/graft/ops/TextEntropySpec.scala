package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Character-entropy bounds (engine parity is the q_text_entropy gate's
  * job): 0 <= H <= log2(distinct chars), with equality at the edges for
  * one-symbol and uniform documents. */
class TextEntropySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def entropyOf(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val base = s"/tmp/graft_ss/p${ProcessHandle.current().pid}/entropy_${System.nanoTime()}"
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"),
        org.apache.spark.sql.functions.lit("en").as("lang"),
        org.apache.spark.sql.functions.lit("srcX").as("source"),
        org.apache.spark.sql.functions.length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$base/documents.parquet")
    TextOps.textEntropy(spark, base).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("an empty document emits NO row (sequence(1,0) would count down)") {
    val out = entropyOf(Seq((1L, ""), (2L, "ab")))
    assert(!out.contains(1L), out.toString)
    assert(out(2L) == ((2L, 2L, 1000000L)))
  }

  test("entropy is 0 for one-symbol docs, log2(k) for uniform, bounded otherwise") {
    val out = entropyOf(Seq(
      (1L, "aaaaaaaa"),          // one symbol -> H = 0
      (2L, "abababab"),          // uniform over 2 -> H = 1 bit
      (3L, "abcdabcdabcdabcd"),  // uniform over 4 -> H = 2 bits
      (4L, "aab")))              // skewed -> 0 < H < log2(2)... = h(1/3)
    assert(out(1L) == ((8L, 1L, 0L)))
    assert(out(2L) == ((8L, 2L, 1000000L)))
    assert(out(3L) == ((16L, 4L, 2000000L)))
    val (n4, k4, h4) = out(4L)
    assert(n4 == 3L && k4 == 2L)
    assert(h4 > 0L && h4 < 1000000L)
    // h(1/3) = 0.918295... in micro-bits; each of the 2 terms floors at
    // most ~2 micro below the real value (2^-20 log quantum + the DIV)
    assert(h4 <= 918296L && h4 >= 918290L, h4.toString)
  }
}
