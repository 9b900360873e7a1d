package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.Store

/** The persisted-index lifecycle: build → assign → append → assign.
  * The q_dedup_incremental_indexed gate diffs build+assign against the
  * from-scratch DuckDB oracle; this spec covers what the gate can't —
  * that APPENDING accepted novel docs makes the next batch resolve
  * against them, and that appends never touch existing index rows. */
class CorpusIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def store() = new Store(spark,
    s"/tmp/graft_ss/p${ProcessHandle.current().pid}/cidx_spec_${System.nanoTime()}")

  private val corpus = Seq(
    (10L, "alpha beta gamma delta epsilon zeta eta theta"),
    (11L, "one two three four five six seven eight nine ten"),
    (12L, "spark catalyst tungsten codegen adaptive execution engine"))
    .toDF("doc_id", "text")

  test("assign after append resolves the second batch against the first") {
    val st = store()
    CorpusIndex.build(st, "c", corpus, "text", "doc_id")

    // batch 1: one exact corpus dup, one novel doc
    val b1 = Seq(
      (20L, "one two three four five six seven eight nine ten"),
      (21L, "totally novel content about persisted banded indexes here"))
      .toDF("doc_id", "text")
    val r1 = CorpusIndex.assign(st, "c", b1, "text", "doc_id",
        threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(r1(20L) == ((11L, "exact")))
    assert(r1(21L) == ((21L, "novel")))

    // append the accepted novel representative (its own group rep)
    CorpusIndex.append(st, "c",
      b1.filter(col("doc_id") === 21L), "text", "doc_id", batchTag = "b1")

    // batch 2: an exact copy and a near-dup of the appended doc
    val b2 = Seq(
      (30L, "totally novel content about persisted banded indexes here"),
      (31L, "totally novel content about persisted banded indexes there"))
      .toDF("doc_id", "text")
    val r2 = CorpusIndex.assign(st, "c", b2, "text", "doc_id",
        threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(r2(30L) == ((21L, "exact")), r2)
    assert(r2(31L) == ((21L, "near")), r2)
  }

  test("append only adds rows; prior index data is untouched") {
    val st = store()
    CorpusIndex.build(st, "c", corpus, "text", "doc_id")
    val before = spark.read.parquet(st.path("c_shingles")).count()
    CorpusIndex.append(st, "c",
      Seq((40L, "fresh appended payload with brand new shingles"))
        .toDF("doc_id", "text"), "text", "doc_id", batchTag = "b1")
    val after = spark.read.parquet(st.path("c_shingles"))
    assert(after.count() > before)
    assert(after.filter(col("id") < 40L).count() == before)
    // replaying the SAME batch tag republishes instead of duplicating
    val n1 = after.count()
    CorpusIndex.append(st, "c",
      Seq((40L, "fresh appended payload with brand new shingles"))
        .toDF("doc_id", "text"), "text", "doc_id", batchTag = "b1")
    assert(spark.read.parquet(st.path("c_shingles")).count() == n1)
  }

  test("assign rejects mismatched signature-space parameters") {
    val st = store()
    CorpusIndex.build(st, "c", corpus, "text", "doc_id",
      numHashes = 32, bands = 8)
    val b = Seq((50L, "whatever text this is")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      CorpusIndex.assign(st, "c", b, "text", "doc_id", numHashes = 64)
    }
    assert(e.getMessage.contains("was built with"))
  }
}
