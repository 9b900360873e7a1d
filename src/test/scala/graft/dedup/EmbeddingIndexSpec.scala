package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.Store

/** The persisted EMBEDDING-index lifecycle: build → assign → append →
  * assign, plus the commit-marker and compaction contracts it shares
  * with [[CorpusIndex]] (the q_dedup_embedding_incremental gate diffs
  * build+assign against DuckDB; this spec covers the append path the
  * gate can't). */
class EmbeddingIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def store() = new Store(spark,
    s"/tmp/graft_ss/p${ProcessHandle.current().pid}/eidx_spec_${System.nanoTime()}")

  // three well-separated directions in 8-d
  private def vec(axis: Int, eps: Double = 0.0): Seq[Double] =
    Seq.tabulate(8)(j => (if (j == axis) 1.0 else 0.0)
      + (if (j == (axis + 1) % 8) eps else 0.0))

  private val corpus = Seq(
    (10L, vec(0)), (11L, vec(2)), (12L, vec(4)))
    .toDF("vec_id", "embedding")

  test("assign after append resolves the second batch against the first") {
    val st = store()
    EmbeddingIndex.build(st, "e", corpus, "embedding", "vec_id", dim = 8,
      bitsPerTable = 4, tables = 6)

    // batch 1: one near-dup of corpus 10, one novel direction
    val b1 = Seq((20L, vec(0, 0.01)), (21L, vec(6)))
      .toDF("vec_id", "embedding")
    val r1 = EmbeddingIndex.assign(st, "e", b1, "embedding", "vec_id",
        threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(r1(20L) == ((10L, "near")), r1)
    assert(r1(21L) == ((21L, "novel")), r1)

    // append the accepted novel; a near-dup of it must now match
    EmbeddingIndex.append(st, "e",
      b1.filter(col("vec_id") === 21L), "embedding", "vec_id",
      batchTag = "b1")
    val b2 = Seq((30L, vec(6, 0.01))).toDF("vec_id", "embedding")
    val r2 = EmbeddingIndex.assign(st, "e", b2, "embedding", "vec_id",
        threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(r2(30L) == ((21L, "near")), r2)

    // replaying the SAME tag republishes instead of duplicating
    val n1 = spark.read.parquet(st.path("e_buckets")).count()
    EmbeddingIndex.append(st, "e",
      b1.filter(col("vec_id") === 21L), "embedding", "vec_id",
      batchTag = "b1")
    assert(spark.read.parquet(st.path("e_buckets")).count() == n1)
  }

  test("marker-less append fails assign; compaction is invisible") {
    val st = store()
    EmbeddingIndex.build(st, "e", corpus, "embedding", "vec_id", dim = 8,
      bitsPerTable = 4, tables = 6)
    EmbeddingIndex.append(st, "e",
      Seq((40L, vec(6))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", batchTag = "bX")
    val probe = Seq((50L, vec(6, 0.01))).toDF("vec_id", "embedding")
    def decision() = EmbeddingIndex.assign(st, "e", probe,
        "embedding", "vec_id", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    val before = decision()
    assert(before == Set((50L, 40L, "near")))

    // forge a mid-append crash: the commit marker (written LAST) missing
    assert(new java.io.File(st.path("e_commits"), "bX").delete())
    val e = intercept[IllegalArgumentException] { decision() }
    assert(e.getMessage.contains("uncommitted append"))
    EmbeddingIndex.clearBatch(st, "e", "bX")
    EmbeddingIndex.append(st, "e",
      Seq((40L, vec(6))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", batchTag = "bX")
    assert(decision() == before)

    // compaction folds the batch drops and changes nothing observable
    EmbeddingIndex.compact(st, "e")
    Seq("e_vecs", "e_buckets").foreach { t =>
      val names = Option(new java.io.File(st.path(t)).listFiles())
        .getOrElse(Array.empty).map(_.getName)
      assert(names.exists(_.startsWith("compacted_")), s"$t not compacted")
      assert(!names.exists(_.startsWith("batch_")), s"$t keeps batch drops")
    }
    assert(decision() == before)
  }
}
