package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.Store

/** The persisted fuzzy index's append lifecycle: decisions against the
  * frozen index, appended novels visible to the next assign, replay
  * fencing (clearBatch + same-tag re-append), and the loud partial-batch
  * guard. */
class FuzzyIndexLifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore(tag: String): Store = {
    val base = s"/tmp/graft-test-fuzzylc-$tag"
    graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
    new Store(spark, base)
  }

  private val corpus = Seq(
    1L -> "the quick brown fox jumps",
    2L -> "a completely different title here").toDF("id", "s")

  test("decisions: exact, near, novel with batch-local closure") {
    val st = freshStore("dec")
    EditJoin.buildIndex(st, "x", corpus, "id", "s", maxDist = 2)
    val batch = Seq(
      10L -> "the quick brown fox jumps",  // exact vs corpus 1
      11L -> "the quick brown fox jumped", // ed 2 vs corpus 1 -> near
      12L -> "zebra stripes pattern noise",
      13L -> "zebra stripes pattern nois",  // ed 1 from 12 -> same group
      14L -> "zebra stripes pattern noise"  // exact copy of 12
    ).toDF("id", "s")
    val got = EditJoin.assignDecisions(st, "x", batch, "id", "s",
        maxDist = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(10L) == ((1L, "exact")))
    assert(got(11L) == ((1L, "near")))
    assert(got(12L) == ((12L, "novel")))
    assert(got(13L) == ((12L, "novel"))) // closure label, not self
    assert(got(14L) == ((12L, "novel"))) // exact-collapse inherits rep
    assert(got.size == 5)
  }

  test("appended novels are visible to the next assign; replay is clean") {
    val st = freshStore("app")
    EditJoin.buildIndex(st, "x", corpus, "id", "s", maxDist = 2)
    val novel = Seq(12L -> "zebra stripes pattern noise").toDF("id", "s")
    EditJoin.appendToIndex(st, "x", novel, "id", "s", "0", maxDist = 2)
    // a near-copy of the appended string now resolves against it
    val next = Seq(20L -> "zebra stripes pattern nois").toDF("id", "s")
    def decide() = EditJoin.assignDecisions(st, "x", next, "id", "s",
        maxDist = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(decide() == Set((20L, 12L, "near")))
    // replay of tag 0 (crash-recovery path): clear + re-append with the
    // SAME tag must not duplicate index rows — the decision is unchanged
    EditJoin.clearBatch(st, "x", "0")
    EditJoin.appendToIndex(st, "x", novel, "id", "s", "0", maxDist = 2)
    assert(decide() == Set((20L, 12L, "near")))
    // after clearBatch alone the append is gone entirely
    EditJoin.clearBatch(st, "x", "0")
    assert(decide() == Set((20L, 20L, "novel")))
  }

  test("a partial (uncommitted) append fails the next assign loudly") {
    val st = freshStore("partial")
    EditJoin.buildIndex(st, "x", corpus, "id", "s", maxDist = 2)
    val novel = Seq(12L -> "zebra stripes pattern noise").toDF("id", "s")
    EditJoin.appendToIndex(st, "x", novel, "id", "s", "0", maxDist = 2)
    // simulate a crash between table publish and commit marker
    graft.dedup.IndexCommits.unmark(st, "x", "0")
    val batch = Seq(20L -> "anything at all").toDF("id", "s")
    val ex = intercept[IllegalArgumentException] {
      EditJoin.assignDecisions(st, "x", batch, "id", "s", maxDist = 2)
    }
    assert(ex.getMessage.contains("0"))
  }

  test("append enforces the build-time (maxDist, q) contract") {
    val st = freshStore("meta")
    EditJoin.buildIndex(st, "x", corpus, "id", "s", maxDist = 2)
    intercept[IllegalArgumentException] {
      EditJoin.appendToIndex(st, "x",
        Seq(12L -> "zzz").toDF("id", "s"), "id", "s", "0", maxDist = 3)
    }
  }
}
