package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst"), iters).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

  test("symmetric 2-cycle keeps ranks equal and mass conserved-ish") {
    // 1<->2: every sweep each node keeps teleport + the other's damped
    // mass; by symmetry ranks stay equal at 1e12 forever (floor-exact:
    // 150e9 + (1e12*85 div 100) div 1 = 150e9 + 850e9 = 1e12).
    val got = ranks(Seq((1L, 2L), (2L, 1L)), 5)
    assert(got == Map(1L -> 1000000000000L, 2L -> 1000000000000L))
  }

  test("one sweep of the 2-chain matches the hand recurrence") {
    // 1->2: node 1 is pointed at by nobody; node 2 dangles.
    // damped = 850e9 each. dangling mass = node 2's 850e9, div N=2 =
    // 425e9 to everyone. rank'(1) = 150e9 + 425e9 = 575e9;
    // rank'(2) = 150e9 + 425e9 + 850e9 = 1425e9.
    val got = ranks(Seq((1L, 2L)), 1)
    assert(got == Map(1L -> 575000000000L, 2L -> 1425000000000L))
  }

  test("hub of a star outranks leaves and ranks are deterministic") {
    // leaves 2,3,4 all point at 1; 1 points back at 2 only.
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L))
    val a = ranks(edges, 5)
    val b = ranks(edges, 5)
    assert(a == b) // integer recurrence: bit-exact across runs
    assert(a(1L) > a(2L) && a(2L) > a(3L))
    assert(a(3L) == a(4L)) // symmetric leaves tie exactly
  }

  test("multi-edges collapse: duplicate edge rows don't double-count") {
    val once = ranks(Seq((1L, 2L), (2L, 1L)), 3)
    val dup = ranks(Seq((1L, 2L), (1L, 2L), (2L, 1L)), 3)
    assert(once == dup)
  }

  test("warm-start algebra: resume(run(E, k), j) == run(E, k + j)") {
    // the incremental contract reduces to this identity when the delta
    // is empty: k cold sweeps then j warm sweeps must equal k+j cold
    // sweeps bit-for-bit (integer recurrence, no drift)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val e = edges.toDF("src", "dst")
    val warm = PageRank.resume(e, Some(PageRank.run(e, 2)), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(warm == ranks(edges, 5))
  }

  test("warm-start with a delta: new nodes seed at StartMass") {
    // base 1->2; delta adds 3->1. After 1 warm sweep over the merged
    // graph from base ranks r(1)=575e9, r(2)=1425e9, r(3)=1e12 (new):
    //   damped: 488.75e9, 1211.25e9, 850e9; outdeg 1->2:1, 3->1:1
    //   dangling = node 2's 1211.25e9 div N=3 = 403.75e9
    //   rank'(1) = 150e9 + 403.75e9 + 850e9   = 1403.75e9
    //   rank'(2) = 150e9 + 403.75e9 + 488.75e9 = 1042.5e9
    //   rank'(3) = 150e9 + 403.75e9            = 553.75e9
    val base = PageRank.run(Seq((1L, 2L)).toDF("src", "dst"), 1)
    val merged = Seq((1L, 2L), (3L, 1L)).toDF("src", "dst")
    val got = PageRank.resume(merged, Some(base), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1403750000000L, 2L -> 1042500000000L,
      3L -> 553750000000L))
  }

  test("empty graph returns empty") {
    assert(ranks(Seq.empty, 3).isEmpty)
  }

  // ---- persisted-index append replay contract (the one RMW append in
  // the index family: the rank sweep is not idempotent, so replay
  // soundness rests on the pre-delta snapshot + intent/commit markers)

  private def freshStore(tag: String): graft.pipeline.Store = {
    val base = s"/tmp/graft-test-prlc-$tag"
    graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
    new graft.pipeline.Store(spark, base)
  }

  private def storedRanks(st: graft.pipeline.Store): Map[Long, Long] =
    spark.read.parquet(st.path("pr_ranks")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

  private val baseEdges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
  private val deltaEdges = Seq((4L, 1L), (1L, 4L))

  test("appendDelta: replay after commit is a no-op") {
    val st = freshStore("noop")
    PageRank.buildIndex(st, "pr", baseEdges.toDF("src", "dst"), 3)
    val delta = deltaEdges.toDF("src", "dst")
    PageRank.appendDelta(st, "pr", delta, "b1", sweeps = 2)
    val once = storedRanks(st)
    PageRank.appendDelta(st, "pr", delta, "b1", sweeps = 2)
    assert(storedRanks(st) == once) // second drive must not re-sweep
  }

  test("appendDelta: replay of a crash-after-ranks-write reproduces " +
      "the clean run") {
    // expected: the clean single-run outcome on a pristine store
    val clean = freshStore("clean")
    PageRank.buildIndex(clean, "pr", baseEdges.toDF("src", "dst"), 3)
    val delta = deltaEdges.toDF("src", "dst")
    PageRank.appendDelta(clean, "pr", delta, "b1", sweeps = 2)
    val expected = storedRanks(clean)

    // construct the worst crash point by hand: snapshots + intent
    // written, base edges AND ranks already mutated, commit marker
    // absent (the state the ADVICE scenario warm-started from)
    val st = freshStore("crash")
    PageRank.buildIndex(st, "pr", baseEdges.toDF("src", "dst"), 3)
    val upd = PageRank.updateWithDelta(st, "pr", delta, sweeps = 2)
      .localCheckpoint()
    val preDir = snapshotBothWithIntent(st, "b1")
    val merged = spark.read.parquet(st.path("pr_edges"))
      .unionByName(delta).distinct().localCheckpoint()
    st.write("pr_edges", merged)
    st.write("pr_ranks", upd)

    // re-drive the SAME batch: must seed from the snapshot, not the
    // mutated ranks, and land exactly on the clean-run vector
    PageRank.appendDelta(st, "pr", delta, "b1", sweeps = 2)
    assert(storedRanks(st) == expected)
    // and the batch is now committed + snapshot retired
    assert(graft.dedup.IndexCommits.committedTags(st, "pr").contains("b1"))
    assert(!new java.io.File(preDir, "_intent_b1").exists())
  }

  /** Build the post-intent crash state the way appendDelta does: both
    * pre-delta snapshots published, intent recording their file counts. */
  private def snapshotBothWithIntent(st: graft.pipeline.Store,
      tag: String): java.io.File = {
    val preRanks = new java.io.File(st.path("pr_ranks_pre"))
    val preEdges = new java.io.File(st.path("pr_edges_pre"))
    graft.pipeline.FsUtils.publishBatch(
      spark.read.parquet(st.path("pr_ranks")), preRanks.getPath, tag)
    graft.pipeline.FsUtils.publishBatch(
      spark.read.parquet(st.path("pr_edges")), preEdges.getPath, tag)
    def n(d: java.io.File) = Option(d.listFiles()).getOrElse(Array.empty)
      .count(_.getName.startsWith(s"batch_${tag}_"))
    java.nio.file.Files.write(
      new java.io.File(preRanks, s"_intent_$tag").toPath,
      s"${n(preRanks)} ${n(preEdges)}".getBytes("UTF-8"))
    preRanks
  }

  test("appendDelta: replay with the base edges table MISSING (crash " +
      "inside Store.write's delete-then-rename) reproduces the clean run") {
    val clean = freshStore("clean2")
    PageRank.buildIndex(clean, "pr", baseEdges.toDF("src", "dst"), 3)
    val delta = deltaEdges.toDF("src", "dst")
    PageRank.appendDelta(clean, "pr", delta, "b1", sweeps = 2)
    val expected = storedRanks(clean)

    val st = freshStore("edgeloss")
    PageRank.buildIndex(st, "pr", baseEdges.toDF("src", "dst"), 3)
    snapshotBothWithIntent(st, "b1")
    // Store.write deleted the old dir, then the process died: no _edges
    graft.pipeline.FsUtils.deleteRecursively(
      new java.io.File(st.path("pr_edges")))

    PageRank.appendDelta(st, "pr", delta, "b1", sweeps = 2)
    assert(storedRanks(st) == expected)
    // the base edge set was restored from the snapshot, delta included
    val edges = spark.read.parquet(st.path("pr_edges"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == (baseEdges ++ deltaEdges).toSet)
  }

  test("appendDelta: a lost snapshot under an existing intent fails " +
      "loudly instead of re-ranking a delta-only graph") {
    val st = freshStore("snaploss")
    PageRank.buildIndex(st, "pr", baseEdges.toDF("src", "dst"), 3)
    snapshotBothWithIntent(st, "b1")
    graft.pipeline.FsUtils.deleteRecursively(
      new java.io.File(st.path("pr_edges_pre")))
    val ex = intercept[IllegalArgumentException] {
      PageRank.appendDelta(st, "pr", deltaEdges.toDF("src", "dst"), "b1")
    }
    assert(ex.getMessage.contains("snapshot loss"))
    // base tables untouched by the failed replay
    assert(spark.read.parquet(st.path("pr_edges")).count() ==
      baseEdges.size)
  }
}
