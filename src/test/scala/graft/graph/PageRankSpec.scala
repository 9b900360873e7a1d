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
}
