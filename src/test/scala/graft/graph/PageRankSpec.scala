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

  test("empty graph returns empty") {
    assert(ranks(Seq.empty, 3).isEmpty)
  }
}
