package graft.similarity

import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark

/** EditJoin's pruned candidate set must lose nothing: compare against a
  * brute-force all-pairs reference on randomized corpora that
  * deliberately mix short strings (below the gram-bound floor), empty
  * strings, exact duplicates, and near-twins. */
object EditJoinSpec extends Properties("editjoin") {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(10)

  private def editDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  private def brute(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      ed = editDist(sa, sb)
      if ed <= d
    } yield (ia, ib, ed)).toSet

  private def run(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    EditJoin.selfJoin(rows.toDF("id", "s"), "id", "s", maxDist = d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  property("hand-built corpus with shorts, twins, empties") = {
    val rows = Seq(
      1L -> "the quick brown fox jumps",
      2L -> "the quick brown fox jumped", // ed 2 from 1
      3L -> "the quick brown fox jumps",  // exact dup of 1
      4L -> "a completely different title here",
      5L -> "cat",                        // short: below gram floor
      6L -> "cart",                       // ed 1 from 5, still short
      7L -> "ca",                         // ed 1 from 5
      8L -> "the quick brawn fox jumps",  // ed 1 from 1
      9L -> "")                           // empty string edge
    Prop(run(rows, 2) == brute(rows, 2))
  }

  private val word = Gen.oneOf("data", "part", "row", "agg", "scan", "cat",
    "car", "x", "tab", "table")
  private val str = Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))
  private val corpus = Gen.choose(5, 24).flatMap(n => Gen.listOfN(n, str))

  property("randomized: selfJoin == all-pairs for d in 1..3") =
    Prop.forAllNoShrink(corpus, Gen.choose(1, 3)) { (ss, d) =>
      val rows = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      run(rows, d) == brute(rows, d)
    }

  private def bruteCross(l: Seq[(Long, String)], r: Seq[(Long, String)],
      d: Int): Set[(Long, Long, Int)] =
    (for {
      (il, sl) <- l; (ir, sr) <- r
      ed = editDist(sl, sr)
      if ed <= d
    } yield (il, ir, ed)).toSet

  property("persisted-index serving == direct cross join, bit for bit") =
    Prop.forAllNoShrink(corpus, corpus, Gen.choose(1, 3)) { (as, bs, d) =>
      val l = as.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val r = bs.zipWithIndex.map { case (s, i) => (1000L + i, s) }
      val direct = EditJoin.join(l.toDF("id", "s"), r.toDF("id", "s"),
          "id", "s", maxDist = d)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      val store = new graft.pipeline.Store(spark,
        s"/tmp/graft_ss/p${ProcessHandle.current().pid}/" +
          s"editjoin_idx_${System.nanoTime()}")
      EditJoin.buildIndex(store, "fz", r.toDF("id", "s"), "id", "s", d)
      val served = EditJoin.assignAgainstIndex(store, "fz",
          l.toDF("id", "s"), "id", "s", d)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      served == direct && direct == bruteCross(l, r, d)
    }

  property("randomized cross-corpus: join == all-pairs for d in 1..3") =
    Prop.forAllNoShrink(corpus, corpus, Gen.choose(1, 3)) { (as, bs, d) =>
      val l = as.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val r = bs.zipWithIndex.map { case (s, i) => (1000L + i, s) }
      val got = EditJoin.join(l.toDF("id", "s"), r.toDF("id", "s"),
          "id", "s", maxDist = d)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      got == bruteCross(l, r, d)
    }
}
