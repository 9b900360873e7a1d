package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.expressions.JaroWinklerImpl

/** Exactness of the pruned Jaro-Winkler join vs in-memory brute force:
  * the prefix filter and length band must PRUNE, never DROP — for every
  * threshold, the join equals the all-pairs answer. */
class JaroWinklerJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    BigDecimal(JaroWinklerImpl.score(a.getBytes("UTF-8"), b.getBytes("UTF-8")))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // adversarial mix: identicals, shared prefixes (boost regime), odd
  // transposition counts, repeats (multiset occ indexing), length skew,
  // short strings, a duplicate id pair
  private val names = Seq(
    1L -> "katrina", 2L -> "katrinna", 3L -> "catrina", 4L -> "karina",
    5L -> "wilma", 6L -> "wilhelmina", 7L -> "sandy", 8L -> "sandi",
    9L -> "maria", 10L -> "mariah", 11L -> "maria", 12L -> "ida",
    13L -> "idalia", 14L -> "aaaaab", 15L -> "aaaaba", 16L -> "x",
    17L -> "xy", 18L -> "column line sort key window",
    19L -> "column key sort window stream", 20L -> "harvey")

  private def brute(threshold: Double): Set[(Long, Long, Double)] =
    (for {
      (ia, sa) <- names; (ib, sb) <- names
      if ia < ib
      s = jw(sa, sb) if s >= threshold
    } yield (ia, ib, s)).toSet

  test("selfJoin equals all-pairs brute force at several thresholds") {
    val df = names.toDF("id", "name")
    for (t <- Seq(0.75, 0.85, 0.9, 0.95)) {
      val got = JaroWinklerJoin.selfJoin(df, "id", "name", t)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == brute(t), s"threshold $t")
    }
  }

  test("power-of-two lengths: bucket boundaries land exactly on 2^k and " +
      "no pair is dropped") {
    // at threshold 0.9, r = rB = 0.5 exactly: a prober of length L scans
    // buckets [floor(log2(L/2)), floor(log2(2L))] — BOTH endpoints are
    // exact powers of two for these lengths, the regime where a libm
    // floor(log2()) can flip by one ulp and silently drop a candidate
    // (the resident side sits exactly on a bucket edge). Brute-force
    // equality pins completeness through the exact-integer bucketing.
    val p2 = Seq(
      1L -> "ab", 2L -> "abcd", 3L -> "abcdefgh",
      4L -> "abcdefghijklmnop", 5L -> "abcdefghijklmnopqrstuvwxyzabcdef",
      6L -> "abce", 7L -> "abcdefgi", 8L -> "abcdefghijklmnoq",
      9L -> "abcdefghijklmnopqrstuvwxyzabcdeg")
    val want = (for {
      (ia, sa) <- p2; (ib, sb) <- p2
      if ia < ib
      s = jw(sa, sb) if s >= 0.9
    } yield (ia, ib, s)).toSet
    assert(want.nonEmpty, "fixture must produce matches at 0.9")
    val got = JaroWinklerJoin.selfJoin(p2.toDF("id", "name"),
        "id", "name", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("cross join equals brute force, including identical cross-side strings") {
    val left = names.filter(_._1 % 2 == 1).toDF("id", "name")
    val right = names.filter(_._1 % 2 == 0).toDF("id", "name")
    val t = 0.85
    val want = (for {
      (il, sl) <- names if il % 2 == 1
      (ir, sr) <- names if ir % 2 == 0
      s = jw(sl, sr) if s >= t
    } yield (il, ir, s)).toSet
    val got = JaroWinklerJoin.join(left, right, "id", "name", t)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("bestMatch picks highest rounded score, ties to smallest id") {
    val probes = Seq(100L -> "maria").toDF("id", "name")
    val corpus = names.toDF("id", "name")
    val got = JaroWinklerJoin.bestMatch(probes, corpus, "id", "name", 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    // ids 9 and 11 are both exactly "maria" (jw 1.0): tie goes to 9
    assert(got == Seq((100L, 9L, 1.0)))
  }

  test("persisted-index serving equals the direct cross join, bit for bit") {
    val base = s"/tmp/graft_ss/p${ProcessHandle.current().pid}/jwidx_spec"
    graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
    val store = new graft.pipeline.Store(spark, base)
    val corpus = names.filter(_._1 % 2 == 0).toDF("id", "name")
    val probes = names.filter(_._1 % 2 == 1).toDF("id", "name")
    JaroWinklerJoin.buildIndex(store, "n", corpus, "id", "name", 0.85)
    val served = JaroWinklerJoin.assignAgainstIndex(store, "n", probes,
        "id", "name", 0.85)
      .as[(Long, Long, Double)].collect().toSet
    val direct = JaroWinklerJoin.join(probes, corpus, "id", "name", 0.85)
      .as[(Long, Long, Double)].collect().toSet
    assert(served == direct)
    val best = JaroWinklerJoin.bestMatchIndexed(store, "n", probes,
        "id", "name", 0.85)
      .as[(Long, Long, Double)].collect().toSet
    val bestDirect = JaroWinklerJoin.bestMatch(probes, corpus, "id",
        "name", 0.85)
      .as[(Long, Long, Double)].collect().toSet
    assert(best == bestDirect)
    // threshold contract enforced at serve time
    intercept[IllegalArgumentException] {
      JaroWinklerJoin.assignAgainstIndex(store, "n", probes, "id",
        "name", 0.9)
    }
  }

  test("null and empty strings never match; threshold domain enforced") {
    val df = Seq((1L, "abc"), (2L, null), (3L, ""), (4L, "abc"))
      .toDF("id", "name")
    val got = JaroWinklerJoin.selfJoin(df, "id", "name", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 4L, 1.0)))
    intercept[IllegalArgumentException] {
      JaroWinklerJoin.selfJoin(df, "id", "name", 0.7)
    }
  }

  // ---- approximate (sorted-neighborhood) mode

  test("selfJoinApprox is a subset of selfJoin and EQUALS it when the " +
      "window covers the whole corpus") {
    val df = names.toDF("id", "name")
    for (t <- Seq(0.85, 0.9)) {
      val exact = brute(t)
      val cover = JaroWinklerJoin.selfJoinApprox(df, "id", "name", t,
          window = names.size)
        .as[(Long, Long, Double)].collect().toSet
      assert(cover == exact, s"full-window approx must equal exact at $t")
      val narrow = JaroWinklerJoin.selfJoinApprox(df, "id", "name", t,
          window = 2)
        .as[(Long, Long, Double)].collect().toSet
      assert(narrow.subsetOf(exact),
        s"approx pairs must all be exact pairs at $t (precision 1)")
      // identical strings always pair regardless of window (exact branch)
      assert(narrow.contains((9L, 11L, 1.0)))
    }
  }

  test("joinApprox and bestMatchApprox equal their exact forms at a " +
      "covering window, subset below it") {
    val left = names.filter(_._1 % 2 == 1).toDF("id", "name")
    val right = names.filter(_._1 % 2 == 0).toDF("id", "name")
    val t = 0.85
    val exact = JaroWinklerJoin.join(left, right, "id", "name", t)
      .as[(Long, Long, Double)].collect().toSet
    val cover = JaroWinklerJoin.joinApprox(left, right, "id", "name", t,
        window = 2 * names.size)
      .as[(Long, Long, Double)].collect().toSet
    assert(cover == exact)
    val narrow = JaroWinklerJoin.joinApprox(left, right, "id", "name", t,
        window = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(narrow.subsetOf(exact))
    val bm = JaroWinklerJoin.bestMatchApprox(left, right, "id", "name", t,
        window = 2 * names.size)
      .as[(Long, Long, Double)].collect().toSet
    val bmExact = JaroWinklerJoin.bestMatch(left, right, "id", "name", t)
      .as[(Long, Long, Double)].collect().toSet
    assert(bm == bmExact)
  }

  test("pairs budget guard: fails loudly past the budget, invisible " +
      "when it passes") {
    val df = names.toDF("id", "name")
    val e = intercept[IllegalStateException] {
      JaroWinklerJoin.selfJoin(df, "id", "name", 0.9,
        maxCandidatePairs = 3)
    }
    assert(e.getMessage.contains("maxCandidatePairs=3"))
    assert(e.getMessage.contains("selfJoinApprox"),
      "the failure must name the approximate escape hatch")
    // a generous budget changes nothing
    val guarded = JaroWinklerJoin.selfJoin(df, "id", "name", 0.9,
        maxCandidatePairs = 1000000L)
      .as[(Long, Long, Double)].collect().toSet
    assert(guarded == brute(0.9))
    // cross form too
    val left = names.filter(_._1 % 2 == 1).toDF("id", "name")
    intercept[IllegalStateException] {
      JaroWinklerJoin.join(left, df, "id", "name", 0.9,
        maxCandidatePairs = 3)
    }
    val crossOk = JaroWinklerJoin.join(left, df, "id", "name", 0.9,
        maxCandidatePairs = 1000000L)
      .as[(Long, Long, Double)].collect().toSet
    val crossExact = JaroWinklerJoin.join(left, df, "id", "name", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(crossOk == crossExact)
  }

  test("default-on estimate: no budget set -> loud WARN past the " +
      "advisory threshold, results bit-identical (round-17 contract)") {
    def mk(c: Int, len: Int) = ('a' + c % 26).toChar.toString * len
    val hot = (0 until 60).map(i =>
      (i.toLong, mk(i, 32 + i % 16))).toDF("id", "name")
    val out = new java.io.ByteArrayOutputStream()
    sys.props("graft.jw.warnPairs") = "2000"
    val got = try Console.withOut(new java.io.PrintStream(out, true)) {
      // NO maxCandidatePairs: must proceed (warn, not fail)
      JaroWinklerJoin.selfJoin(hot, "id", "name", 0.9)
        .as[(Long, Long, Double)].collect().toSet
    } finally sys.props.remove("graft.jw.warnPairs")
    val warn = out.toString
    assert(warn.contains("WARN JaroWinklerJoin.selfJoin"), warn)
    assert(warn.contains("sorted-neighborhood"),
      "the warning must name the implemented escape hatch accurately")
    // unguarded re-run (threshold back at the 100M default): same rows
    val plain = JaroWinklerJoin.selfJoin(hot, "id", "name", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == plain)
  }

  test("guard estimate tracks the length histogram: a hot length band " +
      "trips a budget the uniform corpus clears") {
    // DISTINCT strings (varying char so the exact-collapse keeps all 60):
    // uniform spreads over 10 log2 length buckets (6 strings each,
    // estimate ~6*18*10 ~ 1080); hot packs all 60 into ONE bucket
    // (lengths 32..47, estimate 60*60 = 3600)
    def mk(c: Int, len: Int) = ('a' + c % 26).toChar.toString * len
    val uniform = (0 until 60).map(i =>
      (i.toLong, mk(i, 1 << (i % 10)))).toDF("id", "name")
    val hot = (0 until 60).map(i =>
      (i.toLong, mk(i, 32 + i % 16))).toDF("id", "name")
    // budget sized between the two estimates: uniform passes, hot trips
    val budget = 2000L
    JaroWinklerJoin.selfJoin(uniform, "id", "name", 0.9,
      maxCandidatePairs = budget).collect()
    intercept[IllegalStateException] {
      JaroWinklerJoin.selfJoin(hot, "id", "name", 0.9,
        maxCandidatePairs = budget)
    }
  }
}
