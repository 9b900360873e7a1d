package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.JaroWinkler.jaroWinklerNative

/** Jaro-Winkler threshold similarity join — the name-matching record
  * linkage the reference performs when it resolves an incoming storm
  * name against the stored storm set by closest match
  * (tcdb/etl/process_storms.py:43-56, difflib closest-match selection;
  * generalized here to an exact thresholded similarity join + top-1).
  * Edit-distance joins serve this poorly: a 5-letter name at distance 2
  * is a weak match while Jaro-Winkler's prefix boost captures exactly
  * the "same name, trailing corruption" regime.
  *
  * Exact threshold semantics: every pair with
  * `round(jaro_winkler(a, b), 6) >= threshold` is returned — pruning
  * never drops a qualifying pair. Because the accept rounds to 6
  * digits, raw scores down to threshold − 5e-7 qualify; the pruning
  * chain is derived from that slackened θ so it is sound under the
  * rounded accept, not just the raw one. The chain (θ = threshold −
  * 5e-7, jw the classic Winkler form with boost scale p = 0.1 over
  * at most l = 4 prefix chars, boost applied only when jaro > 0.7):
  *
  *  1. jw ≤ 0.6·jaro + 0.4 when the boost applies (l ≤ 4, p = 0.1),
  *     and jw = jaro ≤ 0.7 < θ otherwise — so jw ≥ θ implies
  *     jaro ≥ j0 = (θ − 0.4) / 0.6.
  *  2. jaro ≤ (2 + min/max) / 3 for any pair (m ≤ min(|a|, |b|)), so
  *     the LENGTH BAND min/max ≥ r = 3·j0 − 2 holds (vacuous below
  *     θ ≈ 0.8).
  *
  * WHY no character-level candidate filter: the ED-Join-style
  * rarest-first prefix filter (which makes [[EditJoin]] sub-quadratic)
  * is provably near-vacuous here. jaro ≥ j0 only bounds the COMMON
  * CHARACTER MULTISET (≥ ~75% overlap at θ = 0.9), and on a ~30-symbol
  * alphabet with strings of a few dozen characters, nearly every string
  * pair shares several "rare" (char, occurrence) elements — measured at
  * sf0.1 (4756 distinct 28-char titles, θ = 0.9): the prefix filter
  * passed 11.21M of the 11.30M length-banded pairs (99.2%) while
  * inflating the verify to 53.6M collision rows (4.8× per pair). An
  * exact JW join at practical thresholds is inherently quadratic in
  * DISTINCT strings within the length band — the SemDedup bargain, made
  * affordable by the same two levers: exact-collapse first (name data
  * is duplicate-heavy; the quadratic runs on distinct strings only) and
  * in-task verification with nothing corpus-sized ever broadcast or
  * replicated per row.
  *
  * The candidate stage is therefore a SALTED LENGTH-BLOCKED self/cross
  * join: residents key by (log2 length bucket, salt); probers replicate
  * to each admissible partner bucket (±1 at θ ≥ 0.88) × every salt, so
  * the quadratic verify spreads evenly over `numShufflePartitions`
  * tasks as a plain equi-join — no cartesian, no single hot task, and
  * the shuffle is S·|distinct strings| rows of (id, len, str): LINEAR
  * in the corpus with a fixed fan-out. Each unordered pair meets in
  * EXACTLY ONE task (the resident's unique (bucket, salt)), so the
  * native codegen jw verify runs once per pair, in the join condition
  * (the round-13 A/B winner form). Thresholding and output use the
  * round-6 score (the q_fn_jaro_winkler convention).
  *
  * Two sound pre-verify filters run inside the join condition before
  * the kernel: the length band above, and the
  * [[graft.functions.expressions.CharSig]] byte-multiset overlap bound
  * (m matched chars ≤ the byte-multiset intersection; the capped
  * 64-bucket histogram bound kills 93.5% of length-banded pairs on the
  * sf0.1 fixture at ~1/20 the kernel's cost). Everything — lengths,
  * bands, buckets, histograms, the verify — is denominated in UTF-8
  * BYTES, matching the byte-level jw definition (DuckDB parity), so
  * the chain is exact for any input including multi-byte text.
  */
object JaroWinklerJoin {

  private def jwRounded(a: Column, b: Column): Column =
    round(jaroWinklerNative(a, b), 6)

  /** All pairs (id_a < id_b) with round(jw, 6) >= threshold.
    * Output: id_a, id_b, jw. Null/empty strings never match.
    *
    * `maxCandidatePairs` is the zipfian-regime circuit breaker: when set
    * (default unlimited — zero extra work), the banded candidate-pair
    * count is estimated up front from the per-bucket length histogram
    * (driver-bounded: <= ~64 buckets) and the join FAILS LOUDLY past the
    * budget instead of silently launching a hot-band quadratic (the
    * 32x-skew probe measured ~242M banded pairs from one hot length
    * band). When the guard passes, results are bit-identical to the
    * unguarded call. The escape hatch for corpora that trip it is
    * [[selfJoinApprox]]. */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
      threshold: Double, maxCandidatePairs: Long = Long.MaxValue): DataFrame = {
    require(threshold > 0.7 && threshold < 1.0,
      "threshold must be in (0.7, 1); at or below 0.7 the boost bound " +
        "collapses and the join degenerates toward all-pairs")
    // materialized once: members feeds four plan branches (the collapse,
    // both expansion joins, the same-string pairing) that would each
    // re-derive the source scan + tokenization
    val members = memberRows(df, idCol, strCol).localCheckpoint()
    val s = members.groupBy("str").agg(min("id").as("id"))
      .withColumn("len", octet_length(col("str")).cast("int"))
    guardCandidatePairs(s, s, threshold, maxCandidatePairs, "selfJoin")

    // lineage barrier: the two expansion joins below each embed their
    // build side as a broadcast exchange, and without a barrier BOTH
    // re-execute the whole candidate-verify subtree (measured: 2
    // jaro_winkler instances, 6 scans, two ~4 s twin jobs at sf0.1).
    // The verified frame is output-bound — the checkpoint is cheap.
    val verified = candidateVerify(s, s, threshold,
        extra = col("a.id") < col("b.id"), "str_a", "str_b")
      .localCheckpoint()
    expandSelfPairs(verified, members)
  }

  /** Expand verified distinct-string pairs (str_a, str_b, jw) to all
    * member id pairs, plus the identical-string branch (jw exactly 1),
    * ordered id_a < id_b — the shared tail of [[selfJoin]] and
    * [[selfJoinApprox]]. */
  private def expandSelfPairs(verified: DataFrame,
      members: DataFrame): DataFrame = {
    val diff = verified
      .join(members.select(col("str").as("str_a"), col("id").as("ia")),
        "str_a")
      .join(members.select(col("str").as("str_b"), col("id").as("ib")),
        "str_b")
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("jw"))
    // identical strings score exactly 1 — pair the member lists directly
    val same = members.as("a").join(members.as("b"),
        col("a.str") === col("b.str") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        lit(1.0).as("jw"))
    diff.unionByName(same)
  }

  /** Cross-corpus form: all (id_l, id_r, jw) with round(jw, 6) >=
    * threshold between two corpora — the probe-vs-stored-names linkage
    * shape. */
  def join(left: DataFrame, right: DataFrame, idCol: String,
      strCol: String, threshold: Double,
      maxCandidatePairs: Long = Long.MaxValue): DataFrame = {
    require(threshold > 0.7 && threshold < 1.0,
      "threshold must be in (0.7, 1)")
    // materialized once each (see selfJoin)
    val lm = memberRows(left, idCol, strCol).localCheckpoint()
    val rm = memberRows(right, idCol, strCol).localCheckpoint()
    val ls = lm.groupBy("str").agg(min("id").as("id"))
      .withColumn("len", octet_length(col("str")).cast("int"))
    val rs = rm.groupBy("str").agg(min("id").as("id"))
      .withColumn("len", octet_length(col("str")).cast("int"))
    guardCandidatePairs(ls, rs, threshold, maxCandidatePairs, "join")

    // equal strings are excluded here and paired exactly by the `same`
    // branch below — without the exclusion every identical cross-side
    // string would be emitted by BOTH branches
    val verified = candidateVerify(ls, rs, threshold,
        extra = col("a.str") =!= col("b.str"), "str_l", "str_r")
      .localCheckpoint() // see selfJoin: barrier against re-execution
    // cross-corpus identical strings (jw = 1) pair directly
    val same = ls.select(col("str")).intersect(rs.select(col("str")))
      .select(col("str").as("str_l"), col("str").as("str_r"),
        lit(1.0).as("jw"))
    expandCrossPairs(verified.unionByName(same), lm, rm)
  }

  /** Expand verified cross-corpus distinct-string pairs (str_l, str_r,
    * jw) to all member id pairs — the shared tail of [[join]] and
    * [[joinApprox]]. */
  private def expandCrossPairs(pairs: DataFrame, lm: DataFrame,
      rm: DataFrame): DataFrame =
    pairs
      .join(lm.select(col("str").as("str_l"), col("id").as("id_l")),
        "str_l")
      .join(rm.select(col("str").as("str_r"), col("id").as("id_r")),
        "str_r")
      .select("id_l", "id_r", "jw")

  /** Per-probe closest match against `names` — the reference's
    * closest-match selection: the single best (highest rounded jw, ties
    * to the smallest name id) match with score >= threshold, probes
    * with no admissible match omitted. Output: id_l, id_r, jw. */
  def bestMatch(probes: DataFrame, names: DataFrame, idCol: String,
      strCol: String, threshold: Double): DataFrame =
    join(probes, names, idCol, strCol, threshold)
      .withColumn("rn", row_number().over(Window.partitionBy("id_l")
        .orderBy(col("jw").desc, col("id_r"))))
      .filter(col("rn") === 1)
      .select("id_l", "id_r", "jw")

  // ---- approximate candidate mode (the zipfian escape hatch)
  //
  // The exact join's candidate stage is quadratic in the distinct
  // strings of a length band BY DESIGN (see the header: a character
  // prefix filter is provably near-vacuous for JW, and so is set-LSH —
  // measured at sf0.1, the true jw>=0.9 pairs' bigram Jaccard has
  // MEDIAN 0.53 / p10 0.38, so a MinHash geometry permissive enough
  // for ~0.97 recall admits 3.2M of the 11.3M banded pairs and saves
  // almost nothing). Uniform corpora spread the quadratic thin; a
  // zipfian hot band concentrates it (32x-skew probe: ~242M banded
  // pairs, 6.56x wall). The approximate mode is therefore SORTED-
  // NEIGHBORHOOD BLOCKING (Hernandez & Stolfo's multi-pass merge/purge
  // discipline, relationalized): two deterministic passes rank the
  // distinct strings by (str) and by (reverse(str)) — the prefix pass
  // catches JW's prefix-boost regime, the reverse pass trailing
  // agreement — and candidates are the pairs within `window` ranks in
  // EITHER pass, generated as an equi-join on rank blocks of width
  // `window` (each pair's ranks span at most two adjacent blocks).
  // Cost is exactly <= 2 * 2 * window * N candidate checks: LINEAR in
  // distinct strings, INDEPENDENT of the length histogram — a hot
  // length band costs the same as a uniform one. The exact jw kernel
  // remains the verify, so every returned pair is bit-identical to the
  // exact join's (precision exactly 1) and only RECALL is approximate
  // (differentially gated: q_join_jw_approx replays the whole blocking
  // in DuckDB; q_jw_approx_recall measures recall vs the exact join —
  // 0.98 at the sf0.1 fixture with the default window).

  /** Approximate [[selfJoin]]: sorted-neighborhood candidates (prefix +
    * reversed-string passes, `window` ranks wide), exact jw verify.
    * Returns a SUBSET of selfJoin's pairs — precision 1, recall rising
    * with `window` (sf0.1 fixture: 0.91 at w=50, 0.98 at w=100). Same
    * output contract otherwise. */
  def selfJoinApprox(df: DataFrame, idCol: String, strCol: String,
      threshold: Double, window: Int = 100): DataFrame = {
    require(threshold > 0.7 && threshold < 1.0, "threshold in (0.7, 1)")
    require(window > 0, "window must be positive")
    val members = memberRows(df, idCol, strCol).localCheckpoint()
    // checkpointed: feeds both ranking passes AND the verify join-backs
    val s = members.groupBy("str").agg(min("id").as("id"))
      .withColumn("len", octet_length(col("str")).cast("int"))
      .localCheckpoint()
    val cand = neighborhoodCandidates(s, window)
    val verified = verifyCandidateIds(cand, "id_a", "id_b", s, s,
        threshold, "str_a", "str_b")
      .localCheckpoint() // barrier, see selfJoin
    expandSelfPairs(verified, members)
  }

  /** Approximate [[join]] — both corpora merge into ONE sorted
    * neighborhood per pass (the classic multi-source merge/purge form)
    * and candidates are the cross-side pairs within `window` ranks;
    * exact verify. Precision 1 vs the exact join, recall gated. */
  def joinApprox(left: DataFrame, right: DataFrame, idCol: String,
      strCol: String, threshold: Double, window: Int = 100): DataFrame = {
    require(threshold > 0.7 && threshold < 1.0, "threshold in (0.7, 1)")
    require(window > 0, "window must be positive")
    val lm = memberRows(left, idCol, strCol).localCheckpoint()
    val rm = memberRows(right, idCol, strCol).localCheckpoint()
    val ls = lm.groupBy("str").agg(min("id").as("id"))
      .withColumn("len", octet_length(col("str")).cast("int"))
      .localCheckpoint()
    val rs = rm.groupBy("str").agg(min("id").as("id"))
      .withColumn("len", octet_length(col("str")).cast("int"))
      .localCheckpoint()
    val cand = crossNeighborhoodCandidates(ls, rs, window)
    // equal strings excluded in the verify, paired by `same` (see join)
    val verified = verifyCandidateIds(cand, "id_l", "id_r", ls, rs,
        threshold, "str_l", "str_r", requireDistinct = true)
      .localCheckpoint()
    val same = ls.select(col("str")).intersect(rs.select(col("str")))
      .select(col("str").as("str_l"), col("str").as("str_r"),
        lit(1.0).as("jw"))
    expandCrossPairs(verified.unionByName(same), lm, rm)
  }

  /** Approximate [[bestMatch]]: the closest-match selection over
    * [[joinApprox]] candidates — the serving shape for corpora whose
    * length histogram trips the exact path's pairs budget. NOTE the
    * winner is the best of the pairs the blocking FOUND; a probe whose
    * true best match fell outside both windows reports its best found
    * match (or drops if none) — the recall gate quantifies exactly
    * this. */
  def bestMatchApprox(probes: DataFrame, names: DataFrame, idCol: String,
      strCol: String, threshold: Double, window: Int = 100): DataFrame =
    joinApprox(probes, names, idCol, strCol, threshold, window)
      .withColumn("rn", row_number().over(Window.partitionBy("id_l")
        .orderBy(col("jw").desc, col("id_r"))))
      .filter(col("rn") === 1)
      .select("id_l", "id_r", "jw")

  /** The two pass keys: the string itself (prefix agreement — JW's
    * boost regime) and its reverse (trailing agreement). Total orders:
    * within a pass the key determines the string (reverse is a
    * bijection), so ranks are engine-portable — any SQL engine sorting
    * by the same key reproduces them exactly. */
  private def passKeys: Seq[(String, Column => Column)] = Seq(
    ("p", c => c), ("s", c => reverse(c)))

  /** Within-`window` rank pairs for the self mode, both passes, as
    * distinct unordered id pairs (id_a < id_b). Rank-block equi-join:
    * block = (rank-1) / window; a pair at rank distance <= window spans
    * at most adjacent blocks, so the probe side replicates to its own
    * and the next block — 2 shuffle rows per string per pass, never a
    * range join. */
  private def neighborhoodCandidates(s: DataFrame, window: Int): DataFrame =
    passKeys.map { case (tag, key) =>
      val ranked = graft.ops.Layout.globalRank(
          s.select(col("id"), key(col("str")).as("key")),
          s.sparkSession.sessionState.conf.numShufflePartitions,
          col("key"))
        .select(col("id"), col("rank"),
          ((col("rank") - 1) / window).cast("long").as("blk"))
        .localCheckpoint() // feeds both join sides; tag: pass + window
      val probe = ranked.select(col("id").as("id_a"),
          col("rank").as("rank_a"),
          explode(array(col("blk"), col("blk") + 1)).as("blk"))
      probe.join(ranked.select(col("id").as("id_b"),
          col("rank").as("rank_b"), col("blk")), Seq("blk"))
        .filter(col("rank_b") > col("rank_a") &&
          col("rank_b") <= col("rank_a") + window)
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"))
    }.reduce(_ unionByName _).distinct()

  /** Cross-corpus form: ONE merged ranking over both sides per pass
    * (ties broken by the string then side, so the order is total and
    * portable), candidates the cross-side pairs within `window` ranks
    * in either direction (probe replicates to blk-1, blk, blk+1). */
  private def crossNeighborhoodCandidates(ls: DataFrame, rs: DataFrame,
      window: Int): DataFrame =
    passKeys.map { case (tag, key) =>
      val all = ls.select(col("id"), col("str"), lit(0).as("side"))
        .unionByName(rs.select(col("id"), col("str"), lit(1).as("side")))
      val ranked = graft.ops.Layout.globalRank(
          all.select(col("id"), col("side"), key(col("str")).as("key"),
            col("str")),
          ls.sparkSession.sessionState.conf.numShufflePartitions,
          col("key"), col("str"), col("side"))
        .select(col("id"), col("side"), col("rank"),
          ((col("rank") - 1) / window).cast("long").as("blk"))
        .localCheckpoint()
      val probe = ranked.filter(col("side") === 0)
        .select(col("id").as("id_l"), col("rank").as("rank_l"),
          explode(array(col("blk") - 1, col("blk"), col("blk") + 1))
            .as("blk"))
      probe.join(ranked.filter(col("side") === 1)
          .select(col("id").as("id_r"), col("rank").as("rank_r"),
            col("blk")), Seq("blk"))
        .filter(abs(col("rank_r") - col("rank_l")) <= window)
        .select("id_l", "id_r")
    }.reduce(_ unionByName _).distinct()

  /** Exact-verify blocked candidate id pairs: join back to the distinct
    * strings, apply the (sound, output-invariant) length band, then the
    * jw kernel at round-6 >= threshold. */
  private def verifyCandidateIds(cand: DataFrame, idA: String,
      idB: String, sA: DataFrame, sB: DataFrame, threshold: Double,
      outL: String, outR: String,
      requireDistinct: Boolean = false): DataFrame = {
    val j0 = (threshold - 5e-7 - 0.4) / 0.6
    val r = math.max(3 * j0 - 2, 0.0)
    val jw = jwRounded(col("sa"), col("sb"))
    cand
      .join(sA.select(col("id").as(idA), col("str").as("sa"),
        col("len").as("la")), idA)
      .join(sB.select(col("id").as(idB), col("str").as("sb"),
        col("len").as("lb")), idB)
      .filter((if (requireDistinct) col("sa") =!= col("sb") else lit(true)) &&
        col("la") >= col("lb") * r && col("lb") >= col("la") * r &&
        jw >= threshold)
      .select(col("sa").as(outL), col("sb").as(outR), jw.as("jw"))
  }

  /** Warn threshold for the always-on pairs estimate (round-17): past
    * this many estimated banded candidate pairs the exact join logs a
    * loud warning naming the approximate escape hatch, but proceeds —
    * results stay bit-identical. Callers that pass an explicit
    * `maxCandidatePairs` get the hard fail instead. 100M ≈ 40× the
    * whole-corpus sf0.1 estimate and ~40 s of kernel work on one core;
    * the 32×-zipf hot band that motivated the guard estimated ~242M. */
  val DefaultWarnPairs: Long = 100000000L

  /** Effective advisory threshold — the `graft.jw.warnPairs` system
    * property overrides [[DefaultWarnPairs]] (specs pin the warn path
    * at toy scale; operators can tighten it fleet-wide). */
  private def warnPairs: Long =
    sys.props.get("graft.jw.warnPairs").map(_.toLong)
      .getOrElse(DefaultWarnPairs)

  /** The exact path's pairs-budget circuit breaker: a length-bucket
    * histogram upper bound on the banded candidate pairs the salted
    * blocked join would examine (each (prober, admissible-bucket
    * resident) coincidence is one in-task verify). Driver-bounded —
    * at most ~64 buckets per side. Since round 17 the estimate is
    * computed UNCONDITIONALLY (two ≤64-row aggregate jobs over frames
    * whose lineage is already checkpointed): with the default unlimited
    * budget an estimate past [[DefaultWarnPairs]] WARNS loudly (results
    * unchanged); an explicit caller budget keeps the round-16 hard-fail
    * contract. A passing guard changes nothing. */
  private def guardCandidatePairs(a: DataFrame, b: DataFrame,
      threshold: Double, budget: Long, site: String): Unit = {
    require(budget > 0, "maxCandidatePairs must be positive")
    val j0 = (threshold - 5e-7 - 0.4) / 0.6
    val rB = math.max(math.max(3 * j0 - 2, 0.0), 1.0 / 65536)
    def hist(s: DataFrame): Map[Int, Long] =
      s.groupBy((length(bin(col("len").cast("long"))) - 1).cast("int")
          .as("bkt"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ha = hist(a)
    val hb = if (a eq b) ha else hist(b)
    val est = ha.iterator.map { case (i, na) =>
      // worst-case prober lengths in bucket i: lo partner bucket from
      // the smallest (2^i), hi from the largest (2^(i+1) - 1)
      val lo = math.floor(math.log(math.max(1.0, math.pow(2, i) * rB))
        / math.log(2)).toInt
      val hi = math.floor(math.log((math.pow(2, i + 1) - 1) / rB)
        / math.log(2)).toInt
      BigInt(na) * hb.iterator.collect {
        case (j, nb) if j >= lo && j <= hi => BigInt(nb) }.sum
    }.sum
    def advice = "A zipfian hot length band makes the exact join " +
      "quadratic in that band's distinct strings; raise the budget, " +
      "or switch to the approximate candidate mode (selfJoinApprox/" +
      "joinApprox/bestMatchApprox: sorted-neighborhood candidates — " +
      "prefix + reversed-string rank windows — with the exact jw " +
      "verify; precision 1, recall gated by q_jw_approx_recall)."
    if (budget != Long.MaxValue && est > budget)
      throw new IllegalStateException(
        s"JaroWinklerJoin.$site: estimated $est banded candidate pairs " +
          s"exceeds maxCandidatePairs=$budget (length-bucket histogram " +
          s"upper bound at threshold=$threshold). " + advice)
    if (budget == Long.MaxValue && est > BigInt(warnPairs))
      println(s"WARN JaroWinklerJoin.$site: estimated $est banded " +
        s"candidate pairs exceeds the advisory warn threshold " +
        s"$warnPairs (no maxCandidatePairs set — proceeding, " +
        "results are exact). " + advice)
  }

  // ---- shared machinery

  private def memberRows(df: DataFrame, idCol: String,
      strCol: String): DataFrame =
    df.filter(col(strCol).isNotNull && length(col(strCol)) > 0)
      .select(col(idCol).cast("long").as("id"), col(strCol).as("str"))

  /** Salted length-blocked candidate join with the jw verify in the
    * join condition. `a` probes (replicated to each admissible partner
    * log2-length bucket × every salt), `b` resides (one (bucket, salt)
    * per string) — each qualifying pair meets exactly once. `extra`
    * carries the direction/identity restriction. */
  /** Resident half of the candidate machinery: one (bucket) row per
    * distinct string with its signature — the PERSISTED form of the
    * index ([[buildIndex]]); salt is derived from the id at join time. */
  private def residentRows(s: DataFrame): DataFrame = {
    import graft.functions.expressions.CharSig.charSig
    s.select(col("id"), col("len"), col("str"),
      charSig(col("str")).as("sig"),
      // EXACT floor(log2(len)) from the integer's bit length —
      // floor(log2(...)) via libm can flip by one ulp at exact powers
      // of two, silently shifting a resident one bucket over and
      // breaking candidate completeness for those lengths
      (length(bin(col("len").cast("long"))) - 1).cast("int").as("bkt"))
  }

  /** Exact floor(log2(x)) for a POSITIVE double column with x >= 1:
    * libm log2 guesses within one ulp, then exact-IEEE comparisons
    * against the power-of-two bounds correct the boundary cases. */
  private def exactFloorLog2(x: Column): Column = {
    val e0 = floor(log2(x)).cast("int")
    val p0 = graft.functions.PortableMath
      .pow2(greatest(e0, lit(0)).cast("long")).cast("double")
    when(x < p0, e0 - 1).when(x >= p0 * 2.0, e0 + 1).otherwise(e0)
  }

  private[graft] def candidateVerify(a: DataFrame, b: DataFrame,
      threshold: Double, extra: Column, outL: String,
      outR: String): DataFrame =
    verifyAgainstResidents(a, residentRows(b), threshold, extra, outL, outR)

  /** The candidate join proper, with the resident side already in index
    * form (freshly derived or read back from a Store). */
  private def verifyAgainstResidents(a: DataFrame, residentIdx: DataFrame,
      threshold: Double, extra: Column, outL: String,
      outR: String): DataFrame = {
    // Accept is round(jw, 6) >= threshold, so raw scores down to
    // threshold − 5e-7 qualify (they round up to θ). Every pruning
    // bound below derives from that slackened θ — otherwise a pair
    // whose raw jw sits a hair under θ could clear the rounded accept
    // yet be dropped by a band computed from the unrounded θ.
    val j0 = (threshold - 5e-7 - 0.4) / 0.6
    val r = math.max(3 * j0 - 2, 0.0)
    // bucket fan-out floor: at r = 0 (θ ≤ 0.8) any length ratio is
    // admissible; 2^-16 bounds the replication at +16 buckets while
    // excluding only ratios < 2^-16, whose jaro ≤ (2 + 2^-16)/3 can
    // never reach a θ > 0.7
    val rB = math.max(r, 1.0 / 65536)
    val nParts = a.sparkSession.sessionState.conf.numShufflePartitions

    import graft.functions.expressions.CharSig.{charSig, overlapBound}
    val resident = residentIdx.withColumn("salt",
      pmod(xxhash64(col("id")), lit(nParts)).cast("int"))
    val prober = a.select(col("id"), col("len"), col("str"),
        charSig(col("str")).as("sig"),
        explode(sequence(
          exactFloorLog2(greatest(lit(1.0), col("len") * rB)),
          exactFloorLog2(col("len") / rB))).as("bkt"))
      .select(col("id"), col("len"), col("str"), col("sig"), col("bkt"),
        explode(sequence(lit(0), lit(nParts - 1))).as("salt"))

    // explicit-width repartition on the join key, pinned against AQE:
    // there are only ~(buckets × salts) distinct keys and the exchanges
    // are tiny, so AQE would coalesce them and serialize the in-join
    // verify (the EditJoin lesson, measured 52 s -> 3 s there)
    val prober2 = prober.repartition(nParts, col("bkt"), col("salt"))
    val resident2 = resident.repartition(nParts, col("bkt"), col("salt"))

    // condition order is the cost ladder: equi-keys, band arithmetic,
    // the ~50 ns count-bound (kills 93.5% of banded pairs on the sf0.1
    // fixture — see CharSig), and only then the ~20× costlier jw kernel
    // ceil of the double product can land one above the true integer
    // bound when the exact value is an integer and the product rounds
    // a ulp high; shave a relative epsilon before ceil (lens ≤ ~1e5
    // keeps the slack under 1e-6 chars — loosening, hence sound)
    val mReq = ceil((lit(3 * j0 - 1) * col("a.len") * col("b.len") /
      (col("a.len") + col("b.len"))) * (1.0 - 1e-12) - 1e-9).cast("int")
    val jw = jwRounded(col("a.str"), col("b.str"))
    prober2.as("a").join(resident2.as("b"),
        col("a.bkt") === col("b.bkt") && col("a.salt") === col("b.salt") &&
          extra &&
          col("a.len") >= col("b.len") * r &&
          col("b.len") >= col("a.len") * r &&
          overlapBound(col("a.sig"), col("b.sig"),
            col("a.len"), col("b.len")) >= mReq &&
          jw >= threshold)
      .select(col("a.str").as(outL), col("b.str").as(outR), jw.as("jw"))
  }

  // ---- persisted name index: freeze the stored-names side once, match
  // incoming probe batches against the frozen tables — the nightly
  // incremental lifecycle of the reference's closest-match resolution
  // (new records match against the STORED set, which is not recomputed
  // per batch). Same Store + commit-marker contract as EditJoin/Ivf.
  import org.apache.spark.sql.types._

  private val membersSchema = StructType(Seq(
    StructField("str", StringType), StructField("id", LongType)))
  private val stringsSchema = StructType(Seq(
    StructField("id", LongType), StructField("len", IntegerType),
    StructField("str", StringType), StructField("sig", BinaryType),
    StructField("bkt", IntegerType)))
  private val metaSchema = StructType(Seq(
    StructField("threshold", DoubleType)))

  /** Persist the stored-names side under `name`: member list and the
    * resident index rows (signature + length bucket per distinct
    * string). `threshold` is recorded and enforced at serve time —
    * the bucket layout is threshold-independent, but pinning it keeps
    * build and serve reasoning about the same match contract. */
  def buildIndex(store: graft.pipeline.Store, name: String,
      names: DataFrame, idCol: String, strCol: String,
      threshold: Double): Unit = {
    require(threshold > 0.7 && threshold < 1.0, "threshold in (0.7, 1)")
    val spark = names.sparkSession
    import spark.implicits._
    val members = memberRows(names, idCol, strCol)
    val s = members.groupBy("str").agg(min("id").as("id"))
      .withColumn("len", octet_length(col("str")).cast("int"))
    store.write(s"${name}_members",
      members.select("str", "id"))
    store.write(s"${name}_strings",
      residentRows(s).select("id", "len", "str", "sig", "bkt"))
    store.write(s"${name}_meta", Seq(threshold).toDF("threshold"))
    graft.dedup.IndexCommits.mark(store, name, "base")
  }

  /** All (id_l, id_r, jw) pairs between a probe batch and the INDEXED
    * names — no stored-side signature or bucket recompute, no scan of
    * the stored corpus beyond the frozen relations. */
  def assignAgainstIndex(store: graft.pipeline.Store, name: String,
      probes: DataFrame, idCol: String, strCol: String,
      threshold: Double): DataFrame = {
    graft.dedup.IndexCommits.validate(store, name,
      Seq("_members", "_strings"))
    val meta = store.read(s"${name}_meta", metaSchema).collect()
    require(meta.length == 1 && meta(0).getDouble(0) == threshold,
      s"index '$name' was built for threshold " +
        s"${meta.toSeq.map(_.getDouble(0))}, serve asked $threshold")
    val pm = memberRows(probes, idCol, strCol).localCheckpoint()
    val ps = pm.groupBy("str").agg(min("id").as("id"))
      .withColumn("len", octet_length(col("str")).cast("int"))
    val residentIdx = store.read(s"${name}_strings", stringsSchema)

    val verified = verifyAgainstResidents(ps, residentIdx, threshold,
        extra = col("a.str") =!= col("b.str"), "str_l", "str_r")
      .localCheckpoint() // barrier, see selfJoin
    val same = ps.select(col("str"))
      .join(residentIdx.select(col("str")), "str")
      .select(col("str").as("str_l"), col("str").as("str_r"),
        lit(1.0).as("jw"))

    verified.unionByName(same)
      .join(pm.select(col("str").as("str_l"), col("id").as("id_l")),
        "str_l")
      .join(store.read(s"${name}_members", membersSchema)
        .select(col("str").as("str_r"), col("id").as("id_r")), "str_r")
      .select("id_l", "id_r", "jw")
  }

  /** Closest stored match per probe, served from the frozen index —
    * [[bestMatch]] semantics without rebuilding the stored side. */
  def bestMatchIndexed(store: graft.pipeline.Store, name: String,
      probes: DataFrame, idCol: String, strCol: String,
      threshold: Double): DataFrame =
    assignAgainstIndex(store, name, probes, idCol, strCol, threshold)
      .withColumn("rn", row_number().over(Window.partitionBy("id_l")
        .orderBy(col("jw").desc, col("id_r"))))
      .filter(col("rn") === 1)
      .select("id_l", "id_r", "jw")

  /** One incremental match-or-create DECISION per batch row against the
    * indexed name set — the reference's nightly resolution loop (each
    * incoming record resolves to its closest stored name above the
    * cutoff or creates a new entity), decision semantics mirroring
    * [[EditJoin.assignDecisions]] on the Jaro-Winkler modality.
    * Returns `(idCol, assigned, matched)`:
    *
    *  - batch rows exact-collapse by string (rep = min id; copies
    *    inherit the rep's decision);
    *  - a rep with ANY stored match at round-6 jw >= threshold assigns
    *    to the (max jw, then min stored id) match — `matched` is
    *    'exact' at jw 1.0, 'near' otherwise;
    *  - leftovers close over the within-batch jw graph ([[selfJoin]]
    *    edges → min-label components) — `matched` is 'novel',
    *    `assigned` the component minimum (self for the representative,
    *    which is what [[appendToIndex]] should then be fed). */
  def assignDecisions(store: graft.pipeline.Store, name: String,
      batch: DataFrame, idCol: String, strCol: String,
      threshold: Double, maxIter: Int = 20): DataFrame = {
    val b = batch.filter(col(strCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(strCol).as("str"))
    val brm = b.withColumn("rep",
      min("id").over(Window.partitionBy("str")))
    val reps = brm.filter(col("id") === col("rep"))
      .select(col("id").as(idCol), col("str").as(strCol))
    val best = assignAgainstIndex(store, name, reps, idCol, strCol,
        threshold)
      .groupBy("id_l")
      .agg(max(struct(col("jw"), (-col("id_r")).as("nid"))).as("m"))
      .select(col("id_l").as("id"), (-col("m.nid")).as("assigned"),
        when(col("m.jw") === 1.0, "exact").otherwise("near").as("matched"))
    val novel = reps
      .select(col(idCol).cast("long").as("id"), col(strCol).as("str"))
      .join(best.select("id"), Seq("id"), "left_anti")
      .localCheckpoint() // feeds the edge join AND the label expansion
    val edges = selfJoin(novel.select(col("id"), col("str")), "id", "str",
      threshold)
    val labels = graft.graph.ConnectedComponents
      .run(edges.select("id_a", "id_b"), maxIter)
    val novelDec = novel.join(labels, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("assigned"),
        lit("novel").as("matched"))
    brm.join(best.unionByName(novelDec).withColumnRenamed("id", "rep"),
        Seq("rep"))
      .select(col("id").as(idCol), col("assigned"), col("matched"))
  }

  /** Append accepted novel representatives to the persisted name index
    * as a `batchTag`-keyed file publication — per-batch cost
    * proportional to the BATCH, no read-modify-write of stored data,
    * replay-safe when paired with [[clearBatch]] at batch start (the
    * [[graft.dedup.CorpusIndex.append]] contract). Signatures and
    * buckets are pure functions of the string, so appended rows are
    * indistinguishable from build-time rows. */
  def appendToIndex(store: graft.pipeline.Store, name: String,
      novel: DataFrame, idCol: String, strCol: String, batchTag: String,
      threshold: Double): Unit = {
    val meta = store.read(s"${name}_meta", metaSchema).collect()
    require(meta.length == 1 && meta(0).getDouble(0) == threshold,
      s"index '$name' was built for threshold " +
        s"${meta.toSeq.map(_.getDouble(0))}, append asked $threshold")
    val members = memberRows(novel, idCol, strCol)
    val s = members.groupBy("str").agg(min("id").as("id"))
      .withColumn("len", octet_length(col("str")).cast("int"))
      .localCheckpoint()
    import graft.pipeline.FsUtils.publishBatch
    publishBatch(members.select("str", "id"),
      store.path(s"${name}_members"), batchTag)
    publishBatch(residentRows(s).select("id", "len", "str", "sig", "bkt"),
      store.path(s"${name}_strings"), batchTag)
    // cross-table commit point, written LAST (IndexCommits contract)
    graft.dedup.IndexCommits.mark(store, name, batchTag)
  }

  /** Purge every index file a previous attempt of `batchTag` published
    * — the batch-start half of the replay-safety contract. */
  def clearBatch(store: graft.pipeline.Store, name: String,
      batchTag: String): Unit = {
    graft.dedup.IndexCommits.unmark(store, name, batchTag)
    Seq("_members", "_strings").foreach(sfx =>
      graft.pipeline.FsUtils.clearBatch(store.path(s"$name$sfx"), batchTag))
  }
}
