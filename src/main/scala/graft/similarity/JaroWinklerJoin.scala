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
  * `round(jaro_winkler(a, b), 6) >= threshold` is returned — candidate
  * generation prunes, never drops. The pruning chain, each step a
  * proven implication (θ = threshold, jw the classic Winkler form with
  * boost scale p = 0.1 over at most l = 4 prefix chars, boost applied
  * only when jaro > 0.7):
  *
  *  1. jw ≤ 0.6·jaro + 0.4 when the boost applies (l ≤ 4, p = 0.1),
  *     and jw = jaro ≤ 0.7 < θ otherwise — so jw ≥ θ implies
  *     jaro ≥ j0 = (θ − 0.4) / 0.6.
  *  2. 3·jaro = m/|a| + m/|b| + (m − t/2)/m with the last term ≤ 1, so
  *     m ≥ (3·j0 − 1) · |a|·|b| / (|a| + |b|) matched characters.
  *  3. m ≤ min(|a|, |b|) then forces the LENGTH BAND
  *     min/max ≥ r = 3·j0 − 2 (vacuous below θ ≈ 0.8, clamped to 0).
  *  4. The m matched characters occupy distinct positions on both
  *     sides, so the character MULTISETS intersect in ≥ m elements;
  *     with elements (char, occurrence-index) under one global
  *     rarest-first total order, the prefix-filter theorem says a
  *     qualifying pair must collide within each side's first
  *     L − c(L) + 1 elements, where c(L) = ceil((3·j0 − 1) · r/(1+r)
  *     · L) lower-bounds m against the shortest admissible partner.
  *     At θ = 0.93 the prefix is ~32% of each string's characters —
  *     only collisions on RARE characters fan out.
  *
  * Candidates then verify IN the join condition with the native codegen
  * [[graft.functions.expressions.JaroWinkler]] (the condition form — the
  * measured winner of the round-13 EditJoin A/B); only survivors dedup
  * and re-expand to id pairs. Thresholding and output use the round-6
  * score so a last-ulp divergence cannot flip a boundary (the
  * q_fn_jaro_winkler convention).
  *
  * Byte vs character units: the verify (like DuckDB's) walks UTF-8
  * bytes; the pruning counts characters. For single-byte text (the
  * reference's uppercase-ASCII storm names, and any Latin-1 corpus) the
  * two coincide and the chain above is exact. Multi-byte text can in
  * principle score byte-level matches across distinct characters that
  * the character-multiset bound does not see; callers joining such
  * corpora should normalize first ([[graft.ops.TextOps.textNormalize]]).
  *
  * 100 TB shape: the same contract as [[EditJoin]] — every stage is a
  * keyed shuffle over character-element rows, the per-string prefix
  * frame is O(L) rows, nothing corpus-sized broadcasts, and the
  * candidate join is an equi-join on (char, occ) spread by an explicit
  * repartition (AQE would coalesce the small exchange and serialize the
  * verify).
  */
object JaroWinklerJoin {

  private def jwRounded(a: Column, b: Column): Column =
    round(jaroWinklerNative(a, b), 6)

  /** All pairs (id_a < id_b) with round(jw, 6) >= threshold.
    * Output: id_a, id_b, jw. Null/empty strings never match. */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.7 && threshold < 1.0,
      "threshold must be in (0.7, 1); at or below 0.7 the boost bound " +
        "collapses and the join degenerates toward all-pairs")
    val members = memberRows(df, idCol, strCol)
    val s = members.groupBy("str").agg(min("id").as("id"))
      .withColumn("len", length(col("str")))

    val pfx = prefixElements(s, threshold)
    val verified = candidateVerify(pfx, pfx, threshold,
        extra = col("a.id") < col("b.id"), "str_a", "str_b")
      .distinct()

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
    * shape. One shared rarest-first element order is built from the
    * union of both sides (the prefix-filter theorem needs a single
    * total order). */
  def join(left: DataFrame, right: DataFrame, idCol: String,
      strCol: String, threshold: Double): DataFrame = {
    require(threshold > 0.7 && threshold < 1.0,
      "threshold must be in (0.7, 1)")
    val lm = memberRows(left, idCol, strCol)
    val rm = memberRows(right, idCol, strCol)
    val ls = lm.groupBy("str").agg(min("id").as("id"))
      .withColumn("len", length(col("str")))
    val rs = rm.groupBy("str").agg(min("id").as("id"))
      .withColumn("len", length(col("str")))

    val freq = charElements(ls).unionByName(charElements(rs))
      .groupBy("ch", "occ").agg(count(lit(1)).as("freq"))
    val lp = prefixFromElements(charElements(ls), freq, threshold)
    val rp = prefixFromElements(charElements(rs), freq, threshold)

    // equal strings are excluded here and paired exactly by the `same`
    // branch below — without the exclusion every identical cross-side
    // string would be emitted by BOTH branches
    val verified = candidateVerify(lp, rp, threshold,
        extra = col("a.str") =!= col("b.str"), "str_l", "str_r")
      .distinct()
    // cross-corpus identical strings (jw = 1) pair directly: the
    // collapsed reps carry per-side min ids, so expand via members
    val same = ls.select(col("str")).intersect(rs.select(col("str")))
      .withColumn("jw", lit(1.0))
      .select(col("str").as("str_l"), col("str").as("str_r"), col("jw"))

    verified.unionByName(same)
      .join(lm.select(col("str").as("str_l"), col("id").as("id_l")),
        "str_l")
      .join(rm.select(col("str").as("str_r"), col("id").as("id_r")),
        "str_r")
      .select("id_l", "id_r", "jw")
  }

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

  // ---- shared machinery

  private def memberRows(df: DataFrame, idCol: String,
      strCol: String): DataFrame =
    df.filter(col(strCol).isNotNull && length(col(strCol)) > 0)
      .select(col(idCol).cast("long").as("id"), col(strCol).as("str"))

  /** (id, len, str, ch, occ): each character of each distinct string as
    * a multiset element — occurrence-indexed so repeats are distinct
    * elements (the same shape as [[EditJoin]]'s (gram, occ) rows). */
  private def charElements(s: DataFrame): DataFrame =
    s.select(col("id"), col("len"), col("str"),
        posexplode(transform(sequence(lit(1), col("len")),
          i => col("str").substr(i, lit(1)))).as(Seq("pos", "ch")))
      .withColumn("occ", row_number().over(
        Window.partitionBy("id", "ch").orderBy("pos")))
      .select("id", "len", "str", "ch", "occ")

  /** Per-string prefix frame under the global rarest-first order: the
    * first len − c(len) + 1 elements, c(L) = ceil((3·j0 − 1) · r/(1+r)
    * · L) the common-character lower bound against the shortest
    * admissible partner (see class doc, steps 2-4). */
  private def prefixFromElements(elems: DataFrame, freq: DataFrame,
      threshold: Double): DataFrame = {
    val j0 = (threshold - 0.4) / 0.6
    val r = math.max(3 * j0 - 2, 0.0)
    val coef = (3 * j0 - 1) * r / (1 + r)
    elems.join(freq, Seq("ch", "occ"), "left")
      .na.fill(0L, Seq("freq"))
      .withColumn("rn", row_number().over(Window.partitionBy("id")
        .orderBy(col("freq"), col("ch"), col("occ"))))
      .filter(col("rn") <=
        greatest(lit(1), col("len") - ceil(col("len") * coef) + 1))
      .select("id", "len", "str", "ch", "occ")
  }

  private def prefixElements(s: DataFrame, threshold: Double): DataFrame = {
    val elems = charElements(s)
    val freq = elems.groupBy("ch", "occ").agg(count(lit(1)).as("freq"))
    prefixFromElements(elems, freq, threshold)
  }

  /** Equi-join candidates on a shared prefix element, length band, and
    * the native jw verify IN the join condition (round-13 A/B winner);
    * emits (outL, outR, jw) for survivors. The explicit-width
    * repartition pins the candidate exchange against AQE coalescing
    * (the EditJoin lesson: a one-partition exchange serializes the
    * whole verify). */
  private def candidateVerify(lp: DataFrame, rp: DataFrame,
      threshold: Double, extra: Column, outL: String,
      outR: String): DataFrame = {
    val j0 = (threshold - 0.4) / 0.6
    val r = math.max(3 * j0 - 2, 0.0)
    val nParts = lp.sparkSession.sessionState.conf.numShufflePartitions
    val a = lp.repartition(nParts, col("ch"), col("occ"))
    val b = rp.repartition(nParts, col("ch"), col("occ"))
    val jw = jwRounded(col("a.str"), col("b.str"))
    a.as("a").join(b.as("b"),
        col("a.ch") === col("b.ch") && col("a.occ") === col("b.occ") &&
          extra &&
          col("a.len") >= col("b.len") * r &&
          col("b.len") >= col("a.len") * r &&
          jw >= threshold)
      .select(col("a.str").as(outL), col("b.str").as(outR), jw.as("jw"))
  }
}
