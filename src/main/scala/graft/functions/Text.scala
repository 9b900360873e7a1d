package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, quality signals, marker-based language scoring, and
  * deterministic document fingerprints. All pure column expressions
  * (codegen-friendly, partition-parallel, no UDFs, no driver loops).
  */
object Text {

  /** Whitespace tokenization; robust to repeated spaces. */
  def tokens(text: Column): Column =
    filter(split(text, " +"), w => w =!= "")

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Count of tokens that appear in `vocab`. */
  def vocabHits(text: Column, vocab: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(vocab.map(lit): _*)))

  /** Distinct word n-gram shingles (the unit for Jaccard / MinHash dedup).
    * Guarded so texts shorter than `n` words yield an empty set (Spark's
    * `sequence(1, 0)` would otherwise count DOWN).
    */
  def wordShingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(1), size(w) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Jaccard similarity of two pre-computed distinct shingle sets.
    * Exact int-cardinality division — bit-identical across engines. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter / (size(a) + size(b) - inter)
  }

  /** Shingle sets hashed to 64-bit ints: same cardinalities as
    * [[wordShingles]] (collisions are ~2^-64), but set intersection runs
    * on longs instead of strings — the representation to carry through
    * pairwise-verify joins at corpus scale. The n tokens are hashed
    * directly (multi-arg xxhash64) — no intermediate concat'd strings,
    * which dominate the cost of the interpreted higher-order transform. */
  def hashedShingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(1), size(w) - (n - 1)), i =>
        xxhash64((0 until n).map(k => element_at(w, i + k)): _*))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Deterministic rolling polynomial fingerprint over the first
    * `prefixLen` characters: fold (acc*31 + codepoint) mod 1e9+7.
    * Engine-portable (same result in any SQL engine with a list fold).
    */
  def fingerprint(text: Column, prefixLen: Int = 64): Column = {
    val chars = filter(split(substring(text, 1, prefixLen), ""), c => c =!= "")
    val codes = transform(chars, c => ascii(c).cast("long"))
    aggregate(codes, lit(0L), (acc, x) => (acc * 31L + x) % 1000000007L)
  }

  /** Marker-word language scorer: argmax over per-language marker counts
    * with a deterministic first-wins tie-break. `markers` maps language ->
    * marker word. (The production path for real corpora; on synthetic test
    * text it still exercises the full argmax machinery.)
    */
  def langGuess(text: Column, markers: Seq[(String, String)]): Column = {
    val scores = markers.map { case (lang, word) =>
      lang -> vocabHits(text, Seq(word))
    }
    // first language whose score >= all later scores wins (stable argmax)
    scores.init.zipWithIndex.foldRight(lit(scores.last._1)) {
      case ((((lang, s)), i), rest) =>
        val laterMax = scores.drop(i + 1).map(_._2).reduce((a, b) => greatest(a, b))
        when(s >= laterMax, lit(lang)).otherwise(rest)
    }
  }

  /** Quality signals: share of alphabetic chars, mean word length — kept
    * as exact integer numerators/denominators for oracle-stable output. */
  def charCount(text: Column): Column = length(text)
  def nonSpaceChars(text: Column): Column =
    length(regexp_replace(text, " ", ""))
}
