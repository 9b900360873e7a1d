package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.dedup.Dedup
import graft.functions.{Sketch, Text}

/** Training-data curation operators beyond the dedup/quality set already in
  * [[TextOps]]: benchmark decontamination, PII redaction, repetition
  * signals, deterministic stratified sampling, embedding normalization /
  * int8 quantization, context-window sequence packing, and corpus mixture
  * weighting. Every operator is engine-portable and carries a DuckDB
  * differential oracle.
  *
  * Scale notes are per-operator; the common theme is that the per-document
  * work is a codegen'd column expression and the only shuffles are the
  * final keyed aggregations.
  */
object CurateOps {

  /** Benchmark decontamination: drop from the training corpus every
    * document that shares a word 4-gram with the held-out benchmark set
    * (here: `source = 'src0'`). The industry-standard n-gram-overlap
    * decontamination (e.g. GPT-3 appendix C) re-expressed relationally:
    * explode corpus shingles, semi-join against the (small) benchmark
    * shingle-hash set, aggregate survivors per language.
    *
    * At 100 TB the benchmark side is tiny (a few MB of hashes) and is
    * broadcast, so the corpus side never shuffles — one scan, map-side
    * semi-join, then a per-lang partial aggregate.
    *
    * Shingles are hashed with multi-arg xxhash64 directly over the n
    * tokens ([[Text.hashedShinglesFromTokens]]) — no intermediate
    * concat'd strings, no per-shingle md5. The hash never reaches the
    * output (only contaminated-doc COUNTS do), and "shares a 4-gram" is
    * hash-function-independent, so the DuckDB oracle (which replays the
    * same set-membership via md5'd string shingles) stays an exact
    * differential for this fast path — no portable twin needed. (The
    * cross-hash diff assumes no xxhash64 collision between distinct
    * fixture shingles — ~2^-64 per pair; the two engines using
    * INDEPENDENT hash functions makes the differential strictly
    * stronger, since a collision on either side would surface as a
    * count mismatch.)
    *
    * The token array is BOUND as a projected column before the shingle
    * transform references it: interpreted HOF lambdas re-evaluate
    * embedded expression trees per element (~n×shingles regex
    * tokenizations per row when inlined — the round-5 hot spot), while a
    * bound attribute is an O(1) row read. */
  private[ops] def docShingles4(d: DataFrame): DataFrame = d
    .select(col("doc_id"), Text.tokens(col("text")).as("w"))
    .select(col("doc_id"),
      explode(Text.hashedShinglesFromTokens(col("w"), 4)).as("h"))

  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val shingle: DataFrame => DataFrame = docShingles4
    val benchH = shingle(docs.filter(col("source") === "src0"))
      .select("h").distinct()
    val corpus = docs.filter(col("source") =!= "src0")
    val contaminated = shingle(corpus)
      .join(broadcast(benchH), Seq("h"), "left_semi")
      .select("doc_id").distinct()
    corpus.join(contaminated.withColumn("hit", lit(1)), Seq("doc_id"), "left_outer")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("hit"), lit(0))).as("n_contaminated"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_clean"))
      .orderBy("lang")
  }

  private val decontaminateOracle: String =
    """WITH w AS (SELECT doc_id, lang, source,
      |    list_filter(regexp_split_to_array(text, ' +'), x -> x != '') AS w
      |  FROM documents),
      |sh AS (SELECT doc_id, source, unnest(CASE WHEN len(w) >= 4 THEN
      |    list_distinct(list_transform(generate_series(1, len(w) - 3),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))
      |    ELSE [] END) AS s
      |  FROM w),
      |h AS (SELECT doc_id, source,
      |    CAST('0x' || substr(md5(s), 2, 15) AS BIGINT) AS h FROM sh),
      |bh AS (SELECT DISTINCT h FROM h WHERE source = 'src0'),
      |cont AS (SELECT DISTINCT doc_id FROM h
      |  WHERE source != 'src0' AND h IN (SELECT h FROM bh))
      |SELECT d.lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
      |    AS n_contaminated,
      |  CAST(sum(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clean
      |FROM documents d LEFT JOIN cont c ON c.doc_id = d.doc_id
      |WHERE d.source != 'src0'
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  /** Bloom-prefiltered decontamination: the SAME decision as
    * [[decontaminate]] (and the same oracle — the results must be
    * indistinguishable), with the corpus-side membership test staged as
    * (1) a map-side probe of a serialized bloom filter built from the
    * benchmark shingle hashes by Spark's native BloomFilterAggregate,
    * then (2) the exact broadcast semi-join over only the surviving
    * shingles. False positives from (1) are removed by (2); false
    * negatives cannot occur, so the composition is exactly the exact
    * path — which is why no separate oracle or portable twin is needed.
    *
    * Why stage it at 100 TB: the exact path probes a broadcast hash set
    * per corpus shingle. When the held-out suite is large (every
    * benchmark ever published — easily 10^8-10^9 distinct n-grams), the
    * hash-relation build + per-row lookup dominates; a bloom blob at
    * ~10 bits/item is 8-12x smaller than the packed long set (and
    * ~25-40x smaller than the join hash relation), ships once per
    * executor, and its bit-probe rejects the ~99% non-colliding
    * shingles before the join sees them — the explicit form of the
    * InjectRuntimeFilter pattern Catalyst applies to shuffle joins,
    * chosen here because the filter side is a FIXED corpus known before
    * the query, not a join build side discovered mid-plan. The one-row
    * blob collect is the documented index-meta-read pattern (a single
    * ~60 KB aggregate result), not a data collect. */
  def decontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    // materialized once: both the blob aggregate (an action) and the
    // verify join's broadcast side read it — unmaterialized, the
    // benchmark scan+shingle+distinct would run twice
    val benchH = docShingles4(docs.filter(col("source") === "src0"))
      .select("h").distinct().localCheckpoint()
    val blob = benchH
      .agg(Sketch.bloomAgg(col("h"), 60000L, 480000L).as("bf"))
      .head().getAs[Array[Byte]](0)
    val corpus = docs.filter(col("source") =!= "src0")
    val contaminated = docShingles4(corpus)
      .filter(Sketch.bloomMightContain(blob, col("h")))
      .join(broadcast(benchH), Seq("h"), "left_semi")
      .select("doc_id").distinct()
    corpus.join(contaminated.withColumn("hit", lit(1)), Seq("doc_id"), "left_outer")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("hit"), lit(0))).as("n_contaminated"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_clean"))
      .orderBy("lang")
  }

  /** PII redaction: scrub email addresses and phone-shaped digit runs to
    * typed placeholders. The synthetic corpus carries no PII, so the query
    * plants a deterministic email + phone per document (derived from
    * doc_id) before scrubbing — the differential then verifies the regex
    * semantics end-to-end, including counts and the redacted text itself.
    * One codegen'd map stage; no shuffle until the final sort. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val pii = concat(col("text"),
      lit(" contact u"), col("doc_id").cast("string"),
      lit("@mail.example.com or call 555-"),
      lpad(pmod(col("doc_id") * 37L, lit(10000L)).cast("string"), 4, "0"))
    val emailRe = "[a-z0-9._]+@[a-z0-9.]+"
    val phoneRe = "\\d{3}-\\d{4}"
    val red = regexp_replace(
      regexp_replace(pii, emailRe, "<EMAIL>"), phoneRe, "<PHONE>")
    load(spark, dir, "documents")
      .select(col("doc_id"),
        regexp_count(pii, lit(emailRe)).as("n_emails"),
        regexp_count(pii, lit(phoneRe)).as("n_phones"),
        length(red).as("red_len"),
        substring(red, -40, 40).as("red_tail"))
      .orderBy("doc_id")
  }

  private val piiRedactOracle: String =
    """WITH p AS (SELECT doc_id,
      |  text || ' contact u' || CAST(doc_id AS VARCHAR) ||
      |  '@mail.example.com or call 555-' ||
      |  lpad(CAST((doc_id * 37) % 10000 AS VARCHAR), 4, '0') AS pii
      |  FROM documents),
      |r AS (SELECT doc_id, pii,
      |  regexp_replace(regexp_replace(pii, '[a-z0-9._]+@[a-z0-9.]+',
      |    '<EMAIL>', 'g'), '\d{3}-\d{4}', '<PHONE>', 'g') AS red
      |  FROM p)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(pii, '[a-z0-9._]+@[a-z0-9.]+')) AS INT)
      |    AS n_emails,
      |  CAST(len(regexp_extract_all(pii, '\d{3}-\d{4}')) AS INT) AS n_phones,
      |  length(red) AS red_len,
      |  substr(red, length(red) - 39, 40) AS red_tail
      |FROM r ORDER BY doc_id""".stripMargin

  /** Gopher-style repetition signals per document: duplicate word-bigram
    * fraction and top-word mass fraction. Bigram stats are array
    * expressions (no explode); the top-word count is a two-level keyed
    * aggregate with map-side partials.
    *
    * Bigrams are hashed token-pairs (multi-arg xxhash64, no concat'd
    * strings): only their COUNTS reach the output and distinct-ness is
    * hash-independent, so the string-bigram DuckDB oracle remains an
    * exact differential — same reasoning as [[decontaminate]].
    * `dup_2gram_frac` is NULL-guarded for <2-token documents on both
    * engines (Spark x/0 = NULL, DuckDB float 0/0 = NaN would diverge).
    *
    * Both the token array and the bigram array are BOUND as projected
    * columns before anything references them twice: interpreted HOF
    * lambdas re-evaluate embedded trees per element, and `size(x)` +
    * `size(array_distinct(x))` would otherwise compute the bigrams twice
    * (each time re-tokenizing per element — the round-5 hot spot). */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val wc = col("w")
    val base = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("w"))
      .withColumn("bigrams", when(size(wc) >= 2,
        transform(sequence(lit(2), size(wc)),
          i => xxhash64(element_at(wc, i - 1), element_at(wc, i))))
        .otherwise(array().cast("array<bigint>")))
      .select(col("doc_id"), size(wc).as("n_words"),
        size(col("bigrams")).as("n_2grams"),
        size(array_distinct(col("bigrams"))).as("n_dist_2grams"))
    val top = docs.select(col("doc_id"), explode(Text.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_word_n"))
    base.join(top, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("top_word_n"),
        col("n_2grams"), col("n_dist_2grams"),
        when(col("n_2grams") > 0,
          (col("n_2grams") - col("n_dist_2grams")) / col("n_2grams"))
          .as("dup_2gram_frac"),
        (col("top_word_n") / col("n_words")).as("top_word_frac"))
      .orderBy("doc_id")
  }

  private val textRepetitionOracle: String =
    """WITH w AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, ' +'), x -> x != '') AS w
      |  FROM documents),
      |b AS (SELECT doc_id, len(w) AS n_words,
      |  CASE WHEN len(w) >= 2 THEN list_transform(generate_series(2, len(w)),
      |    i -> w[i-1] || ' ' || w[i]) ELSE [] END AS bg
      |  FROM w),
      |base AS (SELECT doc_id, CAST(n_words AS INT) AS n_words,
      |  CAST(len(bg) AS INT) AS n_2grams,
      |  CAST(len(list_distinct(bg)) AS INT) AS n_dist_2grams FROM b),
      |top AS (SELECT doc_id, max(c) AS top_word_n FROM (
      |  SELECT doc_id, t, count(*) AS c FROM
      |    (SELECT doc_id, unnest(w) AS t FROM w) u GROUP BY doc_id, t) g
      |  GROUP BY doc_id)
      |SELECT base.doc_id, n_words, top_word_n, n_2grams, n_dist_2grams,
      |  (n_2grams - n_dist_2grams) / CAST(NULLIF(n_2grams, 0) AS DOUBLE)
      |    AS dup_2gram_frac,
      |  top_word_n / CAST(n_words AS DOUBLE) AS top_word_frac
      |FROM base JOIN top ON top.doc_id = base.doc_id
      |ORDER BY base.doc_id""".stripMargin

  /** Deterministic hash-based stratified sampling: per-language keep
    * rates (en 30%, others 60%) applied by bucketing an md5-derived hash
    * of the doc id — reproducible across runs, engines, and cluster
    * sizes, unlike `DataFrame.sample`. Pure map-side filter; no shuffle
    * beyond the output sort. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(
      Dedup.md5Hash60(concat(lit("smp"), col("doc_id").cast("string"))),
      lit(100L))
    val rate = when(col("lang") === "en", 30L).otherwise(60L)
    load(spark, dir, "documents")
      .withColumn("bucket", bucket)
      .filter(col("bucket") < rate)
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy("doc_id")
  }

  private val sampleStratifiedOracle: String =
    """WITH b AS (SELECT doc_id, lang,
      |  CAST('0x' || substr(md5('smp' || CAST(doc_id AS VARCHAR)), 2, 15)
      |    AS BIGINT) % 100 AS bucket
      |  FROM documents)
      |SELECT doc_id, lang, bucket FROM b
      |WHERE bucket < CASE WHEN lang = 'en' THEN 30 ELSE 60 END
      |ORDER BY doc_id""".stripMargin

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res):
    * each doc draws a deterministic uniform u from an md5 hash and a
    * sampling key u^(1/w); the global top-k keys ARE a weighted sample
    * without replacement — the importance-sampling primitive behind
    * quality-weighted data selection, in ONE pass. Here w = whitespace
    * token count (longer docs proportionally likelier), k = 100.
    *
    * Scale shape: a map-side key computation + a global top-k
    * (TakeOrdered — each partition forwards at most k rows, no corpus
    * shuffle). Reproducible across runs, cluster sizes AND engines: u is
    * hash-derived (53-bit mantissa-exact), and the key exponent is the
    * ALL-INTEGER y = (L(2^53+2) - L(h+1)) DIV w in 2^-20 log2 units via
    * the portable digit extraction (key = u^(1/w) = 2^(-y/2^20); libm
    * pow was the last 1-ulp caveat in the suite). Ranking is by integer
    * y ascending (exactly key descending — the exp2 map is monotone in
    * exact arithmetic, and ordering by the integer sidesteps any 1-ulp
    * non-monotonicity in the reconstructed double), doc_id tie-break;
    * the displayed key is the portable exp2 of y, bit-identical across
    * engines. */
  /** The one A-Res keying both weighted-sampling gates rank over: a
    * deterministic uniform u per doc (md5-derived, 53-bit
    * mantissa-exact), w = token count, key = u^(1/w). ONE definition so
    * a change to the salt, modulus, or w-filter can never diverge the
    * global and per-source gates. */
  private def aResKeyed(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableMath._
    val lc = lit(graft.functions.PortableMath
      .log2MicroConst((1L << 53) + 2L, 1L))
    load(spark, dir, "documents")
      .withColumn("w", size(Text.tokens(col("text"))).cast("long"))
      .filter(col("w") > 0)
      .withColumn("h1", pmod(Dedup.md5Hash60(
        concat(lit("wsmp"), col("doc_id").cast("string"))),
        lit(1L << 53)) + 1L)
      .withColumn("y", longDiv(
        lc - log2Micro(col("h1"), lit(1L)), col("w")))
      .withColumn("key", {
        val yi = longDiv(col("y"), lit(1048576L))
        lit(1.0) / (pow2(yi).cast("double") *
          exp2MicroFrac(col("y") - yi * lit(1048576L)))
      })
  }

  def sampleWeighted(spark: SparkSession, dir: String): DataFrame =
    aResKeyed(spark, dir)
      .orderBy(col("y").asc, col("doc_id").asc)
      .limit(100)
      .select(col("doc_id"), col("w"), col("key"))
      .orderBy("doc_id")

  /** PER-SOURCE weighted sampling — the A-Res key of [[sampleWeighted]]
    * rank-limited within each source (keep the 20 highest keys per
    * source): the per-domain quota form of importance sampling (cap
    * every source's contribution while preferring its weightiest docs).
    * The row_number() <= 20 filter rewrites into the custom partial
    * [[graft.plans.TopKPerGroup]] BELOW the exchange, so a mega-source
    * forwards at most 20 rows per map task instead of its whole
    * candidate set — same plan contract as sourceCap, pinned in
    * PlanShapeSpec.
    *
    * Same all-integer y ranking as [[sampleWeighted]] (one cut boundary
    * per source instead of one global one) — exact on both engines, no
    * margin argument needed. */
  def sampleWeightedPerGroup(spark: SparkSession, dir: String): DataFrame =
    aResKeyed(spark, dir)
      .withColumn("rn", row_number().over(Window.partitionBy("source")
        .orderBy(col("y").asc, col("doc_id").asc)))
      .filter(col("rn") <= 20)
      .select(col("source"), col("doc_id"), col("w"), col("key"))
      .orderBy("source", "doc_id")

  /** Shared oracle front half: per-doc (w, h1) then the portable-log2
    * integer exponent y = (Lc − L(h1)) DIV w and the exp2 key. */
  private def aResOracleCtes(withSource: Boolean): String = {
    val src = if (withSource) "source, " else ""
    val lc = graft.functions.PortableMath.log2MicroConst((1L << 53) + 2L, 1L)
    s"""b AS (SELECT ${src}doc_id,
      |  CAST(len(list_filter(regexp_split_to_array(text, ' +'),
      |    x -> x != '')) AS BIGINT) AS w,
      |  CAST('0x' || substr(md5('wsmp' || CAST(doc_id AS VARCHAR)),
      |      2, 15) AS BIGINT) % 9007199254740992 + 1 AS h1
      |  FROM documents),
      |hp AS (SELECT DISTINCT h1 AS hrn, CAST(1 AS BIGINT) AS hrd FROM b
      |  WHERE w > 0),
      |""".stripMargin +
    graft.functions.PortableMath.sqlLog2MicroCtes("hp", "hrn", "hrd", "klg") +
    s""",
      |ky AS (SELECT ${src}b.doc_id, b.w,
      |    ($lc - l.lmicro) // b.w AS y
      |  FROM b JOIN klg l ON l.pm_num = b.h1 AND l.pm_den = 1
      |  WHERE b.w > 0),
      |k AS (SELECT ${src}doc_id, w, y,
      |    CAST('1.0' AS DOUBLE) /
      |      (CAST(CAST(1 AS BIGINT) << (y // 1048576) AS DOUBLE) *
      |       ${graft.functions.PortableMath
        .sqlExp2MicroFrac("y % 1048576")}) AS key
      |  FROM ky)""".stripMargin
  }

  private val sampleWeightedPerGroupOracle: String =
    "WITH RECURSIVE " + aResOracleCtes(withSource = true) + """,
      |r AS (SELECT source, doc_id, w, key,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY y ASC, doc_id ASC) AS rn
      |  FROM k)
      |SELECT source, doc_id, w, key
      |FROM r WHERE rn <= 20 ORDER BY source, doc_id""".stripMargin

  private val sampleWeightedOracle: String =
    "WITH RECURSIVE " + aResOracleCtes(withSource = false) + """
      |SELECT doc_id, w, key FROM (
      |  SELECT doc_id, w, key FROM k
      |  ORDER BY y ASC, doc_id ASC LIMIT 100) t
      |ORDER BY doc_id""".stripMargin

  /** Embedding normalization + int8 quantization signals: l2 norm, the
    * first unit-vector component, and the symmetric max-abs int8
    * quantization of the first component plus the per-vector quantized
    * l1 mass. Folds run left-to-right from a 0.0 init on both engines
    * (0.0 + x == x exactly), so the doubles are bit-identical and the
    * round(...,6) is belt-and-braces. Pure map stage.
    *
    * All-zero vectors are NULL-guarded on both engines (l2 = 0 makes u1 a
    * 0/0 and maxabs = 0 makes the quantizer x/0; Spark yields NULL, IEEE
    * DuckDB would yield NaN/Inf — the guard makes the differential robust
    * even if the fixture ever grows a zero vector).
    *
    * `l2` and `maxabs` are BOUND as projected columns before the fold
    * lambdas reference them: `maxabs` is itself an interpreted HOF, and
    * embedding it inside the quantizer fold re-evaluated it ~2× per
    * vector element (the round-5 1.6× regression). Bound attributes are
    * O(1) row reads. */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame = {
    val v = col("v")
    val l2 = col("l2")
    val maxabs = col("maxabs")
    val q = (x: Column) =>
      when(maxabs > 0, round(x * 127.0 / maxabs).cast("long"))
    load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("l2", sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x)))
      .withColumn("maxabs", array_max(transform(v, x => abs(x))))
      .select(col("vec_id"),
        round(l2, 6).as("l2"),
        round(when(l2 > 0, element_at(v, 1) / l2), 6).as("u1"),
        q(element_at(v, 1)).as("q1"),
        when(maxabs > 0,
          aggregate(v, lit(0L), (a, x) => a + abs(q(x)))).as("q_l1"))
      .orderBy("vec_id")
  }

  private val embedQuantizeOracle: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |  sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(v, x -> x * x)), (a, x) -> a + x)) AS l2,
      |  list_max(list_transform(v, x -> abs(x))) AS maxabs
      |  FROM e)
      |SELECT vec_id, round(l2, 6) AS l2,
      |  round(v[1] / NULLIF(l2, 0), 6) AS u1,
      |  CAST(round(v[1] * 127.0 / NULLIF(maxabs, 0)) AS BIGINT) AS q1,
      |  CASE WHEN maxabs > 0 THEN
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(v,
      |      x -> abs(CAST(round(x * 127.0 / maxabs) AS BIGINT)))),
      |      (a, x) -> a + x) END AS q_l1
      |FROM s ORDER BY vec_id""".stripMargin

  /** Context-window sequence packing: documents are packed per language
    * in doc_id order into 512-token bins by cumulative token count (a
    * document whose budget is already exhausted starts the next bin).
    * The running sum is one window over (lang, doc_id) — the packing
    * never materializes pairwise state, so it scales as a single sort
    * per language partition. */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    HotKeyAdvisor.advise(load(spark, dir, "documents"), Seq("lang"),
        "CurateOps.packSequences", "packSequencesChunked")
      .withColumn("n_tokens", Text.tokenCount(col("text")).cast("long"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / lit(512.0)))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
      .orderBy("lang", "bin")
  }

  private val packSequencesOracle: String =
    """WITH t AS (SELECT doc_id, lang,
      |  CAST(len(list_filter(regexp_split_to_array(text, ' +'), x -> x != ''))
      |    AS BIGINT) AS n FROM documents),
      |c AS (SELECT lang, n,
      |  COALESCE(sum(n) OVER (PARTITION BY lang ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |  FROM t)
      |SELECT lang, CAST(floor(cum_before / 512.0) AS BIGINT) AS bin,
      |  count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS bin_tokens
      |FROM c GROUP BY lang, bin ORDER BY lang, bin""".stripMargin

  /** Skew-safe sequence packing: [[packSequences]]'s per-language running
    * sum sorts EVERY document of a language in one task — and language
    * skew is not an adversarial corner but the guaranteed shape of any
    * real crawl (English alone is ~half of CommonCrawl; this fixture is
    * 43% `en`). The round-17 wave-3 skew probe measures the mega-lang
    * replica against the uniform one; this form is the structural
    * mitigation, the chunk-and-stitch prefix sum (the same two-pass
    * decomposition [[OlapOps.sessionizeChunkedEvents]] applies to session
    * chains):
    *
    *  1. documents partition by (lang, doc_id-range CHUNK) — the heavy
    *     per-row running sum runs chunk-parallel, so a language's volume
    *     spreads over range/chunkSpan tasks;
    *  2. each (lang, chunk) reduces to ONE total-token row — corpus-sized
    *     data never crosses the second shuffle;
    *  3. a per-language prefix sum over those chunk totals (rows ∝ chunk
    *     count, never document count) gives each chunk its global token
    *     offset, broadcast-joined back onto the local running sums.
    *
    * `chunk = floor(doc_id / chunkSpan)` is monotone in doc_id, so
    * (chunk asc, doc_id asc) IS doc_id order and local+offset reproduces
    * the plain form's cumulative sum exactly — integer addition, no
    * rounding seam; bit-identical output pinned by CurateOpsSpec and the
    * shared differential oracle. `chunkSpan` trades parallelism (smaller
    * chunks) against stitch-relation size (more chunk totals). */
  def packSequencesChunked(spark: SparkSession, dir: String,
      chunkSpan: Long = 4096L): DataFrame = {
    require(chunkSpan >= 1, "chunkSpan must be positive")
    val byLangChunk = Window.partitionBy("lang", "chunk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val docs = load(spark, dir, "documents")
      .withColumn("n_tokens", Text.tokenCount(col("text")).cast("long"))
      .withColumn("chunk", floor(col("doc_id") / chunkSpan).cast("long"))
    // the stitch relation is one row per (lang, chunk) — bounded by id
    // range / chunkSpan, never by corpus size; its per-lang prefix window
    // is proportionally smaller than the corpus by the same factor
    val byLang = Window.partitionBy("lang").orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = docs.groupBy("lang", "chunk")
      .agg(sum("n_tokens").as("chunk_tokens"))
      .withColumn("offset",
        coalesce(sum("chunk_tokens").over(byLang), lit(0L)))
      .select(col("lang").as("o_lang"), col("chunk").as("o_chunk"),
        col("offset"))
    docs
      .withColumn("local_before",
        coalesce(sum("n_tokens").over(byLangChunk), lit(0L)))
      // null-safe on lang: the plain form (and the oracle's GROUP BY)
      // keeps a null language as its own group — an equi-join here
      // would silently drop it
      .join(broadcast(offsets), col("lang") <=> col("o_lang") &&
        col("chunk") === col("o_chunk"))
      .drop("o_lang", "o_chunk")
      .withColumn("cum_before", col("local_before") + col("offset"))
      .withColumn("bin", floor(col("cum_before") / lit(512.0)))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
      .orderBy("lang", "bin")
  }

  /** Exact median (and extrema) of order value per priority class, via
    * explicit rank selection rather than an engine percentile primitive —
    * the selection is reproducible in any engine and the only shuffle is
    * the per-priority sort. */
  def aggMedianRank(spark: SparkSession, dir: String): DataFrame = {
    val orders = load(spark, dir, "orders")
    val w = Window.partitionBy("o_orderpriority")
      .orderBy("o_totalprice", "o_orderkey")
    val ranked = orders
      .select(col("o_orderpriority"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy("o_orderpriority")).as("n"))
    ranked
      .filter(col("rn") === floor((col("n") + 1) / lit(2.0)) ||
        col("rn") === ceil((col("n") + 1) / lit(2.0)))
      .groupBy("o_orderpriority")
      .agg((sum("o_totalprice") / count(lit(1))).as("median_price"),
        max("n").as("n_orders"))
      .orderBy("o_orderpriority")
  }

  private val aggMedianRankOracle: String =
    """WITH r AS (SELECT o_orderpriority, o_totalprice,
      |  row_number() OVER (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice, o_orderkey) AS rn,
      |  count(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM orders)
      |SELECT o_orderpriority,
      |  sum(o_totalprice) / count(*) AS median_price,
      |  max(n) AS n_orders
      |FROM r
      |WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
      |   OR rn = CAST(ceil((n + 1) / 2.0) AS BIGINT)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Quartile + cumulative-distribution windows over customer balances
    * within each nation (unique total order via the custkey tie-break, so
    * every peer group is a singleton and both engines agree exactly). */
  /** cume_dist is emitted as an EXACT integer ppm, not a rounded double:
    * the window order is unique (custkey tiebreak), so cume_dist ≡
    * row_number/partition_count, and `rn*1e6 DIV n` is pure integer
    * arithmetic both engines floor identically. The round-6 double form
    * failed the sf0.1 sweep on 3 rows — partition sizes like 640 make
    * k/n a TERMINATING 7-digit decimal, so round(x, 6) hits exact .5
    * ties that Spark (HALF_UP) and DuckDB resolve differently; no
    * rounding rule fixes a genuine tie, so the gate leaves the rational
    * in integers. */
  def windowNtile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    val wAll = Window.partitionBy("c_nationkey")
    load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        ntile(4).over(w).as("quartile"),
        (row_number().over(w).cast("long") * lit(1000000L))
          .as("rn_scaled"),
        count(lit(1)).over(wAll).as("n_part"))
      .select(col("c_custkey"), col("c_nationkey"), col("quartile"),
        // integral DIV, never double /: floor(double(a/b)) can flip at
        // representation boundaries; a DIV b is exact in both engines
        expr("rn_scaled DIV n_part").as("cd_ppm"))
      .orderBy("c_custkey")
  }

  private val windowNtileOracle: String =
    """SELECT c_custkey, c_nationkey,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  (CAST(row_number() OVER w AS BIGINT) * 1000000)
      |    // count(*) OVER (PARTITION BY c_nationkey) AS cd_ppm
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Distributed training of a linear quality classifier — the fastText /
    * CCNet-style "learn a cheap model from weak labels, score the whole
    * corpus" step. Weak labels distill a heuristic rule (stopword
    * density >= 1/16, a median split on this corpus); features are
    * (bias, n_tokens, n_stopwords); the model is the least-squares
    * linear probability fit, thresholded at 1/2.
    *
    * Trained the way a closed-form model should be trained on a
    * cluster: ONE map-side-combined aggregate computes the complete
    * normal-equation sufficient statistics (the nine moment sums of
    * X'X and X'y — a fixed-size result regardless of corpus size), the
    * driver solves the 3x3 system EXACTLY over BigInt via Cramer's
    * rule, and scoring broadcasts the integer determinants back into a
    * codegen'd margin expression — prediction is the SIGN of
    * 2*(d0 + d1*x1 + d2*x2) - det(A), an all-integer comparison, so
    * the whole model (fit AND scores) replays bit-for-bit in the
    * oracle's HUGEINT CTEs with zero float anywhere. (A batch
    * perceptron was tried first and oscillated between the all-positive
    * and all-negative classifiers on unit-lr batch updates — the
    * closed form has no epochs to oscillate.) The determinant literals
    * ride as DECIMAL(38,0): they grow as the CUBE of corpus moments,
    * past int64 at a few hundred thousand documents, and the moment
    * sums themselves ride DECIMAL(38,0) (sum(x1²) passes int64 around
    * 10^9 large documents). Driver exchange is nine exact decimals in,
    * four integers out — the sufficient-statistics
    * pattern of MLlib's own WeightedLeastSquares normal solver.
    * Returns per-document (y, pred) — 96% agreement with the
    * distilled rule on this corpus, predictions non-degenerate. */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val feats = load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        Text.tokenCount(col("text")).cast("long").as("x1"),
        Text.vocabHits(col("text"), Seq("the", "a")).cast("long").as("x2"))
      .withColumn("y", when(col("x2") * 16L >= col("x1"), 1L).otherwise(0L))
    // moments accumulate in DECIMAL(38,0): sum(x1*x1) over 10^9 docs of
    // 10^5 tokens is ~10^19 — past int64, and the determinants cube it
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val (d1, d2, dy) =
      (col("x1").cast(dec), col("x2").cast(dec), col("y").cast(dec))
    val m = feats.agg(
      count(lit(1)).cast(dec).as("n"), sum(d1).as("s1"), sum(d2).as("s2"),
      sum(d1 * d1).as("s11"), sum(d1 * d2).as("s12"),
      sum(d2 * d2).as("s22"),
      sum(dy).as("b0"), sum(d1 * dy).as("b1"), sum(d2 * dy).as("b2"))
      .head()
    val Seq(n, s1, s2, s11, s12, s22, b0, b1, b2) =
      (0 until 9).map(i => BigInt(m.getDecimal(i).toBigIntegerExact))
    def det3(a: Seq[Seq[BigInt]]): BigInt =
      a(0)(0) * (a(1)(1) * a(2)(2) - a(1)(2) * a(2)(1)) -
        a(0)(1) * (a(1)(0) * a(2)(2) - a(1)(2) * a(2)(0)) +
        a(0)(2) * (a(1)(0) * a(2)(1) - a(1)(1) * a(2)(0))
    val a = Seq(Seq(n, s1, s2), Seq(s1, s11, s12), Seq(s2, s12, s22))
    val b = Seq(b0, b1, b2)
    val dd = det3(a)
    require(dd != 0, "singular normal equations: degenerate features")
    val ds = (0 until 3).map { i =>
      det3(a.indices.map(r => a(r).updated(i, b(r))))
    }
    def decLit(v: BigInt): Column =
      lit(new java.math.BigDecimal(v.bigInteger))
    val margin = decLit(2 * ds(0) - dd) +
      decLit(2 * ds(1)) * col("x1") + decLit(2 * ds(2)) * col("x2")
    val pred = if (dd > 0) when(margin >= 0, 1L).otherwise(0L)
      else when(margin <= 0, 1L).otherwise(0L)
    feats.select(col("doc_id"), col("lang"), col("y"), pred.as("pred"))
      .orderBy("doc_id")
  }

  /** The same fit in SQL: moment sums land in DuckDB HUGEINT (its
    * sum(BIGINT) widening), Cramer determinants and margins stay exact
    * 128-bit integers end to end. */
  private val qualityClassifierOracle: String =
    """WITH f AS (SELECT doc_id, lang,
      |    CAST(len(list_filter(regexp_split_to_array(text, ' +'),
      |      w -> w != '')) AS BIGINT) AS x1,
      |    CAST(len(list_filter(regexp_split_to_array(text, ' +'),
      |      w -> w = 'the' OR w = 'a')) AS BIGINT) AS x2
      |  FROM documents),
      |fy AS (SELECT doc_id, lang, x1, x2,
      |    CASE WHEN x2 * 16 >= x1 THEN 1 ELSE 0 END AS y FROM f),
      |m AS (SELECT count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
      |    sum(x1 * x1) AS s11, sum(x1 * x2) AS s12, sum(x2 * x2) AS s22,
      |    sum(y) AS b0, sum(x1 * y) AS b1, sum(x2 * y) AS b2 FROM fy),
      |d AS (SELECT
      |    n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
      |      + s2 * (s1 * s12 - s11 * s2) AS dd,
      |    b0 * (s11 * s22 - s12 * s12) - s1 * (b1 * s22 - s12 * b2)
      |      + s2 * (b1 * s12 - s11 * b2) AS d0,
      |    n * (b1 * s22 - s12 * b2) - b0 * (s1 * s22 - s12 * s2)
      |      + s2 * (s1 * b2 - b1 * s2) AS d1,
      |    n * (s11 * b2 - b1 * s12) - s1 * (s1 * b2 - b1 * s2)
      |      + b0 * (s1 * s12 - s11 * s2) AS d2
      |  FROM m)
      |SELECT doc_id, lang, CAST(y AS BIGINT) AS y,
      |  CAST(CASE WHEN dd > 0 THEN
      |      (CASE WHEN 2 * (d0 + d1 * x1 + d2 * x2) - dd >= 0
      |        THEN 1 ELSE 0 END)
      |    ELSE (CASE WHEN 2 * (d0 + d1 * x1 + d2 * x2) - dd <= 0
      |        THEN 1 ELSE 0 END) END AS BIGINT) AS pred
      |FROM fy, d ORDER BY doc_id""".stripMargin

  /** Balanced training-shard assignment + deterministic corpus shuffle —
    * the last step before a corpus ships to a trainer: every document
    * gets (shard, pos_in_shard) such that (a) shard token totals are
    * near-balanced, (b) the whole layout is a pure function of the
    * corpus + seed (re-runs byte-identical — required for resumable
    * training), and (c) within-shard order is a seeded pseudo-random
    * shuffle, decorrelated from crawl/source order (in-order corpora
    * gradient-bias training; shuffling at shard-build time is what makes
    * sequential shard reads cheap at train time).
    *
    * Balance comes from SNAKE (boustrophedon) assignment over the
    * global token-count ranking: rank docs by size desc, deal rank
    * blocks of S across shards alternating direction — each shard gets
    * one doc per block, and direction-alternation cancels the
    * within-block size gradient (deterministic counterpart of greedy
    * LPT, but expressible as pure arithmetic on the rank — no
    * sequential state). The global ranking uses [[Layout.globalRank]]
    * (range-partition + local rank + offsets), NOT an unpartitioned
    * window — see its scaladoc for why that matters at 100 TB. The
    * shuffle key is the portable md5-60 of (seed, doc_id), so the
    * oracle replays the full layout bit-for-bit. */
  def shardBalance(spark: SparkSession, dir: String): DataFrame = {
    val shards = 8
    val docs = load(spark, dir, "documents")
      .select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
    val ranked = Layout.globalRank(docs, 16,
      col("n_tokens").desc, col("doc_id"))
    val r0 = ranked("rank") - 1L
    val pos = pmod(r0, lit(shards.toLong))
    val assigned = ranked
      .withColumn("shard",
        when(pmod(floor(r0 / shards.toLong), lit(2L)) === 0L, pos)
          .otherwise(lit(shards.toLong - 1L) - pos).cast("int"))
      .withColumn("sk", Dedup.md5Hash60(
        concat(lit("shuf42:"), col("doc_id").cast("string"))))
    // within-shard positions via the SAME two-pass distributed rank —
    // a row_number window partitioned by the S shards would funnel 1/S
    // of the corpus through one task; instead rank globally on
    // (shard, sk, doc_id) and subtract each shard's start offset (an
    // S-row meta-read, broadcast back)
    val shuffled = Layout.globalRank(assigned.drop("rank"), 16,
      col("shard"), col("sk"), col("doc_id"))
    val shardCounts = shuffled.groupBy("shard")
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offs = shardCounts.map(_._2).scanLeft(0L)(_ + _)
    import spark.implicits._
    val offDf = shardCounts.map(_._1).zip(offs).toSeq.toDF("shard", "s_off")
    shuffled.join(broadcast(offDf), Seq("shard"))
      .select(col("doc_id"), col("n_tokens"), col("shard"),
        (col("rank") - col("s_off")).as("pos_in_shard"))
      .orderBy("doc_id")
  }

  private val shardBalanceOracle: String =
    """WITH t AS (SELECT doc_id,
      |    CAST(len(list_filter(regexp_split_to_array(text, ' +'),
      |      w -> w != '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |r AS (SELECT doc_id, n_tokens,
      |    row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS r0
      |  FROM t),
      |a AS (SELECT doc_id, n_tokens,
      |    CAST(CASE WHEN ((r0 // 8) % 2) = 0 THEN r0 % 8
      |      ELSE 7 - (r0 % 8) END AS INT) AS shard
      |  FROM r),
      |k AS (SELECT a.*,
      |    CAST('0x' || substr(md5('shuf42:' || CAST(doc_id AS VARCHAR)),
      |      2, 15) AS BIGINT) AS sk
      |  FROM a)
      |SELECT doc_id, n_tokens, shard,
      |  CAST(row_number() OVER (PARTITION BY shard ORDER BY sk, doc_id)
      |    AS BIGINT) AS pos_in_shard
      |FROM k ORDER BY doc_id""".stripMargin

  /** Corpus mixture weighting: per-source token mass and the resampling
    * weight that would equalize every source's share (weight =
    * uniform-share / actual-share). The corpus-wide totals come from a
    * one-row aggregate cross-joined back (the [[graft.graph.PageRank]]
    * dangling-mass pattern), NOT an unpartitioned window — same
    * sources-sized frame, but no single-partition WindowExec. */
  def mixtureWeights(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint the sources-sized rollup: it feeds BOTH the totals
    // aggregate and the final projection, and plan-canonicalization
    // exchange reuse is not guaranteed to dedupe the repeated subtree
    // (measured: mixtureTemperature ran 5 corpus scans un-materialized)
    // — at 100 TB each missed reuse is a full corpus scan. The
    // checkpointed frame is ~|sources| rows; the cost is one scan, the
    // guarantee is exactly one.
    val perSource = load(spark, dir, "documents")
      .withColumn("n_tokens", Text.tokenCount(col("text")).cast("long"))
      .groupBy("source").agg(sum("n_tokens").as("src_tokens"))
      .localCheckpoint()
    val totals = perSource.agg(sum("src_tokens").as("total"),
      count(lit(1)).as("n_src"))
    perSource.crossJoin(broadcast(totals))
      .select(col("source"), col("src_tokens"),
        // exact integer ppm, never round(ratio, 6): total/(n_src·src)
        // is a small-integer rational, and smooth denominators make it
        // a terminating decimal — an exact tie the engines round apart
        // (the q_window_ntile class from the sf0.1 sweep)
        graft.functions.PortableMath.longDiv(
          col("total") * lit(1000000L),
          col("n_src") * col("src_tokens")).as("weight_ppm"))
      .orderBy("source")
  }

  private val mixtureWeightsOracle: String =
    """WITH s AS (SELECT source,
      |  CAST(sum(len(list_filter(regexp_split_to_array(text, ' +'),
      |    x -> x != ''))) AS BIGINT) AS src_tokens
      |  FROM documents GROUP BY source),
      |t AS (SELECT source, src_tokens,
      |  sum(src_tokens) OVER () AS total, count(*) OVER () AS n_src FROM s)
      |SELECT source, src_tokens,
      |  (CAST(total AS BIGINT) * 1000000)
      |    // (CAST(n_src AS BIGINT) * src_tokens) AS weight_ppm
      |FROM t ORDER BY source""".stripMargin

  /** Temperature-scaled mixture sampling (the mT5 / XLM-R / Pile
    * exponential-smoothing convention): per-source sampling probability
    * ∝ share^α with α = 0.7 — α < 1 FLATTENS toward uniform, so small
    * sources are upweighted (oversample > 1) and the dominant source is
    * downweighted, but less aggressively than [[mixtureWeights]]'s
    * hard-uniform target; α = 1 reproduces natural proportions. Output:
    * natural share, temperature-scaled sampling probability, and the
    * per-document oversampling factor (t_share/share) a sampler applies.
    *
    * Determinism: shares are exact-integer token counts divided once;
    * pow/normalization run on identical doubles in both engines (the
    * same single-expression transcendental contract as exp/ln in
    * [[LmOps]]), and outputs round to 6. The whole computation after
    * the per-source aggregate runs on a sources-sized frame. */
  def mixtureTemperature(spark: SparkSession, dir: String): DataFrame = {
    // materialized once (see mixtureWeights): four downstream references
    // would otherwise re-derive the corpus scan wherever exchange reuse
    // misses — measured 5 scans / 22 aggregates before the checkpoint
    val perSource = load(spark, dir, "documents")
      .withColumn("n_tokens", Text.tokenCount(col("text")).cast("long"))
      .groupBy("source").agg(sum("n_tokens").as("src_tokens"))
      .localCheckpoint()
    // corpus-wide normalizers as broadcast one-row aggregates (the
    // PageRank dangling-mass pattern) rather than unpartitioned windows
    // share^0.7 with NO libm: share = s/T <= 1, so
    //   share^0.7 = 2^(-(7·log2(T/s)) / 10) = 2^-Ai · 2^(-Af/2^20)
    // via the portable log2 digit extraction and the iterated-sqrt-of-2
    // product (PortableMath) — Java pow and DuckDB pow differ by ulps,
    // and the pico-quantization below would amplify one boundary hit
    // into a pq_total (and thus every t_share) mismatch. The displayed
    // ratios stay UNROUNDED doubles: single divisions of identical
    // integers are bit-identical; only rounding them introduced ties.
    import graft.functions.PortableMath
    val shared = perSource
      .crossJoin(broadcast(perSource.agg(sum("src_tokens").as("tok_total"))))
      .withColumn("share",
        col("src_tokens").cast("double") / col("tok_total"))
      .withColumn("a", PortableMath.longDiv(
        PortableMath.log2Micro(col("tok_total"), col("src_tokens")) * 7L,
        lit(10L)))
      .withColumn("ai", PortableMath.longDiv(col("a"), lit(1048576L)))
      .withColumn("p07", lit(1.0) /
        (PortableMath.pow2(col("ai")).cast("double") *
          PortableMath.exp2MicroFrac(col("a") - col("ai") * 1048576L)))
      // quantize the powered share to pico-units BEFORE the normalizing
      // sum: a double sum is partition-order-dependent, an integer sum
      // is exact in any order (the LmOps contract). Floor at 1
      // pico-unit — a present source must never quantize to sampling
      // probability zero, however tiny its share. (round-to-INTEGER of
      // the now-identical double is safe: both engines round half away
      // from zero.)
      .withColumn("pq", greatest(
        round(col("p07") * lit(1e12), 0).cast("long"), lit(1L)))
    shared
      .crossJoin(broadcast(shared.agg(sum("pq").as("pq_total"))))
      .withColumn("t_share",
        col("pq").cast("double") / col("pq_total"))
      .select(col("source"), col("src_tokens"),
        col("share"), col("t_share"),
        (col("t_share") / col("share")).as("oversample"))
      .orderBy("source")
  }

  private val mixtureTemperatureOracle: String =
    """WITH RECURSIVE s AS (SELECT source,
      |  CAST(sum(len(list_filter(regexp_split_to_array(text, ' +'),
      |    x -> x != ''))) AS BIGINT) AS src_tokens
      |  FROM documents GROUP BY source),
      |sh AS (SELECT source, src_tokens,
      |    CAST(sum(src_tokens) OVER () AS BIGINT) AS tok_total,
      |    CAST(src_tokens AS DOUBLE) / sum(src_tokens) OVER () AS share
      |  FROM s),
      |lp AS (SELECT DISTINCT tok_total, src_tokens FROM sh),
      |""".stripMargin +
    graft.functions.PortableMath
      .sqlLog2MicroCtes("lp", "tok_total", "src_tokens", "lgt") +
    s""",
      |pw AS (SELECT sh.source, sh.src_tokens, sh.share,
      |    (l.lmicro * 7) // 10 AS a,
      |    ((l.lmicro * 7) // 10) // 1048576 AS ai
      |  FROM sh JOIN lgt l ON l.pm_num = sh.tok_total
      |    AND l.pm_den = sh.src_tokens),
      |p AS (SELECT source, src_tokens, share,
      |    greatest(CAST(round((1.0 / (CAST(CAST(1 AS BIGINT) << ai
      |        AS DOUBLE) *
      |      ${graft.functions.PortableMath
        .sqlExp2MicroFrac("a - ai * 1048576")})) * 1e12) AS BIGINT), 1)
      |      AS pq FROM pw),
      |t AS (SELECT source, src_tokens, share,
      |    CAST(pq AS DOUBLE) / sum(pq) OVER () AS t_share FROM p)
      |SELECT source, src_tokens, share, t_share,
      |  t_share / share AS oversample
      |FROM t ORDER BY source""".stripMargin

  /** Deterministic train/val/test assignment — 90/5/5 by a salted
    * content-independent hash of the document id, so the split is (a)
    * stable across runs, engines, and cluster sizes, (b) independent of
    * any document feature a model could exploit, and (c) reproducible
    * from the id alone (any later pipeline stage can re-derive the
    * split without a join). Pure map-side column expression — the only
    * shuffle in the gate is its ORDER BY. */
  def splitAssign(spark: SparkSession, dir: String): DataFrame = {
    val h = Dedup.md5Hash60(
      concat(lit("split"), col("doc_id").cast("string"))) % 100
    load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        when(h < 90, lit("train")).when(h < 95, lit("val"))
          .otherwise(lit("test")).as("split"))
      .orderBy("doc_id")
  }

  private val splitAssignOracle: String =
    """WITH h AS (SELECT doc_id, lang,
      |  CAST('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 2, 15)
      |    AS BIGINT) % 100 AS h
      |  FROM documents)
      |SELECT doc_id, lang,
      |  CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM h ORDER BY doc_id""".stripMargin

  /** LEAKAGE-PROOF train/val/test split: the id-keyed [[splitAssign]]
    * puts two near-identical documents in different splits whenever
    * their ids hash apart — the exact contamination a held-out set must
    * exclude. This form keys the hash on the NEAR-DUP GROUP label
    * instead ([[Dedup.nearDupGroups]]: exact-dup collapse, then
    * MinHash-LSH edges between representatives, transitively closed),
    * so an entire duplicate cluster lands in ONE split atomically — no
    * document in test has a near-duplicate in train, structurally.
    *
    * The bucket hashes the group label (min doc_id of the component)
    * rather than any text feature, keeping property (b) of
    * [[splitAssign]]; stability under append holds while group
    * representatives are stable, which the incremental-dedup contract
    * ([[Dedup]] persisted indexes pin old reps) provides in production.
    *
    * 100 TB shape: the expensive part IS the dedup pass the pipeline
    * already runs (banded LSH, no all-pairs); the split itself adds one
    * broadcast-size join of (group label → bucket) logic evaluated
    * map-side per doc. 80/10/10 here so val/test get enough groups at
    * gate scale to exercise every branch. */
  def splitLeakproof(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val groups = Dedup.nearDupGroups(docs, "text", "doc_id",
      threshold = 0.2, maxIter = 20, portableEdges = true)
    val b = pmod(Dedup.md5Hash60(
      concat(lit("lsplit"), col("group_id").cast("string"))), lit(100L))
    docs.select(col("doc_id"), col("lang"))
      .join(groups, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("group_id"), b.as("bucket"),
        when(b < 80, lit("train")).when(b < 90, lit("val"))
          .otherwise(lit("test")).as("split"))
      .orderBy("doc_id")
  }

  private val splitLeakproofOracle: String =
    s"""WITH RECURSIVE
       |repmap AS MATERIALIZED (SELECT doc_id, lang,
       |    min(doc_id) OVER (PARTITION BY sha256(text)) AS rep
       |  FROM documents),
       |repdocs AS MATERIALIZED (SELECT d.doc_id, d.text FROM documents d
       |  JOIN repmap r ON d.doc_id = r.doc_id AND r.doc_id = r.rep),
       |${TextOps.minhashCtes("repdocs")},
       |edges AS MATERIALIZED (SELECT id_a AS id, id_b AS nbr FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT doc_id AS id, doc_id AS label FROM repdocs
       |  UNION
       |  SELECT e.id, r.label FROM edges e JOIN reach r ON r.id = e.nbr),
       |labels AS (SELECT id, min(label) AS group_id FROM reach GROUP BY id),
       |g AS (SELECT rm.doc_id, rm.lang, l.group_id
       |  FROM repmap rm JOIN labels l ON l.id = rm.rep),
       |b AS (SELECT doc_id, lang, group_id,
       |  CAST('0x' || substr(md5('lsplit' || CAST(group_id AS VARCHAR)),
       |    2, 15) AS BIGINT) % 100 AS bucket FROM g)
       |SELECT doc_id, lang, group_id, bucket,
       |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM b ORDER BY doc_id""".stripMargin

  /** Percentile-threshold quality gate: drop each language's bottom
    * quartile by token count — the FineWeb-style "cut below the p25 of
    * the quality signal per stratum" filter every curation run applies.
    *
    * The threshold is percentile_disc(0.25) computed EXPLICITLY (value
    * at rank ceil(0.25·n) of the per-language sort) so both engines
    * evaluate identical integer window arithmetic — no interpolated
    * quantile whose double rounding could diverge. Scale shape: the
    * per-language thresholds are a tiny frame (one row per language)
    * broadcast into a map-side filter over the corpus; the only corpus
    * shuffle is the per-language sort for ranks, which at 100 TB would
    * come from a sampled sketch instead — the filter side is unchanged. */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = HotKeyAdvisor.advise(load(spark, dir, "documents"),
        Seq("lang"), "CurateOps.qualityFilter", "qualityFilterRank")
      .select(col("doc_id"), col("lang"),
        graft.functions.Text.tokenCount(col("text")).cast("long").as("n"))
    val ranked = docs
      .withColumn("rn", row_number().over(
        // NULLS LAST explicitly: Spark defaults ascending NULLS FIRST,
        // DuckDB NULLS LAST — rank-sensitive oracles must pin it
        Window.partitionBy("lang")
          .orderBy(col("n").asc_nulls_last, col("doc_id"))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("lang")))
    val thresholds = ranked
      .filter(col("rn") === ceil(col("cnt") * 0.25))
      .select(col("lang"), col("n").as("thr"))
    docs.join(broadcast(thresholds), Seq("lang"))
      .filter(col("n") >= col("thr"))
      .groupBy("lang")
      .agg(min("thr").as("thr"), count(lit(1)).as("n_kept"),
        min("n").as("kept_min"), max("n").as("kept_max"))
      .orderBy("lang")
  }

  private val qualityFilterOracle: String =
    """WITH d AS (SELECT doc_id, lang,
      |    CAST(len(list_filter(regexp_split_to_array(text, ' +'),
      |      w -> w != '')) AS BIGINT) AS n
      |  FROM documents),
      |r AS (SELECT doc_id, lang, n,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY n NULLS LAST, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS cnt
      |  FROM d),
      |t AS (SELECT lang, n AS thr FROM r
      |  WHERE rn = CAST(ceil(cnt * 0.25) AS BIGINT))
      |SELECT d.lang, min(t.thr) AS thr, count(*) AS n_kept,
      |  min(d.n) AS kept_min, max(d.n) AS kept_max
      |FROM d JOIN t ON t.lang = d.lang
      |WHERE d.n >= t.thr
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  /** Skew-safe exact percentile gate: [[qualityFilter]]'s threshold pass
    * ranks every document of a language in ONE task (row_number over a
    * lang-partitioned window) — the same guaranteed-mega-lang shape the
    * round-17 wave-3 probe measures on [[packSequences]]. This form
    * computes the IDENTICAL percentile-25 threshold through the
    * value-group rank trick: ranks 1..cnt in (n ASC NULLS LAST, doc_id)
    * order assign the target rank ceil(cnt·0.25) a row whose `n` depends
    * only on the VALUE GROUP containing that rank (the doc_id tie-break
    * never changes `n`), so the threshold is the first distinct n whose
    * cumulative count reaches the target. The per-language window then
    * runs over distinct token COUNTS (bounded by max document length,
    * thousands), never corpus rows — a mega-language costs one groupBy
    * partial-aggregate, map-side. Filter side unchanged (broadcast
    * thresholds, one corpus scan). Bit-identical to [[qualityFilter]];
    * shares its differential oracle. */
  def qualityFilterRank(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        graft.functions.Text.tokenCount(col("text")).cast("long").as("n"))
    val byLang = Window.partitionBy("lang").orderBy(col("n").asc_nulls_last)
    val thresholds = docs
      .groupBy("lang", "n").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(
        byLang.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("target",
        ceil(sum("c").over(Window.partitionBy("lang")) * 0.25))
      // the value group CONTAINING the target rank: target ∈ (cum-c, cum]
      .filter(col("cum") >= col("target") &&
        col("cum") - col("c") < col("target"))
      .select(col("lang"), col("n").as("thr"))
    docs.join(broadcast(thresholds), Seq("lang"))
      .filter(col("n") >= col("thr"))
      .groupBy("lang")
      .agg(min("thr").as("thr"), count(lit(1)).as("n_kept"),
        min("n").as("kept_min"), max("n").as("kept_max"))
      .orderBy("lang")
  }

  /** Per-source frequency capping — the "domain rebalancing" step of
    * web-corpus curation (cap any one domain/source's share of the
    * corpus, cf. RefinedWeb / C4): keep at most 15 documents per source,
    * chosen by a deterministic content-independent hash priority so the
    * survivor set is stable across runs and engines.
    *
    * Scale shape: `row_number() <= k` over a source-partitioned window is
    * rewritten into this library's [[graft.plans.TopKPerGroup]] physical
    * operator, whose partial (pre-shuffle) instance drops all but k rows
    * per source BEFORE the exchange — each map task forwards at most k
    * rows per source it sees, so a skewed mega-domain costs k·mappers
    * rows in the exchange, not its full count. Pinned in PlanShapeSpec
    * ("source cap rank-limits before the shuffle"). At 100 TB this is
    * the difference between a bounded exchange and shuffling the whole
    * skewed domain. */
  def sourceCap(spark: SparkSession, dir: String): DataFrame = {
    val pri = Dedup.md5Hash60(concat(lit("cap"), col("doc_id").cast("string")))
    load(spark, dir, "documents")
      .withColumn("pri", pri)
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(col("pri"), col("doc_id"))))
      .filter(col("rk") <= 15)
      .select(col("doc_id"), col("source"), col("rk"))
      .orderBy("doc_id")
  }

  private val sourceCapOracle: String =
    """WITH p AS (SELECT doc_id, source,
      |  CAST('0x' || substr(md5('cap' || CAST(doc_id AS VARCHAR)), 2, 15)
      |    AS BIGINT) AS pri
      |  FROM documents),
      |r AS (SELECT doc_id, source,
      |  row_number() OVER (PARTITION BY source ORDER BY pri, doc_id) AS rk
      |  FROM p)
      |SELECT doc_id, source, rk FROM r WHERE rk <= 15
      |ORDER BY doc_id""".stripMargin

  /** Pairwise corpus-overlap matrix: for every pair of sources, the
    * exact Jaccard similarity of their distinct word-4-gram sets — the
    * cross-corpus leakage / near-duplicate-corpus report run before
    * mixing datasets into a training blend. Pairs with zero shared
    * shingles are omitted (inner join on the shingle hash).
    *
    * Hash-function independence: like [[decontaminate]], only COUNTS of
    * distinct shingles reach the output, so Spark's multi-arg xxhash64
    * and the oracle's plain-string shingles agree exactly unless a
    * 64-bit collision maps two distinct fixture shingles together
    * (~2^-64 per pair; independent hash functions on the two engines
    * make the differential strictly stronger).
    *
    * Scale shape: the corpus is scanned EXACTLY ONCE. One
    * distinct-aggregate shuffle keyed on (source, h), one groupBy-h
    * building the per-shingle source set (array bounded by the source
    * count, not the corpus), then every ordered pair src_a <= src_b from
    * that set is exploded and counted in a single aggregate: the
    * diagonal (a, a) IS the per-source distinct-shingle total and the
    * off-diagonal (a, b) IS the pairwise intersection. That collapses
    * the previous shape — a shingle self-join whose three consumers each
    * re-derived the corpus-wide shingle frame — into one pass, and the
    * sources²-sized pair-count table is consumed exactly ONCE: the
    * diagonal totals attach by two windows over it, NOT by a cached
    * self-join (a persisted gate frame is a plan-cache hit across bench
    * repeats and can never unpersist — do not re-add one here).
    * At 100 TB the exact path gives way to per-source MinHash sketches
    * (constant size per source, machinery in
    * [[graft.dedup.Dedup.portableMinhash]]) — the estimate replaces the
    * shingle aggregate, the report shape is identical. */
  def corpusOverlap(spark: SparkSession, dir: String): DataFrame = {
    val sh = load(spark, dir, "documents")
      .select(col("source"), Text.tokens(col("text")).as("w"))
      .select(col("source"),
        explode(Text.hashedShinglesFromTokens(col("w"), 4)).as("h"))
      .distinct()
    // Ordered pairs (incl. the diagonal) of sources sharing each shingle:
    // for srcs sorted, element i pairs with every element at index >= i.
    val pairCounts = sh.groupBy("h")
      .agg(sort_array(collect_set("source")).as("srcs"))
      .select(explode(expr(
        "flatten(transform(srcs, (x, i) -> " +
          "transform(slice(srcs, i + 1, size(srcs) - i), " +
          "y -> struct(x AS src_a, y AS src_b))))")).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("n"))
    // the diagonal (a, a) rows ARE the per-source totals; attach them to
    // the off-diagonal rows with two windows over the sources²-sized
    // frame, so pairCounts is consumed ONCE — no self-join, no persist
    // (a cached gate frame can never unpersist), no eager checkpoint
    // (measured 4x on the gate: the eager job re-ran per invocation)
    val diag = max(when(col("src_a") === col("src_b"), col("n")))
    pairCounts
      .withColumn("n_a", diag.over(Window.partitionBy("src_a")))
      .withColumn("n_b", diag.over(Window.partitionBy("src_b")))
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("n").as("n_inter"),
        // exact integer ppm — same terminating-decimal tie class as
        // q_window_ntile (sf0.1 sweep); shingle-set sizes can be smooth
        graft.functions.PortableMath.longDiv(
          col("n") * lit(1000000L),
          col("n_a") + col("n_b") - col("n")).as("jaccard_ppm"))
      .orderBy("src_a", "src_b")
  }

  private val corpusOverlapOracle: String =
    """WITH w AS (SELECT doc_id, source,
      |    list_filter(regexp_split_to_array(text, ' +'), x -> x != '') AS w
      |  FROM documents),
      |sh AS (SELECT DISTINCT source, unnest(CASE WHEN len(w) >= 4 THEN
      |    list_transform(generate_series(1, len(w) - 3),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
      |    ELSE [] END) AS s
      |  FROM w),
      |per AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
      |i AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT i.src_a, i.src_b, pa.n AS n_a, pb.n AS n_b, i.n_inter,
      |  (CAST(i.n_inter AS BIGINT) * 1000000)
      |    // CAST(pa.n + pb.n - i.n_inter AS BIGINT) AS jaccard_ppm
      |FROM i JOIN per pa ON pa.source = i.src_a
      |       JOIN per pb ON pb.source = i.src_b
      |ORDER BY i.src_a, i.src_b""".stripMargin

  /** The 100 TB form of [[corpusOverlap]]: per-source MinHash sketches
    * instead of the exact shingle self-join. Each source collapses to a
    * 32-component signature (min over the md5-60 shingle hashes under
    * the published [[Dedup.minhashPerms]] permutations); the pairwise
    * Jaccard ESTIMATE is the fraction of matching components. The
    * whole report derives from a sources×32-row frame — the corpus
    * contributes one map-side-combined min-aggregate scan and nothing
    * else, vs the exact path's shingle-hash self-join. Estimator std
    * err is sqrt(j(1-j)/32) ≈ 0.09 — the report ranks source pairs for
    * the [[corpusOverlap]] exact follow-up, it does not replace it at
    * gate scale.
    *
    * Differential: every stage is engine-portable (md5-60 hashes, the
    * literal permutation constants interpolated into the oracle SQL, the
    * same pattern as q_dedup_minhash_portable), so the DuckDB replay is
    * exact — n_match is integer equality of replayed mins, and
    * k/32 rounds identically. Sources whose documents are all shorter
    * than the shingle width have no signature and report 0 matches on
    * both engines (pair list comes from `documents`, not the sketch). */
  def corpusOverlapSketch(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val rows = docs
      .withColumn("w", Text.tokens(col("text")))
      .select(col("source"), explode(Text.shinglesFromTokens(col("w"), 4)).as("s"))
      .select(col("source"), Dedup.md5Hash60(col("s")).as("h"))
      .distinct()
    val mins = Dedup.minhashSignatures(rows.select(col("source").as("id"), col("h")), 32)
      .select(col("id").as("source"), posexplode(col("sig")))
      .select(col("source"), col("pos").as("perm"), col("col").as("mv"))
    val srcs = docs.select("source").distinct()
    val allPairs = srcs.select(col("source").as("src_a"))
      .crossJoin(srcs.select(col("source").as("src_b")))
      .filter(col("src_a") < col("src_b"))
    val matches = mins.select(col("source").as("src_a"), col("perm"), col("mv"))
      .join(mins.select(col("source").as("src_b"), col("perm"), col("mv")),
        Seq("perm", "mv"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_match"))
    allPairs.join(matches, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("n_match"), lit(0L)).as("n_match"),
        round(coalesce(col("n_match"), lit(0L)) / lit(32.0), 6).as("est_jaccard"))
      .orderBy("src_a", "src_b")
  }

  private val corpusOverlapSketchOracle: String = {
    val p = Dedup.minhashPrime
    val perms = Dedup.minhashPerms(32)
    val minCols = perms.zipWithIndex.map { case ((a, b), i) =>
      s"min(((h % $p) * $a + $b) % $p) AS m$i" }.mkString(",\n  ")
    val minArms = (0 until 32).map(i =>
      s"SELECT source, $i AS perm, m$i AS mv FROM sig").mkString("\n  UNION ALL ")
    s"""WITH w AS (SELECT source,
       |    list_filter(regexp_split_to_array(text, ' +'), x -> x != '') AS w
       |  FROM documents),
       |sh AS (SELECT DISTINCT source, unnest(CASE WHEN len(w) >= 4 THEN
       |    list_transform(generate_series(1, len(w) - 3),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
       |    ELSE [] END) AS s
       |  FROM w),
       |hd AS (SELECT DISTINCT source,
       |    CAST('0x' || substr(md5(s), 2, 15) AS BIGINT) AS h
       |  FROM sh),
       |sig AS MATERIALIZED (SELECT source,
       |  $minCols
       |  FROM hd GROUP BY source),
       |mins AS MATERIALIZED (
       |  $minArms),
       |pall AS (SELECT a.source AS src_a, b.source AS src_b
       |  FROM (SELECT DISTINCT source FROM documents) a,
       |       (SELECT DISTINCT source FROM documents) b
       |  WHERE a.source < b.source),
       |mm AS (SELECT x.source AS src_a, y.source AS src_b,
       |    count(*) AS n_match
       |  FROM mins x JOIN mins y
       |    ON y.perm = x.perm AND y.mv = x.mv AND x.source < y.source
       |  GROUP BY 1, 2)
       |SELECT p.src_a, p.src_b,
       |  CAST(coalesce(mm.n_match, 0) AS BIGINT) AS n_match,
       |  round(CAST(coalesce(mm.n_match, 0) AS DOUBLE) / 32.0, 6)
       |    AS est_jaccard
       |FROM pall p LEFT JOIN mm
       |  ON mm.src_a = p.src_a AND mm.src_b = p.src_b
       |ORDER BY p.src_a, p.src_b""".stripMargin
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every corpus
    * document by how much more likely its hashed n-gram bag is under a
    * TARGET distribution (here the `source = 'src0'` subset, the same
    * held-out convention [[decontaminate]] uses) than under the RAW
    * corpus distribution. High scores mark documents that "look like"
    * the target domain — the selection signal for domain-matched
    * pretraining mixes.
    *
    * Model: unigram + bigram features WITH multiplicity, hashed into
    * [[DsirBuckets]] buckets by the engine-portable [[Dedup.md5Hash60]];
    * bucket probabilities use add-one smoothing. The per-feature
    * log-ratio ln(p_target(b)/p_raw(b)) is quantized to micro-nats
    * (BIGINT) before the per-document sum, so document scores are exact
    * integer arithmetic in any partition order (the [[LmOps]] contract);
    * the ratio itself is formed as one integer-product division so both
    * engines round the same double.
    *
    * 100 TB shape: both distribution frames are bounded by the bucket
    * count (≤B rows however large the corpus) and broadcast; the corpus
    * makes two scans (one to count, one to score) with map-side-combined
    * aggregation — the only unbounded shuffle is the final per-document
    * rollup. Counts enter the log as integer products; beyond ~2^53
    * total features per side, switch the ratio to log-subtraction form
    * (loses bit-exactness, not correctness). */
  private val DsirBuckets = 256

  /** Hashed feature stream over any frame with `textCol`: unigrams +
    * bigrams WITH multiplicity, md5-60-bucketed; `keep` columns ride
    * along (id/lang for scoring, the target flag for counting). */
  private def dsirFeatureStream(docs: DataFrame, textCol: String,
      keep: Seq[String]): DataFrame = {
    val bigrams = when(size(col("w")) >= 2,
      transform(sequence(lit(1), size(col("w")) - 1), i =>
        concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1))))
      .otherwise(array().cast("array<string>"))
    docs
      .withColumn("w", Text.tokens(col(textCol)))
      .select(keep.map(col) :+ explode(concat(col("w"), bigrams)).as("f"): _*)
      .select(keep.map(col) :+
        (Dedup.md5Hash60(col("f")) % DsirBuckets).as("b"): _*)
  }

  /** Per-doc bucket histogram: the feature stream collapsed to one row
    * per (keep…, bucket) with its multiplicity `c`. Every downstream
    * DSIR quantity is a linear functional of this frame (bucket counts
    * = Σc per bucket, doc score = Σc·w per doc), so the refit gate
    * tokenizes + hashes the corpus ONCE and reuses the histogram for
    * both the counting and the scoring pass. */
  private def dsirDocBuckets(docs: DataFrame, textCol: String,
      keep: Seq[String]): DataFrame =
    dsirFeatureStream(docs, textCol, keep)
      .groupBy((keep :+ "b").map(col): _*)
      .agg(count(lit(1)).as("c"))

  /** The exactly-B-row per-bucket micro-nat weight frame from observed
    * per-bucket counts `(b, cr, ct)`, joined onto the FULL bucket spine
    * 0..B-1. The spine matters for SERVING: a batch feature can hash to
    * a bucket the training corpus never produced, and the add-one
    * smoothing defines its weight (ln((nr+B)/(nt+B)) at cr = ct = 0) —
    * dropping such features would silently bias served scores low
    * relative to a refit. */
  private def dsirWeightFrame(counts: DataFrame): DataFrame = {
    val whole = Window.partitionBy(lit(1))
    val spine = counts.sparkSession.range(DsirBuckets).toDF("b")
    spine.join(counts, Seq("b"), "left")
      .select(col("b"), coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
      .withColumn("nr", sum("cr").over(whole))
      .withColumn("nt", sum("ct").over(whole))
      .select(col("b"), {
        // portable micro-nat log-ratio weight, sign split on the exact
        // integer comparison — no libm (the sf0.1-sweep contract)
        import graft.functions.PortableMath.{log2Micro, longDiv}
        def lnMicro(x: org.apache.spark.sql.Column,
            y: org.apache.spark.sql.Column) =
          longDiv(log2Micro(x, y) * lit(693147181L), lit(1048576000L))
        val a = (col("ct") + 1) * (col("nr") + DsirBuckets)
        val bb = (col("cr") + 1) * (col("nt") + DsirBuckets)
        when(a >= bb, lnMicro(a, bb)).otherwise(-lnMicro(bb, a)).as("wmi")
      })
  }

  /** Doc scores from the bucket histogram: Σc and Σc·w per doc — exact
    * integers, identical to summing the raw feature stream. */
  private def dsirScore(docBuckets: DataFrame,
      weights: DataFrame): DataFrame =
    docBuckets.join(broadcast(weights), Seq("b"))
      .groupBy("doc_id", "lang")
      .agg(sum("c").as("n_feat"),
        sum(col("c") * col("wmi")).as("dsir_micro"))
      .orderBy("doc_id")

  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
      .withColumn("is_t", col("source") === "src0")
    // one tokenize+hash pass; the histogram (≤B rows per doc) feeds the
    // fit AND the score — eager checkpoint, not persist (cache-hit on
    // repeat invocations would be a bench cheat)
    val db = dsirDocBuckets(docs, "text", Seq("doc_id", "lang", "is_t"))
      .localCheckpoint()
    val counts = db.groupBy("b")
      .agg(sum("c").as("cr"),
        sum(when(col("is_t"), col("c")).otherwise(0L)).as("ct"))
    dsirScore(db, dsirWeightFrame(counts))
  }

  // ---- persisted DSIR model: train once, score any batch -------------

  private val dsirWeightSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("b",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("wmi",
      org.apache.spark.sql.types.LongType)))
  private val dsirMetaSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("buckets",
      org.apache.spark.sql.types.LongType)))

  /** Fit the bucket log-ratio weights once and persist them:
    * `<prefix>_weights` (≤B rows) + `<prefix>_meta` (bucket count,
    * validated at serve time). Same rebuild atomicity as
    * [[LmOps.buildModel]]: `_meta` deleted first, written last, so a
    * rebuild that dies mid-replace fails loudly on the next score. At
    * 100 TB this is the point of the lifecycle — the two corpus scans
    * (count + any later scoring) never rerun the counting side per
    * batch; a weight table is a few KB however large the corpus. */
  def buildDsirModel(store: graft.pipeline.Store, prefix: String,
      corpus: DataFrame, isTarget: Column,
      textCol: String = "text"): Unit = {
    graft.pipeline.FsUtils.deleteRecursively(
      new java.io.File(store.path(s"${prefix}_meta")))
    val feats = dsirFeatureStream(corpus.withColumn("is_t", isTarget),
      textCol, Seq("is_t"))
    val counts = feats.groupBy("b")
      .agg(count(lit(1)).as("cr"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
    store.write(s"${prefix}_weights", dsirWeightFrame(counts))
    store.write(s"${prefix}_meta",
      corpus.sparkSession.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row(DsirBuckets.toLong)),
        dsirMetaSchema))
  }

  /** Score a batch (needs `idCol`/`lang`/`textCol`) against a persisted
    * DSIR model — no counting pass, one broadcast join + per-doc rollup. */
  def scoreDsirModel(store: graft.pipeline.Store, prefix: String,
      batch: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(store.exists(s"${prefix}_meta"),
      s"no persisted DSIR model under prefix '$prefix' — run " +
        "buildDsirModel (or a rebuild died mid-replace; rebuild it)")
    val buckets = store.read(s"${prefix}_meta", dsirMetaSchema)
      .collect()(0).getLong(0)
    require(buckets == DsirBuckets.toLong,
      s"persisted DSIR model has $buckets buckets, this build expects " +
        s"$DsirBuckets — rebuild the model")
    // single pass — join the token stream straight onto the broadcast
    // weights and rollup per doc (map-side partial agg keeps the shuffle
    // at doc granularity; the histogram detour only pays off when TWO
    // consumers share it, i.e. the in-gate refit)
    val feats = dsirFeatureStream(
      batch.select(col(idCol).as("doc_id"), col("lang"), col(textCol)),
      textCol, Seq("doc_id", "lang"))
    feats.join(broadcast(store.read(s"${prefix}_weights", dsirWeightSchema)),
        Seq("b"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_feat"), sum("wmi").as("dsir_micro"))
      .orderBy("doc_id")
  }

  /** The persisted-serving twin of [[dsirWeights]] (the
    * q_lm_perplexity_indexed pattern): weights fitted once into a
    * memoized Store, every run scores by READING them — must hash-match
    * the refit path's oracle exactly. */
  private val dsirStoreCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.pipeline.Store]

  def dsirWeightsIndexed(spark: SparkSession, dir: String): DataFrame = {
    val store = dsirStoreCache.synchronized {
      dsirStoreCache.getOrElseUpdate((spark, dir), {
        val base = SourceSinkOps.tmp("dsiridx", dir)
        graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
        val st = new graft.pipeline.Store(spark, base)
        buildDsirModel(st, "dsir", load(spark, dir, "documents"),
          col("source") === "src0")
        st
      })
    }
    scoreDsirModel(store, "dsir", load(spark, dir, "documents"))
  }

  private val dsirWeightsOracle: String =
    """WITH RECURSIVE d AS (SELECT doc_id, lang, source,
      |    list_filter(regexp_split_to_array(text, ' +'), w -> w != '') AS toks
      |  FROM documents),
      |f AS (SELECT doc_id, lang, source, unnest(toks) AS f FROM d
      |  UNION ALL
      |  SELECT doc_id, lang, source, toks[i] || ' ' || toks[i + 1] AS f
      |  FROM d, unnest(range(1, len(toks))) AS u(i)),
      |fb AS (SELECT doc_id, lang, source,
      |    CAST('0x' || substr(md5(f), 2, 15) AS BIGINT) % 256 AS b FROM f),
      |raw AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM fb GROUP BY b),
      |tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM fb
      |  WHERE source = 'src0' GROUP BY b),
      |tot AS (SELECT
      |    (SELECT CAST(sum(cr) AS BIGINT) FROM raw) AS nr,
      |    (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) FROM tgt) AS nt),
      |wp AS (SELECT raw.b,
      |    (coalesce(tgt.ct, 0) + 1) * (tot.nr + 256) AS wa,
      |    (raw.cr + 1) * (tot.nt + 256) AS wb
      |  FROM raw LEFT JOIN tgt ON tgt.b = raw.b, tot),
      |wpr AS (SELECT DISTINCT greatest(wa, wb) AS rn,
      |    least(wa, wb) AS rd FROM wp),
      |""".stripMargin +
    graft.functions.PortableMath.sqlLog2MicroCtes("wpr", "rn", "rd", "wlg") +
    """,
      |w AS (SELECT wp.b,
      |    CASE WHEN wa >= wb
      |      THEN (l.lmicro * 693147181) // 1048576000
      |      ELSE -((l.lmicro * 693147181) // 1048576000) END AS wmi
      |  FROM wp JOIN wlg l ON l.pm_num = greatest(wa, wb)
      |    AND l.pm_den = least(wa, wb))
      |SELECT fb.doc_id, fb.lang, CAST(count(*) AS BIGINT) AS n_feat,
      |  CAST(sum(w.wmi) AS BIGINT) AS dsir_micro
      |FROM fb JOIN w ON w.b = fb.b
      |GROUP BY 1, 2 ORDER BY fb.doc_id""".stripMargin

  /** Per-source corpus statistics — the "data card" report published
    * with a training mix (docs, token volume, vocabulary size, length
    * distribution). Exact lower-median via the rank trick (the
    * [[qualityFilter]] percentile pattern: row_number = ceil(cnt/2) on
    * the (n, doc_id) total order) instead of a percentile interpolation
    * two engines would round differently.
    *
    * Scale shape: one explode pass feeds a (source, token)-keyed
    * distinct aggregate (map-side combined; the distinct-token frame is
    * vocabulary-bounded per source, not corpus-bounded); the length
    * stats are a per-source aggregate plus one rank window whose
    * partitions are sources. Everything joins back on the tiny source
    * key set. avg is formed as exact-integer sum ÷ count, one double
    * division + round, same on both engines. */
  def corpusStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("text"))
      .withColumn("n", Text.tokenCount(col("text")).cast("long"))
    val tokStats = docs
      .select(col("source"), explode(Text.tokens(col("text"))).as("tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct("tok").as("n_distinct_tokens"))
    val lenStats = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        // exact integer milli-tokens: sum/count is the terminating-
        // decimal tie class (q_window_ntile, sf0.1 sweep)
        graft.functions.PortableMath.longDiv(
          sum("n") * lit(1000L), count(lit(1))).as("avg_tokens_milli"),
        max("n").as("max_tokens"))
    val median = docs
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("n"), col("doc_id"))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("source")))
      .filter(col("rn") === ceil(col("cnt") / 2).cast("long"))
      .select(col("source"), col("n").as("p50_tokens"))
    lenStats.join(tokStats, Seq("source")).join(median, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_distinct_tokens"), col("avg_tokens_milli"), col("p50_tokens"),
        col("max_tokens"))
      .orderBy("source")
  }

  private val corpusStatsOracle: String =
    """WITH d AS (SELECT source, doc_id,
      |    CAST(len(list_filter(regexp_split_to_array(text, ' +'),
      |      w -> w != '')) AS BIGINT) AS n,
      |    list_filter(regexp_split_to_array(text, ' +'), w -> w != '') AS toks
      |  FROM documents),
      |t AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct_tokens
      |  FROM (SELECT source, unnest(toks) AS tok FROM d) u GROUP BY source),
      |l AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    (CAST(sum(n) AS BIGINT) * 1000) // count(*) AS avg_tokens_milli,
      |    max(n) AS max_tokens
      |  FROM d GROUP BY source),
      |r AS (SELECT source, n,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY source) AS cnt
      |  FROM d),
      |m AS (SELECT source, n AS p50_tokens FROM r
      |  WHERE rn = CAST(ceil(cnt / 2.0) AS BIGINT))
      |SELECT l.source, l.n_docs, t.n_tokens, t.n_distinct_tokens,
      |  l.avg_tokens_milli, m.p50_tokens, l.max_tokens
      |FROM l JOIN t ON t.source = l.source
      |       JOIN m ON m.source = l.source
      |ORDER BY l.source""".stripMargin

  /** Streaming curation over the persisted models
    * ([[graft.streaming.StreamingCurate.scoreIngest]]): the LM and DSIR
    * models are trained once into a Store (LM on the %10<8 split, DSIR
    * vs the src0 target — the same models the batch gates fit), then TWO
    * micro-batches of documents (doc_id %10 = 0, then %10 = 5) stream
    * through and are scored + threshold-gated (ppl ≤ 12, dsir ≥ −5e6 —
    * both cut the sf0.01 fixture non-trivially). The oracle replays both
    * models and the gate rule over the union of the two batch doc sets —
    * scoring is stateless per batch, so no sequential replay is needed
    * (that contract belongs to the dedup-ingest gates); what this gate
    * pins is that the streaming plumbing (file batching, replay-safe
    * publication, model serving inside foreachBatch) is invisible in the
    * decisions. */
  private val scurCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.pipeline.Store]

  def streamCurate(spark: SparkSession, dir: String): DataFrame = {
    val store = scurCache.synchronized {
      scurCache.getOrElseUpdate((spark, dir), {
        val base = SourceSinkOps.tmp("scur", dir)
        graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
        val docs = load(spark, dir, "documents")
        val st = new graft.pipeline.Store(spark, s"$base/store")
        LmOps.buildModel(st, "lm", docs.filter(col("doc_id") % 10 < 8))
        buildDsirModel(st, "dsir", docs, col("source") === "src0")
        val landing = s"$base/landing"
        new java.io.File(landing).mkdirs()
        def writeBatchFile(df: DataFrame, name: String, mtime: Long): Unit = {
          val tmpd = s"$base/tmp_$name"
          df.coalesce(1).write.mode("overwrite").parquet(tmpd)
          val part = new java.io.File(tmpd).listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          val dst = new java.io.File(s"$landing/$name")
          java.nio.file.Files.move(part.toPath, dst.toPath)
          require(dst.setLastModified(mtime),
            s"could not pin mtime on $dst — batch order would be undefined")
        }
        val cols = docs.select(col("doc_id"), col("lang"), col("text"))
        val t0 = 1700000000000L
        writeBatchFile(cols.filter(col("doc_id") % 10 === 0), "b0.parquet", t0)
        writeBatchFile(cols.filter(col("doc_id") % 10 === 5), "b1.parquet",
          t0 + 3600000L)
        graft.streaming.StreamingCurate.scoreIngest(spark, landing,
          cols.schema, st, "lm", "dsir", s"$base/ck",
          pplCap = 12.0, dsirFloor = -5000000L,
          compactEvery = Some(1)).awaitTermination()
        // compaction ran and bounded the drops: batch 0's file folded
        // into a compacted generation; only the (excluded, replayable)
        // final batch remains as a batch drop. The oracle then proves
        // compaction is invisible in the decisions themselves.
        val names = Option(new java.io.File(st.path("decisions")).listFiles())
          .getOrElse(Array.empty).map(_.getName).filter(_.endsWith(".parquet"))
        require(names.exists(_.startsWith("compacted_"))
            && !names.exists(_.startsWith("batch_0_")),
          s"decision compaction did not run as configured: ${names.toSeq}")
        st
      })
    }
    spark.read.parquet(store.path("decisions")).orderBy("doc_id")
  }

  private val streamCurateOracle: String =
    """WITH RECURSIVE d AS (SELECT doc_id, lang, source,
      |    list_filter(regexp_split_to_array(text, ' +'), w -> w != '') AS toks
      |  FROM documents),
      |p AS (SELECT doc_id, lang, toks[i] AS w1, toks[i + 1] AS w2
      |  FROM d, unnest(range(1, len(toks))) AS u(i)),
      |voc AS (SELECT tok FROM (
      |    SELECT unnest(toks) AS tok FROM d WHERE doc_id % 10 < 8) u
      |  GROUP BY tok ORDER BY count(*) DESC, tok LIMIT 16),
      |vs AS (SELECT CAST(count(*) + 1 AS BIGINT) AS v FROM voc),
      |m AS (SELECT p.doc_id, p.lang,
      |    coalesce(v1.tok, '<unk>') AS w1m, coalesce(v2.tok, '<unk>') AS w2m
      |  FROM p LEFT JOIN voc v1 ON v1.tok = p.w1
      |         LEFT JOIN voc v2 ON v2.tok = p.w2),
      |big AS (SELECT w1m, w2m, count(*) AS c12 FROM m
      |  WHERE doc_id % 10 < 8 GROUP BY 1, 2),
      |ctx AS (SELECT w1m, CAST(sum(c12) AS BIGINT) AS c1 FROM big GROUP BY 1),
      |scp AS (SELECT m.doc_id, m.lang,
      |    CAST(coalesce(c.c1, 0) + (SELECT v FROM vs) AS BIGINT) AS pn,
      |    CAST(coalesce(b.c12, 0) + 1 AS BIGINT) AS pd
      |  FROM m LEFT JOIN big b ON b.w1m = m.w1m AND b.w2m = m.w2m
      |         LEFT JOIN ctx c ON c.w1m = m.w1m),
      |lpr AS (SELECT DISTINCT pn, pd FROM scp),
      |""".stripMargin +
    graft.functions.PortableMath.sqlLog2MicroCtes("lpr", "pn", "pd", "slg") +
    s""",
      |sc AS (SELECT s.doc_id, s.lang,
      |    (l.lmicro * 693147181) // 1048576000 AS nlp
      |  FROM scp s JOIN slg l ON l.pm_num = s.pn AND l.pm_den = s.pd),
      |hh AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(nlp) AS BIGINT) AS h FROM sc GROUP BY doc_id, lang),
      |py AS (SELECT doc_id, lang, n_pairs,
      |    (h * 1048576) // (n_pairs * 693147) AS y FROM hh),
      |ppl AS (SELECT doc_id, lang,
      |    CAST(CAST(1 AS BIGINT) << (y // 1048576) AS DOUBLE) *
      |      ${graft.functions.PortableMath
        .sqlExp2MicroFrac("y - (y // 1048576) * 1048576")} AS ppl
      |  FROM py),
      |f AS (SELECT doc_id, lang, source, unnest(toks) AS f FROM d
      |  UNION ALL
      |  SELECT doc_id, lang, source, toks[i] || ' ' || toks[i + 1] AS f
      |  FROM d, unnest(range(1, len(toks))) AS u(i)),
      |fb AS (SELECT doc_id, lang, source,
      |    CAST('0x' || substr(md5(f), 2, 15) AS BIGINT) % 256 AS b FROM f),
      |raw AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM fb GROUP BY b),
      |tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM fb
      |  WHERE source = 'src0' GROUP BY b),
      |tot AS (SELECT
      |    (SELECT CAST(sum(cr) AS BIGINT) FROM raw) AS nr,
      |    (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) FROM tgt) AS nt),
      |wp AS (SELECT raw.b,
      |    (coalesce(tgt.ct, 0) + 1) * (tot.nr + 256) AS wa,
      |    (raw.cr + 1) * (tot.nt + 256) AS wb
      |  FROM raw LEFT JOIN tgt ON tgt.b = raw.b, tot),
      |wpr AS (SELECT DISTINCT greatest(wa, wb) AS rn,
      |    least(wa, wb) AS rd FROM wp),
      |""".stripMargin +
    graft.functions.PortableMath.sqlLog2MicroCtes("wpr", "rn", "rd", "wlg") +
    """,
      |w AS (SELECT wp.b,
      |    CASE WHEN wa >= wb
      |      THEN (l.lmicro * 693147181) // 1048576000
      |      ELSE -((l.lmicro * 693147181) // 1048576000) END AS wmi
      |  FROM wp JOIN wlg l ON l.pm_num = greatest(wa, wb)
      |    AND l.pm_den = least(wa, wb)),
      |ds AS (SELECT fb.doc_id, fb.lang,
      |    CAST(sum(w.wmi) AS BIGINT) AS dsir_micro
      |  FROM fb JOIN w ON w.b = fb.b GROUP BY 1, 2),
      |batch AS (SELECT doc_id, lang FROM documents
      |  WHERE doc_id % 10 IN (0, 5))
      |SELECT b.doc_id, b.lang, p.ppl, ds.dsir_micro,
      |  coalesce(p.ppl <= 12.0 AND ds.dsir_micro >= -5000000, false) AS keep
      |FROM batch b
      |LEFT JOIN ppl p ON p.doc_id = b.doc_id AND p.lang = b.lang
      |LEFT JOIN ds ON ds.doc_id = b.doc_id AND ds.lang = b.lang
      |ORDER BY b.doc_id""".stripMargin

  /** Robust outlier detection per language group: median / MAD over doc
    * length, flagging docs with |x - med| > 3·MAD — the length-outlier
    * screen (truncated scrapes, concatenation blobs) a quality pipeline
    * runs before training. Median and MAD are exact LOWER medians via
    * the established rank trick (row_number = ceil(cnt/2) on a total
    * order ending in doc_id), so every quantity here is INTEGER
    * arithmetic — no percentile interpolation for engines to round
    * differently.
    *
    * Scale note: exact per-group medians cost one sort-window per pass
    * (two passes here). At 100 TB the same operator runs on the
    * bounded-error quantile sketch (q_sketch_quantiles machinery) with
    * identical downstream flagging; this gate is the exact harness. */
  def outlierMad(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
      .select(col("lang"), col("doc_id"), col("n_chars"))
    def lowerMedian(df: DataFrame, valueCol: String, out: String): DataFrame =
      df.withColumn("rn", row_number().over(Window.partitionBy("lang")
          .orderBy(col(valueCol), col("doc_id"))))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("lang")))
        .filter(col("rn") === ceil(col("cnt") / 2).cast("long"))
        .select(col("lang"), col(valueCol).as(out))
    val med = lowerMedian(docs, "n_chars", "med_chars")
    val dev = docs.join(med, "lang")
      .withColumn("dev", abs(col("n_chars") - col("med_chars")))
    val mad = lowerMedian(dev.select(col("lang"), col("doc_id"),
      col("dev")), "dev", "mad_chars")
    dev.join(mad, "lang")
      .withColumn("is_outlier", col("dev") > lit(3) * col("mad_chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        max("med_chars").as("med_chars"), max("mad_chars").as("mad_chars"),
        sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
        min(when(col("is_outlier"), col("doc_id"))).as("first_outlier"),
        max("dev").as("max_dev"))
      .orderBy("lang")
  }

  private val outlierMadOracle: String =
    """WITH d AS (SELECT lang, doc_id, n_chars FROM documents),
      |m AS (SELECT lang, n_chars AS med_chars FROM (
      |    SELECT lang, doc_id, n_chars,
      |      row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
      |        AS rn,
      |      count(*) OVER (PARTITION BY lang) AS cnt
      |    FROM d) WHERE rn = CAST(ceil(cnt / 2.0) AS BIGINT)),
      |dev AS (SELECT d.lang, d.doc_id, d.n_chars, m.med_chars,
      |    abs(d.n_chars - m.med_chars) AS dev
      |  FROM d JOIN m USING (lang)),
      |md AS (SELECT lang, dev AS mad_chars FROM (
      |    SELECT lang, doc_id, dev,
      |      row_number() OVER (PARTITION BY lang ORDER BY dev, doc_id)
      |        AS rn,
      |      count(*) OVER (PARTITION BY lang) AS cnt
      |    FROM dev) WHERE rn = CAST(ceil(cnt / 2.0) AS BIGINT))
      |SELECT dev.lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  max(dev.med_chars) AS med_chars, max(md.mad_chars) AS mad_chars,
      |  CAST(sum(CASE WHEN dev.dev > 3 * md.mad_chars THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers,
      |  min(CASE WHEN dev.dev > 3 * md.mad_chars THEN dev.doc_id END)
      |    AS first_outlier,
      |  max(dev.dev) AS max_dev
      |FROM dev JOIN md USING (lang)
      |GROUP BY dev.lang ORDER BY dev.lang""".stripMargin

  /** Per-source distribution drift: Jensen-Shannon divergence between
    * each source's token distribution and the whole-corpus distribution
    * — the mixture-monitoring signal that catches a source going off
    * -distribution (scrape rot, pipeline bugs, domain shift) before it
    * trains. JS (not KL) because it is finite when a source misses
    * vocabulary, symmetric, and bounded by ln 2.
    *
    * Determinism: all probabilities are ratios of exact integer counts,
    * and every contribution is now ALL-INTEGER — the portable log2
    * digit extraction × the fixed integer ln 2
    * (graft.functions.PortableMath), sign split on an exact integer
    * comparison — so per-source sums are exact in any order AND on any
    * IEEE engine. (The previous nano-nat quantization of a libm ln had
    * a documented .5-boundary fragility across libms; round 13 removed
    * the class.)
    *
    * 100 TB shape: one corpus explode partial-aggregates to the
    * (source, token) frame; everything after lives on vocabulary-bounded
    * relations (|V| and |sources|×|V| rows), with the per-source and
    * per-token totals broadcast back. The corpus is scanned once. */
  def sourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    val st = load(spark, dir, "documents")
      .select(col("source"), explode(Text.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("n_st"))
    val perSource = st.groupBy("source").agg(sum("n_st").as("n_s"))
    val perTok = st.groupBy("tok").agg(sum("n_st").as("n_t"))
    val total = perTok.agg(sum("n_t").as("n")).select(col("n"))
    val grid = perSource.crossJoin(broadcast(perTok))
      .join(st, Seq("source", "tok"), "left")
      .na.fill(0L, Seq("n_st"))
      .crossJoin(broadcast(total))
    // all-integer JS terms via the portable log2 — the libm-ln
    // nano-quantization this op shipped with was the documented
    // .5-boundary fragility; now every contribution is exact integer
    // arithmetic. With pa = n_st·n and qa = n_t·n_s (cross products —
    // BIGINT-safe to ~3M tokens per source; reduce the fractions first
    // beyond that), p/m = 2·pa/(pa+qa) and q/m = 2·qa/(pa+qa), both in
    // (0, 2), and 0.5·(a/b)·ln(r)·1e9 becomes sign·(a·lnNanoAbs) DIV 2b.
    import graft.functions.PortableMath.{log2Micro, longDiv}
    def lnNanoAbs(a: Column, b: Column): Column =
      longDiv(log2Micro(a, b) * lit(693147181L), lit(1048576L))
    def halfTerm(coefNum: Column, coefDen: Column,
        rnum: Column, rden: Column): Column =
      when(rnum >= rden,
        longDiv(coefNum * lnNanoAbs(rnum, rden), coefDen * lit(2L)))
        .otherwise(-longDiv(coefNum * lnNanoAbs(rden, rnum),
          coefDen * lit(2L)))
    val pa = col("n_st") * col("n")
    val qa = col("n_t") * col("n_s")
    val c =
      when(col("n_st") > 0,
        halfTerm(col("n_st"), col("n_s"), pa * 2L, pa + qa))
        .otherwise(lit(0L)) +
        halfTerm(col("n_t"), col("n"), qa * 2L, pa + qa)
    grid.select(col("source"), col("n_s"), c.as("c"))
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"), sum("c").as("js_nano"))
      .orderBy("source")
  }

  private val sourceDivergenceOracle: String =
    """WITH RECURSIVE st AS (SELECT source, tok,
      |    CAST(count(*) AS BIGINT) AS n_st
      |  FROM (SELECT source,
      |      unnest(list_filter(regexp_split_to_array(text, ' +'),
      |        w -> w != '')) AS tok
      |    FROM documents) u GROUP BY source, tok),
      |s AS (SELECT source, CAST(sum(n_st) AS BIGINT) AS n_s
      |  FROM st GROUP BY source),
      |t AS (SELECT tok, CAST(sum(n_st) AS BIGINT) AS n_t FROM st GROUP BY tok),
      |n AS (SELECT CAST(sum(n_t) AS BIGINT) AS n FROM t),
      |grid AS (SELECT s.source, s.n_s, t.tok, t.n_t,
      |    coalesce(st.n_st, 0) AS n_st, n.n,
      |    coalesce(st.n_st, 0) * n.n AS pa, t.n_t * s.n_s AS qa
      |  FROM s CROSS JOIN t CROSS JOIN n
      |    LEFT JOIN st ON st.source = s.source AND st.tok = t.tok),
      |pr AS (SELECT DISTINCT greatest(2 * pa, pa + qa) AS rn,
      |    least(2 * pa, pa + qa) AS rd FROM grid WHERE n_st > 0
      |  UNION SELECT DISTINCT greatest(2 * qa, pa + qa),
      |    least(2 * qa, pa + qa) FROM grid),
      |""".stripMargin +
    graft.functions.PortableMath.sqlLog2MicroCtes("pr", "rn", "rd", "lgd") +
    """,
      |lnt AS (SELECT pm_num, pm_den,
      |    (lmicro * 693147181) // 1048576 AS lnabs FROM lgd),
      |c AS (SELECT g.source, g.n_s,
      |    (CASE WHEN g.n_st > 0 THEN
      |       CASE WHEN 2 * g.pa >= g.pa + g.qa
      |         THEN (g.n_st * lp.lnabs) // (g.n_s * 2)
      |         ELSE -((g.n_st * lp.lnabs) // (g.n_s * 2)) END
      |     ELSE 0 END)
      |    + CASE WHEN 2 * g.qa >= g.pa + g.qa
      |        THEN (g.n_t * lq.lnabs) // (g.n * 2)
      |        ELSE -((g.n_t * lq.lnabs) // (g.n * 2)) END AS c
      |  FROM grid g
      |  LEFT JOIN lnt lp ON lp.pm_num = greatest(2 * g.pa, g.pa + g.qa)
      |    AND lp.pm_den = least(2 * g.pa, g.pa + g.qa)
      |  LEFT JOIN lnt lq ON lq.pm_num = greatest(2 * g.qa, g.pa + g.qa)
      |    AND lq.pm_den = least(2 * g.qa, g.pa + g.qa))
      |SELECT source, max(n_s) AS n_tokens, CAST(sum(c) AS BIGINT) AS js_nano
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  /** Winsorization — clip doc-length features at exact per-language
    * p05/p95 before they feed loss weighting / packing heuristics (the
    * outlier-robust companion to [[outlierMad]]'s detection: MAD flags,
    * winsorize repairs). Cut points are exact order statistics via the
    * rank trick (rank = ceil(q·n) on the (value, doc_id) total order) —
    * integer arithmetic end to end, no interpolation for engines to
    * round differently. One sort window per language partition; the
    * sketch-quantile machinery is the documented 100 TB form. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
      .select(col("lang"), col("doc_id"), col("n_chars"))
    def cut(qNum: Int, qDen: Int, out: String): DataFrame =
      docs.withColumn("rn", row_number().over(Window.partitionBy("lang")
          .orderBy(col("n_chars"), col("doc_id"))))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("lang")))
        .filter(col("rn") ===
          ceil(col("cnt") * qNum / qDen).cast("long"))
        .select(col("lang"), col("n_chars").as(out))
    val lo = cut(1, 20, "p05")
    val hi = cut(19, 20, "p95")
    docs.join(lo, "lang").join(hi, "lang")
      .withColumn("clipped",
        greatest(least(col("n_chars"), col("p95")), col("p05")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        max("p05").as("p05"), max("p95").as("p95"),
        sum(when(col("n_chars") =!= col("clipped"), 1L).otherwise(0L))
          .as("n_clipped"),
        sum("clipped").as("sum_clipped"))
      .orderBy("lang")
  }

  private val winsorizeOracle: String =
    """WITH d AS (SELECT lang, doc_id, n_chars FROM documents),
      |r AS (SELECT lang, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
      |      AS rn,
      |    count(*) OVER (PARTITION BY lang) AS cnt
      |  FROM d),
      |lo AS (SELECT lang, n_chars AS p05 FROM r
      |  WHERE rn = CAST(ceil(cnt * 1.0 / 20) AS BIGINT)),
      |hi AS (SELECT lang, n_chars AS p95 FROM r
      |  WHERE rn = CAST(ceil(cnt * 19.0 / 20) AS BIGINT)),
      |c AS (SELECT d.lang, d.n_chars, lo.p05, hi.p95,
      |    greatest(least(d.n_chars, hi.p95), lo.p05) AS clipped
      |  FROM d JOIN lo USING (lang) JOIN hi USING (lang))
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  max(p05) AS p05, max(p95) AS p95,
      |  CAST(sum(CASE WHEN n_chars != clipped THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clipped,
      |  CAST(sum(clipped) AS BIGINT) AS sum_clipped
      |FROM c GROUP BY lang ORDER BY lang""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q_winsorize", winsorize,
      Some(winsorizeOracle), "curate/winsorize-exact-percentile-clip"),
    QuerySpec("q_source_divergence", sourceDivergence,
      Some(sourceDivergenceOracle), "curate/js-divergence-drift"),
    QuerySpec("q_outlier_mad", outlierMad,
      Some(outlierMadOracle), "curate/mad-outlier-screen"),
    QuerySpec("q_quality_filter", qualityFilter,
      Some(qualityFilterOracle), "curate/quality-percentile-gate"),
    QuerySpec("q_quality_filter_rank", qualityFilterRank,
      Some(qualityFilterOracle),
      "curate/quality-percentile-gate (value-group rank, mega-lang-safe)"),
    QuerySpec("q_decontaminate", decontaminate,
      Some(decontaminateOracle), "curate/decontaminate"),
    QuerySpec("q_decontaminate_bloom", decontaminateBloom,
      Some(decontaminateOracle), "curate/decontaminate-bloom-prefilter"),
    QuerySpec("q_pii_redact", piiRedact,
      Some(piiRedactOracle), "curate/pii-redact"),
    QuerySpec("q_text_repetition", textRepetition,
      Some(textRepetitionOracle), "curate/repetition-signals"),
    QuerySpec("q_sample_stratified", sampleStratified,
      Some(sampleStratifiedOracle), "curate/stratified-sample"),
    QuerySpec("q_sample_weighted", sampleWeighted,
      Some(sampleWeightedOracle), "curate/weighted-sample"),
    QuerySpec("q_sample_weighted_group", sampleWeightedPerGroup,
      Some(sampleWeightedPerGroupOracle), "curate/weighted-sample-quota"),
    QuerySpec("q_embed_quantize", embedQuantize,
      Some(embedQuantizeOracle), "curate/embed-quantize"),
    QuerySpec("q_shard_balance", shardBalance,
      Some(shardBalanceOracle), "curate/shard-balance-shuffle"),
    QuerySpec("q_quality_classifier", qualityClassifier,
      Some(qualityClassifierOracle), "curate/perceptron-quality-classifier"),
    QuerySpec("q_pack_sequences", packSequences,
      Some(packSequencesOracle), "curate/sequence-packing"),
    QuerySpec("q_pack_sequences_chunked",
      (s: SparkSession, d: String) => packSequencesChunked(s, d),
      Some(packSequencesOracle),
      "curate/sequence-packing (chunk-and-stitch prefix, mega-lang-safe)"),
    QuerySpec("q_agg_median_rank", aggMedianRank,
      Some(aggMedianRankOracle), "olap/exact-median"),
    QuerySpec("q_window_ntile", windowNtile,
      Some(windowNtileOracle), "window/ntile-cume-dist"),
    QuerySpec("q_mixture_weights", mixtureWeights,
      Some(mixtureWeightsOracle), "curate/mixture-weights"),
    QuerySpec("q_source_cap", sourceCap,
      Some(sourceCapOracle), "curate/source-cap"),
    QuerySpec("q_corpus_overlap", corpusOverlap,
      Some(corpusOverlapOracle), "curate/corpus-overlap"),
    QuerySpec("q_dsir_weights", dsirWeights,
      Some(dsirWeightsOracle), "curate/dsir-importance-weights"),
    QuerySpec("q_dsir_weights_indexed", dsirWeightsIndexed,
      Some(dsirWeightsOracle), "curate/dsir-persisted-serving"),
    QuerySpec("q_corpus_overlap_sketch", corpusOverlapSketch,
      Some(corpusOverlapSketchOracle), "curate/corpus-overlap-minhash-sketch"),
    QuerySpec("q_corpus_stats", corpusStats,
      Some(corpusStatsOracle), "curate/corpus-data-card"),
    QuerySpec("q_stream_curate", streamCurate,
      Some(streamCurateOracle), "curate/streaming-model-serving"),
    QuerySpec("q_mixture_temperature", mixtureTemperature,
      Some(mixtureTemperatureOracle), "curate/mixture-temperature"),
    QuerySpec("q_split_assign", splitAssign,
      Some(splitAssignOracle), "curate/train-val-test-split"),
    QuerySpec("q_split_leakproof", splitLeakproof,
      Some(splitLeakproofOracle), "curate/leakproof-group-split"),
  )
}
