package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.similarity.Ann

class DedupAnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and once"), // near-dup of 1
    (3L, "completely different words about spark catalyst optimizer plans"),
    (4L, "the quick brown fox jumps over the lazy dog again and again")) // exact dup of 1
    .toDF("doc_id", "text")

  test("exact dedup groups identical payloads (S13)") {
    val out = Dedup.exact(docs, "text", "doc_id").orderBy("keep_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("shingleRows counts distinct n-grams") {
    val rows = Dedup.shingleRows(docs, "text", "doc_id", 3)
    val sizes = rows.groupBy("id").count().orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc 1: 12 tokens -> 10 shingles, "again and again" dup-free? all distinct
    assert(sizes.toMap.apply(1L) == 10)
    assert(sizes.toMap.apply(3L) == 6)
  }

  test("jaccardForPairs matches hand-computed value") {
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val rows = Dedup.shingleRows(docs, "text", "doc_id", 3)
    val j = Dedup.jaccardForPairs(pairs, rows).collect()(0).getAs[Double]("jaccard")
    // docs 1,2 share 9 of their 10+10 shingles -> 9/11
    assert(math.abs(j - 9.0 / 11.0) < 1e-12)
  }

  test("minhashLsh finds near-dup and exact-dup pairs, skips distinct docs") {
    val out = Dedup.minhashLsh(docs, "text", "doc_id",
      shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 4L))) // exact dup always collides
    assert(out.contains((1L, 2L)) || out.contains((2L, 4L))) // near dup
    assert(!out.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("LSH pairs budget: hard fail with a budget, loud WARN without, " +
      "results bit-identical (round-17 verify-stage contract)") {
    // 20 exact copies of one text (NOT exact-collapsed here — minhashLsh
    // is called directly) land in one bucket per band: 8 bands ×
    // C(20,2) = 1520 coincident pairs
    val hot = (0 until 20).map(i =>
      (i.toLong, "shared boilerplate header text repeated on every page"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      Dedup.minhashLsh(hot, "text", "doc_id", maxCandidatePairs = 100)
    }
    assert(e.getMessage.contains("maxCandidatePairs=100"), e.getMessage)
    assert(e.getMessage.contains("exact-collapse"),
      "the failure must name the mitigations")
    // same corpus, no budget: warns past a tiny advisory threshold and
    // proceeds with the exact result
    val out = new java.io.ByteArrayOutputStream()
    sys.props("graft.lsh.warnPairs") = "100"
    val warned = try Console.withOut(new java.io.PrintStream(out, true)) {
      Dedup.minhashLsh(hot, "text", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally sys.props.remove("graft.lsh.warnPairs")
    assert(out.toString.contains("WARN Dedup.minhashLsh"), out.toString)
    val plain = Dedup.minhashLsh(hot, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(warned == plain && plain.size == 190) // C(20,2) distinct pairs
    // the portable generator carries the same contract
    intercept[IllegalStateException] {
      Dedup.minhashLshPortable(hot, "text", "doc_id",
        maxCandidatePairs = 100).collect()
    }
    // a passing budget is invisible
    val guarded = Dedup.minhashLsh(docs, "text", "doc_id",
        maxCandidatePairs = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val free = Dedup.minhashLsh(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == free)
  }

  test("vector pairs budget: embeddingNearDup (LSH and block) and " +
      "SemDedup hard-fail with a budget, warn without, results " +
      "bit-identical (round-18 extension of the round-17 contract)") {
    // 20 byte-identical vectors: every hyperplane table buckets them
    // together (2 tables x C(20,2) = 380 coincident pairs), one block
    // holds them all, and one SemDedup cell holds them all
    val hot = (0 until 20).map(i =>
      (i.toLong, 0, Seq(1.0f, 0.5f, -0.25f, 0.125f)))
      .toDF("vec_id", "label", "embedding")
    val eLsh = intercept[IllegalStateException] {
      Dedup.embeddingNearDup(hot, "embedding", "vec_id", 0.9, 4,
        bitsPerTable = 4, tables = 2, seed = 42L, maxCandidatePairs = 100)
    }
    assert(eLsh.getMessage.contains("maxCandidatePairs=100"), eLsh.getMessage)
    assert(eLsh.getMessage.contains("bitsPerTable"),
      "the failure must name the mitigations")
    val eBlk = intercept[IllegalStateException] {
      Dedup.embeddingNearDup(hot, "embedding", "vec_id", "label", 0.9,
        maxCandidatePairs = 100)
    }
    assert(eBlk.getMessage.contains("blocking key"), eBlk.getMessage)
    val eSem = intercept[IllegalStateException] {
      SemDedup.semDedupPortable(hot, "embedding", "vec_id", 0.9,
        bits = 4, dim = 4, maxCandidatePairs = 100)
    }
    assert(eSem.getMessage.contains("sqrt(N)"), eSem.getMessage)
    // no budget: warns past a tiny advisory threshold and proceeds with
    // the exact result on all three paths
    val out = new java.io.ByteArrayOutputStream()
    sys.props("graft.lsh.warnPairs") = "100"
    val warned = try Console.withOut(new java.io.PrintStream(out, true)) {
      (Dedup.embeddingNearDup(hot, "embedding", "vec_id", 0.9, 4,
          bitsPerTable = 4, tables = 2, seed = 42L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
       SemDedup.semDedupPortable(hot, "embedding", "vec_id", 0.9,
          bits = 4, dim = 4)
        .collect().map(r => (r.getLong(0), r.getBoolean(4))).toSet)
    } finally sys.props.remove("graft.lsh.warnPairs")
    assert(out.toString.contains("WARN Dedup.embeddingNearDup"), out.toString)
    assert(out.toString.contains("WARN Dedup.semDedup"), out.toString)
    val plainPairs = Dedup.embeddingNearDup(hot, "embedding", "vec_id",
        0.9, 4, bitsPerTable = 4, tables = 2, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(warned._1 == plainPairs && plainPairs.size == 190) // C(20,2)
    val plainSem = SemDedup.semDedupPortable(hot, "embedding", "vec_id",
        0.9, bits = 4, dim = 4)
      .collect().map(r => (r.getLong(0), r.getBoolean(4))).toSet
    assert(warned._2 == plainSem
      && plainSem.count(_._2) == 1) // one kept representative
    // a passing budget is invisible
    val guarded = Dedup.embeddingNearDup(hot, "embedding", "vec_id",
        "label", 0.9, maxCandidatePairs = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == plainPairs)
  }

  test("simhash: identical docs distance 0, distinct docs far (dedup)") {
    val sigs = Dedup.simhashSignatures(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(4L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 10)
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("embedding near-dup within blocks (cosine threshold)") {
    val emb = Seq(
      (1L, 0, Seq(1.0f, 0.0f, 0.0f)),
      (2L, 0, Seq(0.99f, 0.1f, 0.0f)),  // near 1
      (3L, 0, Seq(0.0f, 1.0f, 0.0f)),   // orthogonal
      (4L, 1, Seq(1.0f, 0.0f, 0.0f)))   // same dir, other block
      .toDF("vec_id", "label", "embedding")
    val out = Dedup.embeddingNearDup(emb, "embedding", "vec_id", "label", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)))
  }

  test("duplicateSpans counts cross-doc window duplication per document") {
    val docs = Seq(
      (1L, "alpha beta gamma delta unique one two"),
      (2L, "prefix alpha beta gamma delta suffix"),
      (3L, "alpha beta gamma delta alpha beta gamma delta"),
      (4L, "nothing shared here at all whatsoever"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "text", "doc_id", k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: windows = 4; "alpha beta gamma delta" (pos 0) is in docs 2,3
    assert(out(1L) == ((4L, 1L, 250000L)))
    // doc 2: 3 windows, only the middle one duplicated (exact ppm floor)
    assert(out(2L) == ((3L, 1L, 333333L)))
    // doc 3: 5 windows; the shared span occurs at pos 0 AND pos 4 — both
    // occurrences count; "delta alpha", "gamma delta alpha"… windows are
    // unique to doc 3
    assert(out(3L) == ((5L, 2L, 400000L)))
    // doc 4: nothing duplicated, still present with its 3 windows
    assert(out(4L) == ((3L, 0L, 0L)))
  }

  test("lineDedup removes cross-doc lines, keeps order, empties fully-boilerplate docs") {
    val docs = Seq(
      (1L, "header line\nbody one\nbody two\nfooter line"),
      (2L, "header line\nbody three\nfooter line"),
      (3L, "header line\nbody one\nfooter line"),
      (4L, "header line\nfooter line"))
      .toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "text", "doc_id", minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // header/footer are in 4 docs (>= 3) -> removed everywhere;
    // "body one" is in only 2 docs (< 3) -> kept
    assert(out(1L) == ((4L, 2L, "body one\nbody two")))
    assert(out(2L) == ((3L, 2L, "body three")))
    assert(out(3L) == ((3L, 2L, "body one")))
    // a doc that was ALL boilerplate keeps its row with empty clean text
    assert(out(4L) == ((2L, 2L, "")))
  }

  test("adaptive LSH geometry grows bits with corpus size, tables with depth") {
    // all three testdata scales land on the oracle-pinned (4, 6)
    assert(Dedup.lshParamsFor(550, 0.9) == ((4, 6)))
    assert(Dedup.lshParamsFor(2050, 0.9) == ((4, 6)))
    // a 32x corpus deepens the bit width (bucket occupancy held ~flat —
    // a fixed width measured 360x cost at 32x data) and buys recall back
    // with more tables
    val (b32, t32) = Dedup.lshParamsFor(65650, 0.9)
    assert(b32 > 4 && t32 > 6, (b32, t32))
    // a billion-vector corpus stays inside the clamps
    val (bB, tB) = Dedup.lshParamsFor(1000000000L, 0.95)
    assert(bB <= 20 && tB <= 24, (bB, tB))
    // the adaptive entry point itself still recalls the planted twins
    val rnd = new scala.util.Random(13)
    val base = Seq.fill(40)(Array.fill(16)(rnd.nextGaussian()))
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++
      base.take(10).zipWithIndex.map { case (v, i) =>
        (i + 1000L, v.zipWithIndex.map { case (x, j) =>
          x * (1.0 + 0.002 * (j % 3)) }.toSeq)
      }
    val out = Dedup.embeddingNearDup(rows.toDF("vec_id", "embedding"),
        "embedding", "vec_id", threshold = 0.99, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0 until 10).map(i => (i.toLong, i + 1000L)).forall(out.contains))
  }

  test("embedding near-dup with internal LSH blocking recalls planted twins") {
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(40)(Array.fill(16)(rnd.nextGaussian()))
    // plant a near-identical twin (id + 1000) for the first 10 vectors
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++
      base.take(10).zipWithIndex.map { case (v, i) =>
        (i + 1000L, v.zipWithIndex.map { case (x, j) =>
          x * (1.0 + 0.002 * (j % 3)) }.toSeq)
      }
    val emb = rows.toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(emb, "embedding", "vec_id",
        threshold = 0.99, dim = 16, bitsPerTable = 4, tables = 6, seed = 42)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 10).map(i => (i.toLong, i + 1000L)).toSet
    // every planted twin pair recalled; no far pair survives the verify
    assert(planted.subsetOf(out), s"missed ${planted -- out}")
    assert(out.forall { case (a, b) => planted.contains((a, b)) })
  }

  test("ANN brute force returns exact neighbors; LSH recalls them") {
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(30)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val emb = base.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 3)
    val exact = Ann.bruteForceTopK(emb, queries, k = 5)
    assert(exact.groupBy("qid").count().collect().forall(_.getLong(1) == 5))
    // rank 1 neighbor must have the max cosine — cross-check one query
    val approx = Ann.lshTopK(emb, queries, k = 5, dim = 16, nBits = 4)
    val exactSet = exact.filter(col("qid") === 0).collect()
      .map(_.getAs[Long]("neighbor")).toSet
    val approxSet = approx.filter(col("qid") === 0).collect()
      .map(_.getAs[Long]("neighbor")).toSet
    assert(approxSet.subsetOf(exactSet) || approxSet.intersect(exactSet).nonEmpty)
  }

  test("nearDupGroups: exact-first grouping with transitive closure") {
    // 1,4 exact dups; 2 near-dup of 1; 3 distinct; 5-7 a duplicate-heavy
    // cluster (all identical); 8 near-dup chain to 5 via shared prefix
    val heavy = Seq(
      (5L, "spark shuffles partition data across the cluster by key hash"),
      (6L, "spark shuffles partition data across the cluster by key hash"),
      (7L, "spark shuffles partition data across the cluster by key hash"),
      (8L, "spark shuffles partition data across the cluster by key hashes"))
      .toDF("doc_id", "text")
    val all = docs.union(heavy)
    val groups = Dedup.nearDupGroups(all, "text", "doc_id", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups.size == 8)
    assert(groups(4L) == groups(1L)) // exact dup collapses
    assert(groups(2L) == groups(1L)) // near dup joins the cluster
    assert(groups(3L) == 3L)         // distinct doc stays alone
    assert(groups(6L) == groups(5L) && groups(7L) == groups(5L))
    assert(groups(8L) == groups(5L)) // transitive via representative
  }

  test("incrementalNearDup: exact/near corpus matches, novel batch groups") {
    // corpus = docs (ids 1-4); batch: 10 exact-dups 1 (min corpus id of
    // that text since 4 > 1), 11 near-dups 1, 12 novel, 13 exact-dups 12
    // within the batch, 14 novel and isolated
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (11L, "the quick brown fox jumps over the lazy dog again and never"),
      (12L, "structured streaming checkpoints offsets for exactly once sinks"),
      (13L, "structured streaming checkpoints offsets for exactly once sinks"),
      (14L, "columnar parquet footers carry min max statistics per row group"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNearDup(docs, batch, "text", "doc_id",
        threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(out.size == 5)
    assert(out(10L) == ((1L, "exact"))) // exact match wins, min corpus id
    assert(out(11L) == ((1L, "near")))  // LSH-verified against corpus
    assert(out(12L) == ((12L, "novel")))
    assert(out(13L) == ((12L, "novel"))) // batch-exact collapses onto 12
    assert(out(14L) == ((14L, "novel"))) // isolated novel keeps own id

    // the prepared-relations path (corpusRelations built once, batch
    // assigned against them) must be decision-identical to the
    // from-scratch composite — prep is invisible
    val rel = Dedup.corpusRelations(docs, "text", "doc_id")
    val prepared = Dedup
      .incrementalNearDupPrepared(rel, batch, "text", "doc_id",
        threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(prepared == out)
    // and a SECOND batch against the same prepared relations (the
    // per-batch production loop) also matches its from-scratch twin
    val batch2 = Seq(
      (20L, "the quick brown fox jumps over the lazy dog again and ever"),
      (21L, "entirely new content about vector quantization residuals"))
      .toDF("doc_id", "text")
    val p2 = Dedup.incrementalNearDupPrepared(rel, batch2, "text",
        "doc_id", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    val s2 = Dedup.incrementalNearDup(docs, batch2, "text", "doc_id",
        threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(p2 == s2)
  }
}
