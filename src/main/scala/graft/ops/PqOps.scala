package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.similarity.{Ann, Pq}

/** Product-quantization ANN gates ([[graft.similarity.Pq]]): the
  * compressed-domain scan that makes 100 TB of embeddings searchable
  * from the ~3 TB code table. All three gates run the portable
  * head-codebook trainer (the k-means production trainer is compared in
  * PqSpec) so every stage — normalization, micro-unit quantization,
  * codeword derivation, nearest-codeword encode, ADC lookup-table scan,
  * ranking — replays bit-for-bit in DuckDB: the arithmetic is exact
  * integers end to end. */
object PqOps {

  private val M = 8        // subspaces (64-dim -> SUB-dim sub-vectors)
  private val K = 16       // codewords per subspace (4-bit codes)
  private val SUB = 64 / M // sub-vector width — interpolated into the
                           // oracle so M changes can't desync the replica

  /** Normalized micro-unit corpus `(vec_id, mv)` — rows with zero norm
    * dropped on both engines. */
  private def microCorpus(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "embeddings")
      .filter(Pq.l2Norm(col("embedding")) > 0)
      .select(col("vec_id"), Pq.microNormalized(col("embedding")).as("mv"))

  /** Codebook training is the train-once half of the PQ lifecycle (16
    * driver-side rows) — memoized per (session, dir) like every other
    * model fixture, so each gate call measures what recurs in
    * production: encode + ADC scan, not the one-time fit. */
  private val cbCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Pq.Codebooks]

  private def codebooks(spark: SparkSession, dir: String): Pq.Codebooks =
    cbCache.synchronized {
      cbCache.getOrElseUpdate((spark, dir),
        Pq.trainHead(microCorpus(spark, dir), "vec_id", "mv", M, K))
    }

  /** ADC top-3 for the 8 probe queries: corpus encoded, codes scanned —
    * fully differential. */
  def annPq(spark: SparkSession, dir: String): DataFrame = {
    val micro = microCorpus(spark, dir)
    val cb = codebooks(spark, dir)
    val codes = Pq.encode(micro, "vec_id", "mv", cb)
    Pq.adcTopK(codes, micro.filter(col("vec_id") < 8), cb, k = 3)
      .orderBy("qid", "rank")
  }

  /** The persisted SERVING path: books + encoded corpus written once
    * (memoized fixture), every call — every bench repeat — pays what
    * production serving pays: a tiny books read plus the code scan. Same
    * oracle as [[annPq]] — persistence must be invisible. */
  private val pqStoreCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.pipeline.Store]

  def annPqIndexed(spark: SparkSession, dir: String): DataFrame = {
    val store = pqStoreCache.synchronized {
      pqStoreCache.getOrElseUpdate((spark, dir), {
        val base = SourceSinkOps.tmp("pqidx", dir)
        graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
        val st = new graft.pipeline.Store(spark, base)
        Pq.buildPersisted(st, "pq", microCorpus(spark, dir), "vec_id", "mv",
          codebooks(spark, dir))
        st
      })
    }
    val (cb, codes) = Pq.load(store, "pq")
    Pq.adcTopK(codes,
      microCorpus(spark, dir).filter(col("vec_id") < 8), cb, k = 3)
      .orderBy("qid", "rank")
  }

  /** IVF-PQ at FULL probe (nProbe = #cells): the k-means coarse cells
    * prune nothing at full probe, so the result provably equals the
    * flat ADC scan and the whole composition — cell assignment, probe
    * ranking, per-cell code join, ADC, rank-limit — rides the same
    * differential ([[graft.similarity.Ivf]]'s q_ann_ivf trick). The
    * approximate regime (nProbe < cells) keeps its recall floor in
    * PqSpec on planted clusters. */
  private val ivfpqCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (Array[(Int, Array[Double])], DataFrame)]

  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    // coarse quantizer + encoded cells = the train-once index build
    // (memoized fixture; k-means cell ids aren't replayable, which is
    // why the gate runs at full probe); per call — per bench repeat —
    // only SERVING runs: probe ranking, cell join, ADC, rank-limit
    val (centroids, cells) = ivfpqCache.synchronized {
      ivfpqCache.getOrElseUpdate((spark, dir), {
        val micro = microCorpus(spark, dir)
        val cb = codebooks(spark, dir)
        val codes = Pq.encode(micro, "vec_id", "mv", cb)
        val ivf = graft.similarity.Ivf.build(
          micro.select(col("vec_id"),
            transform(col("mv"), x => x.cast("double")).as("embedding")),
          k = 8)
        val joined = codes
          .join(ivf.assigned.select(col("id"), col("cell")), Seq("id"))
          .localCheckpoint()
        (ivf.centroids, joined)
      })
    }
    Pq.adcTopKCells(cells, centroids,
        microCorpus(spark, dir).filter(col("vec_id") < 8),
        codebooks(spark, dir), k = 3, nProbe = 8)
      .orderBy("qid", "rank")
  }

  /** Recall@10 of the ADC ranking against the exact cosine top-10, as
    * one differential row — the quantization-loss measurement PQ systems
    * publish. Both sides replay in DuckDB, so the value (whatever it is)
    * is engine-stable; the quality floor is asserted in PqSpec on the
    * planted-cluster fixture. */
  def annPqRecall(spark: SparkSession, dir: String): DataFrame = {
    val base = load(spark, dir, "embeddings")
      .filter(Pq.l2Norm(col("embedding")) > 0)
    val micro = microCorpus(spark, dir)
    val cb = codebooks(spark, dir)
    val codes = Pq.encode(micro, "vec_id", "mv", cb)
    val adc = Pq.adcTopK(codes, micro.filter(col("vec_id") < 8), cb, k = 10)
    val bf = Ann.bruteForceTopK(base, base.filter(col("vec_id") < 8), k = 10)
    val hits = adc.join(bf.select("qid", "neighbor"), Seq("qid", "neighbor"),
        "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("n_hit"))
    micro.filter(col("vec_id") < 8).select(col("vec_id").as("qid"))
      .join(hits, Seq("qid"), "left_outer")
      .agg(count(lit(1)).as("n_queries"),
        round(sum(coalesce(col("n_hit"), lit(0L))).cast("double") /
          (count(lit(1)) * 10), 6).as("recall_at_10"))
  }

  /** Shared oracle prefix: normalization, micro-units, head codebook (the
    * k smallest vec_ids' sub-vectors, code = rank − 1), and the full
    * (vector × subspace × codeword) exact integer distance relation. */
  private val pqCte: String =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |nn AS (SELECT vec_id, v, sqrt(list_reduce(
       |    list_prepend(CAST(0.0 AS DOUBLE), list_transform(v, x -> x * x)),
       |    (a, x) -> a + x)) AS nrm FROM e),
       |micro AS MATERIALIZED (SELECT vec_id,
       |    list_transform(v, x -> CAST(round(x / nrm * 1000000.0) AS BIGINT)) AS mv
       |  FROM nn WHERE nrm > 0),
       |cbs AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, mv
       |  FROM (SELECT vec_id, mv FROM micro ORDER BY vec_id LIMIT $K) t),
       |cw AS MATERIALIZED (SELECT g.s, cbs.code,
       |    list_transform(generate_series(1, $SUB), j -> mv[g.s * $SUB + j]) AS w
       |  FROM cbs, (SELECT unnest(generate_series(0, ${M - 1})) AS s) g),
       |encd AS MATERIALIZED (SELECT m.vec_id, c.s, c.code,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(generate_series(1, $SUB), j ->
       |        (m.mv[c.s * $SUB + j] - c.w[j]) * (m.mv[c.s * $SUB + j] - c.w[j]))),
       |      (a, x) -> a + x) AS BIGINT) AS d
       |  FROM micro m, cw c),
       |enc AS MATERIALIZED (SELECT vec_id, s, code FROM (
       |    SELECT vec_id, s, code, row_number() OVER (PARTITION BY vec_id, s
       |      ORDER BY d, code) AS rn FROM encd) t
       |  WHERE rn = 1),
       |qdt AS (SELECT vec_id AS qid, s, code, d FROM encd WHERE vec_id < 8),
       |score AS (SELECT q.qid, e2.vec_id AS neighbor,
       |    CAST(sum(q.d) AS BIGINT) AS adist
       |  FROM qdt q JOIN enc e2 ON e2.s = q.s AND e2.code = q.code
       |    AND e2.vec_id != q.qid
       |  GROUP BY q.qid, e2.vec_id)""".stripMargin

  private val annPqOracle: String =
    s"""WITH $pqCte
       |SELECT qid, CAST(rank AS INT) AS rank, neighbor, adist FROM (
       |  SELECT qid, neighbor, adist, row_number() OVER (PARTITION BY qid
       |    ORDER BY adist, neighbor) AS rank FROM score) t
       |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  private val annPqRecallOracle: String =
    s"""WITH $pqCte,
       |adc AS (SELECT qid, neighbor FROM (
       |    SELECT qid, neighbor, row_number() OVER (PARTITION BY qid
       |      ORDER BY adist, neighbor) AS rank FROM score) t
       |  WHERE rank <= 10),
       |bfc AS (SELECT q.vec_id AS qid, c.vec_id AS neighbor,
       |    round(list_cosine_similarity(q.v, c.v), 6) AS cos
       |  FROM nn q JOIN nn c ON c.vec_id != q.vec_id
       |  WHERE q.vec_id < 8 AND q.nrm > 0 AND c.nrm > 0),
       |bf AS (SELECT qid, neighbor FROM (
       |    SELECT qid, neighbor, row_number() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, neighbor ASC) AS rank FROM bfc) t
       |  WHERE rank <= 10),
       |hits AS (SELECT a.qid, count(*) AS n_hit FROM adc a
       |  JOIN bf b ON b.qid = a.qid AND b.neighbor = a.neighbor
       |  GROUP BY a.qid)
       |SELECT count(*) AS n_queries,
       |  round(CAST(sum(coalesce(h.n_hit, 0)) AS DOUBLE) / (count(*) * 10),
       |    6) AS recall_at_10
       |FROM (SELECT vec_id AS qid FROM micro WHERE vec_id < 8) q
       |LEFT JOIN hits h ON h.qid = q.qid""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q_ann_pq", annPq, Some(annPqOracle), "similarity/ann-pq-adc"),
    QuerySpec("q_ann_pq_indexed", annPqIndexed, Some(annPqOracle),
      "similarity/ann-pq-persisted"),
    QuerySpec("q_ann_pq_recall", annPqRecall, Some(annPqRecallOracle),
      "similarity/ann-pq-recall"),
    QuerySpec("q_ann_ivfpq", annIvfPq, Some(annPqOracle),
      "similarity/ann-ivf-pq"),
  )
}
