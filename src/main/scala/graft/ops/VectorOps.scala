package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.dedup.Dedup
import graft.similarity.Ann

/** Similarity search + embedding dedup over the `embeddings` table. */
object VectorOps {

  /** Brute-force exact cosine top-3 for a small query set (ids < 8). */
  def annBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val emb = load(spark, dir, "embeddings")
    Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 8), k = 3)
      .orderBy("qid", "rank")
  }

  /** LSH-bucketed approximate top-3 (Spark-native planes; rows-only check,
    * recall vs brute force asserted in ScalaTest). */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = load(spark, dir, "embeddings")
    Ann.lshTopK(emb, emb.filter(col("vec_id") < 8), k = 3, dim = 64, nBits = 6)
      .orderBy("qid", "rank")
  }

  /** Embedding near-dup pairs: cosine >= 0.9 within the same label block. */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDup(load(spark, dir, "embeddings"),
        "embedding", "vec_id", "label", threshold = 0.9)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .orderBy("id_a", "id_b")

  /** IVF top-3 at FULL probe (nProbe = #cells): every cell is scanned, so
    * the result is provably the exact brute-force answer and the whole
    * IVF machinery (quantizer fit, cell assignment, probe ranking,
    * per-cell re-rank) gets a real DuckDB differential. The approximate
    * regime (nProbe < cells) keeps its recall assertion in IvfSkewSpec. */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = load(spark, dir, "embeddings")
    val index = graft.similarity.Ivf.build(emb, k = 16)
    graft.similarity.Ivf.topK(index, emb.filter(col("vec_id") < 8),
        k = 3, nProbe = 16)
      .orderBy("qid", "rank")
  }

  /** IVF recall gate in the genuinely APPROXIMATE regime (nProbe = 2 of
    * 10 cells): recall@5 of [[graft.similarity.Ivf.topK]] against the
    * exact brute-force top-5, as one differential row.
    *
    * The driver's embeddings carry no cosine locality (only ~9% of true
    * top-5 neighbors share the query's label), so NO coarse quantizer can
    * beat recall ≈ nProbe/#cells on them — IVF's contract assumes
    * clustered data. Like the parse gates synthesizing deck lines from
    * `orders`, this gate PLANTS a deterministic clustered embedding per
    * vec_id (one-hot cluster direction + exact-integer-arithmetic noise,
    * replayable bit-for-bit in DuckDB), then runs the REAL Ivf.topK
    * machinery — centroid-distance probe ranking (raw-double l2sq order,
    * same left fold both engines), per-cell cosine re-rank, and the
    * recall join/aggregate. Cell assignment uses the closed form
    * vec_id%10, which provably equals nearest-centroid here: the planted
    * noise is bounded by ±0.15 per coordinate while the one-hot gap to a
    * wrong centroid is ≥ 0.7.
    */
  def annIvfRecall(spark: SparkSession, dir: String): DataFrame = {
    val nCells = 10
    val k = 5
    val planted = load(spark, dir, "embeddings").select(col("vec_id"))
      .withColumn("embedding",
        transform(sequence(lit(1), lit(64)), j =>
          when(j === pmod(col("vec_id"), lit(nCells)) + 1, lit(1.0))
            .otherwise(lit(0.0)) +
          (pmod(col("vec_id") * 37 + j * 11, lit(101)).cast("double")
            / 337.0 - 0.15)))
    val centroids = (0 until nCells).map(c =>
      (c, Array.tabulate(64)(j => if (j == c) 1.0 else 0.0))).toArray
    val assigned = planted
      .select(col("vec_id").as("id"), col("embedding").as("emb"),
        pmod(col("vec_id"), lit(nCells)).cast("int").as("cell"))
      .repartition(col("cell"))
    val index = graft.similarity.Ivf.Index(centroids, assigned)
    val queries = planted.filter(col("vec_id") < 32)
    val ivf = graft.similarity.Ivf.topK(index, queries, k = k, nProbe = 2)
    val bf = Ann.bruteForceTopK(planted, queries, k = k)
    val hits = ivf
      .join(bf.select(col("qid"), col("neighbor")), Seq("qid", "neighbor"),
        "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("n_hit"))
    queries.select(col("vec_id").as("qid"))
      .join(hits, Seq("qid"), "left_outer")
      .agg(count(lit(1)).as("n_queries"),
        round(sum(coalesce(col("n_hit"), lit(0L))) / (count(lit(1)) * k),
          6).as("recall_at_5"))
  }

  private val annIvfRecallOracle: String = {
    val planted =
      """list_transform(generate_series(1, 64), j ->
        |    (CASE WHEN j = (vec_id % 10) + 1 THEN 1.0 ELSE 0.0 END)
        |    + (CAST((vec_id*37 + j*11) % 101 AS DOUBLE) / 337.0 - 0.15))""".stripMargin
    val cdistTerm =
      "(q.qv[j] - (CASE WHEN j = c.cell + 1 THEN 1.0 ELSE 0.0 END))"
    s"""WITH ev AS (SELECT vec_id, $planted AS v FROM embeddings),
       |a AS (SELECT vec_id, v, CAST(vec_id % 10 AS INT) AS cell FROM ev),
       |q AS (SELECT vec_id AS qid, v AS qv FROM ev WHERE vec_id < 32),
       |cd AS (SELECT q.qid, c.cell,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(generate_series(1, 64), j ->
       |        $cdistTerm * $cdistTerm)),
       |      (acc, x) -> acc + x) AS cdist
       |  FROM q, (SELECT unnest(generate_series(0, 9)) AS cell) c),
       |probes AS (SELECT qid, cell FROM (SELECT qid, cell,
       |    row_number() OVER (PARTITION BY qid ORDER BY cdist ASC, cell ASC)
       |      AS rn FROM cd) t
       |  WHERE rn <= 2),
       |cand AS (SELECT p.qid, a2.vec_id AS neighbor,
       |    round(list_cosine_similarity(q.qv, a2.v), 6) AS cos
       |  FROM probes p JOIN a a2 ON a2.cell = p.cell
       |  JOIN q ON q.qid = p.qid
       |  WHERE a2.vec_id != p.qid),
       |ivf AS (SELECT qid, neighbor FROM (SELECT qid, neighbor,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor ASC)
       |      AS rnk FROM cand) t
       |  WHERE rnk <= 5),
       |bfc AS (SELECT q.qid, e2.vec_id AS neighbor,
       |    round(list_cosine_similarity(q.qv, e2.v), 6) AS cos
       |  FROM q JOIN ev e2 ON e2.vec_id != q.qid),
       |bf AS (SELECT qid, neighbor FROM (SELECT qid, neighbor,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor ASC)
       |      AS rnk FROM bfc) t
       |  WHERE rnk <= 5),
       |hits AS (SELECT i.qid, count(*) AS n_hit FROM ivf i
       |  JOIN bf b ON b.qid = i.qid AND b.neighbor = i.neighbor
       |  GROUP BY i.qid)
       |SELECT count(*) AS n_queries,
       |  round(CAST(sum(coalesce(h.n_hit, 0)) AS DOUBLE) / (count(*) * 5),
       |    6) AS recall_at_5
       |FROM q LEFT JOIN hits h ON h.qid = q.qid""".stripMargin
  }

  /** DuckDB replica of the LSH path: the SAME seeded hyperplanes (embedded
    * as double literals — Java Double.toString round-trips exactly), the
    * same left-to-right dot-product fold (list_reduce is a plain left
    * fold, and 0.0 + x == x exactly, so the init makes no difference),
    * bucket join, and round-6 cosine re-rank. Upgrades ANN-LSH from a
    * rows-only check to a full differential. */
  private val annLshOracle: String = {
    val rnd = new scala.util.Random(42)
    val planes = Seq.fill(6)(Seq.fill(64)(rnd.nextGaussian()))
    val bucketExpr = planes.zipWithIndex.map { case (p, i) =>
      val lst = p.mkString("[", ", ", "]")
      s"""(CASE WHEN list_reduce(
         |      list_transform(generate_series(1, 64), j -> v[j] * ($lst)[j]),
         |      (a, x) -> a + x) >= 0
         |    THEN 1::BIGINT ELSE 0::BIGINT END << $i)""".stripMargin
    }.mkString(" +\n  ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, v,
       |  $bucketExpr AS bkt
       |  FROM e),
       |q AS (SELECT vec_id AS qid, v AS qv, bkt FROM b WHERE vec_id < 8),
       |cand AS (SELECT q.qid, c.vec_id AS neighbor,
       |    round(list_cosine_similarity(q.qv, c.v), 6) AS cos
       |  FROM q JOIN b c ON c.bkt = q.bkt AND c.vec_id != q.qid)
       |SELECT qid, CAST(rank AS INT) AS rank, neighbor FROM (
       |  SELECT qid, neighbor, row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, neighbor ASC) AS rank FROM cand) t
       |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
  }

  /** Exact top-3 oracle — shared by brute force and full-probe IVF (at
    * nProbe = #cells the IVF candidate set is the whole corpus, so both
    * must produce the identical ranking). */
  private val exactTop3Oracle =
    """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id < 8),
      |c AS (SELECT vec_id AS neighbor, embedding::DOUBLE[] AS cv FROM embeddings)
      |SELECT qid, rank, neighbor FROM (
      |  SELECT qid, neighbor, row_number() OVER (PARTITION BY qid
      |    ORDER BY round(list_cosine_similarity(qv, cv), 6) DESC, neighbor ASC) AS rank
      |  FROM q JOIN c ON neighbor != qid) t
      |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q_ann_ivf", annIvf, Some(exactTop3Oracle), "similarity/ann-ivf"),
    QuerySpec("q_ann_brute_force", annBruteForce, Some(exactTop3Oracle),
      "similarity/ann-brute"),
    QuerySpec("q_ann_lsh", annLsh, Some(annLshOracle), "similarity/ann-lsh"),
    QuerySpec("q_ann_ivf_recall", annIvfRecall, Some(annIvfRecallOracle),
      "similarity/ann-ivf-recall"),
    QuerySpec("q_dedup_embedding", dedupEmbedding, Some(
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin), "dedup/embedding-cosine"),
  )
}
