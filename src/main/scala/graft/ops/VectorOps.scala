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
    QuerySpec("q_dedup_embedding", dedupEmbedding, Some(
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin), "dedup/embedding-cosine"),
  )
}
