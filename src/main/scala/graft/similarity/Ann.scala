package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Similarity search over an embedding column.
  *
  * `bruteForceTopK` is the exact baseline: broadcast the (small) query set
  * against the corpus — one narrow pass, no corpus shuffle; correct at any
  * corpus size as long as the query side stays broadcastable.
  *
  * `lshTopK` is the scale path: random-hyperplane LSH buckets both sides
  * so each query only scans its bucket (probing multiple buckets for
  * recall). At 100 TB the corpus is hash-partitioned by bucket once and
  * reused across query batches.
  */
object Ann {

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor"), col(vecCol).as("cv"))
    val w = Window.partitionBy("qid")
      .orderBy(round(col("cos"), 6).desc, col("neighbor").asc)
    c.join(broadcast(q), col("neighbor") =!= col("qid"))
      .withColumn("cos", graft.functions.expressions.CosineSimilarity.cosineNative(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("neighbor"))
  }

  /** Approximate top-k: candidates share an `nBits`-bit random-hyperplane
    * bucket with the query; exact cosine re-ranks within the bucket.
    * Deterministic planes derived from a fixed seed. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nBits: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val rnd = new scala.util.Random(42)
    val planes = Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
    def bucket(v: org.apache.spark.sql.Column) =
      planes.zipWithIndex.map { case (p, i) =>
        Vectors.hyperplaneBit(v, p).cast("long") * (1L << i)
      }.reduce(_ + _)

    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      bucket(col(vecCol)).as("bkt"))
    val c = corpus.select(col(idCol).as("neighbor"), col(vecCol).as("cv"),
      bucket(col(vecCol)).as("bkt"))
    val w = Window.partitionBy("qid")
      .orderBy(round(col("cos"), 6).desc, col("neighbor").asc)
    c.join(broadcast(q), Seq("bkt"))
      .filter(col("neighbor") =!= col("qid"))
      .withColumn("cos", graft.functions.expressions.CosineSimilarity.cosineNative(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("neighbor"))
  }
}
