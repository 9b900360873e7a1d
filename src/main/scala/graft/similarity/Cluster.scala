package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.expressions.CosineSimilarity.cosineNative

/** Corpus clustering: distributed spherical k-means (Lloyd iterations,
  * cosine assignment) built so every stage is ENGINE-PORTABLE and
  * PARTITION-INDEPENDENT — the property MLlib's `KMeans` (and the
  * reference-grade k-means in any native engine) cannot give, because
  * float centroid sums depend on partition order.
  *
  * Three choices buy exactness:
  *  - seeds are the k lowest-id vectors (no RNG);
  *  - assignment is argmax over ROUND-6 cosine with a min-cell
  *    tie-break (the quantization absorbs sub-ULP engine divergence, the
  *    same contract as every cosine gate in the suite);
  *  - recentering sums micro-unit-quantized components as integers
  *    ([[graft.dedup.SemDedup]]'s centroid trick), so the per-dimension
  *    mean is order-independent and bit-identical across engines.
  * A fixed iteration count then makes the WHOLE fit replayable in a SQL
  * oracle (unrolled CTE chain) — a full differential over the algorithm,
  * not just one assignment pass.
  *
  * 100 TB shape: k-means is inherently `iters+1` full passes; each pass
  * here is a map-side projection (centroids ride as LITERAL columns —
  * no join, no shuffle, whole-stage codegen'd) followed by a
  * per-(cell, dim) partial aggregate whose shuffle is k·dim rows per
  * map task — the textbook distributed Lloyd layout. The only driver
  * traffic is k centroid rows per iteration (codebook-sized, same
  * precedent as the PQ codebooks). Empty cells drop out of the centroid
  * set and stop attracting members — identically in both engines.
  */
object Cluster {

  /** Deterministic seed centroids: the k lowest-id vectors, cell id =
    * rank in id order. `emb` must be (id: long, v: array&lt;double&gt;). */
  def seeds(emb: DataFrame, k: Int): Array[(Int, Array[Double])] =
    emb.orderBy("id").limit(k).collect()
      .zipWithIndex
      .map { case (r, i) =>
        (i, r.getSeq[Double](r.fieldIndex("v")).toArray)
      }

  /** One map-side assignment pass: each row gets the cell whose centroid
    * has the highest round-6 cosine (ties to the LOWEST cell id, via the
    * lexicographic (cos, -cell) struct max). Centroids are unrolled into
    * literal per-cell struct expressions — k native cosine kernels per
    * row, no lambda, no join, fully codegen'd. */
  def assign(emb: DataFrame,
      cents: Array[(Int, Array[Double])]): DataFrame = {
    require(cents.nonEmpty, "no centroids")
    val cands = array(cents.map { case (c, cv) =>
      struct(
        round(cosineNative(col("v"), array(cv.map(lit): _*)), 6).as("cos"),
        lit(-c).as("nc"))
    }: _*)
    emb.withColumn("best", array_max(cands))
      .select(col("id"), col("v"),
        (-col("best.nc")).cast("int").as("cell"),
        col("best.cos").as("cos"))
  }

  /** Exact recentering: micro-unit integer per-(cell, dim) sums, one
    * deterministic division back to double. Collects k rows (bounded —
    * the codebook precedent), so the next pass can inline them as
    * literals. */
  def recenter(assigned: DataFrame): Array[(Int, Array[Double])] =
    assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg(sum(round(col("x") * lit(1e6), 0).cast("long")).as("sq"),
        count(lit(1)).as("n"))
      .groupBy("cell")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("sq"), col("n")))),
        s => s.getField("sq").cast("double") /
          (lit(1e6) * s.getField("n").cast("double"))).as("cv"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** `iters` Lloyd rounds from the deterministic seeds, returning the
    * converged centroids. */
  def fit(emb: DataFrame, k: Int, iters: Int): Array[(Int, Array[Double])] = {
    var cents = seeds(emb, k)
    for (_ <- 1 to iters) cents = recenter(assign(emb, cents))
    cents
  }

  /** [[fit]] then a final assignment against the converged centroids.
    * Returns (id, cell, cos) — cos is the round-6 similarity to the
    * final centroid. */
  def lloyd(emb: DataFrame, k: Int, iters: Int): DataFrame =
    assign(emb, fit(emb, k, iters)).select("id", "cell", "cos")

  private val centroidSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("cell",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("cv",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))))

  /** Fit once, persist the converged centroids — the model artifact a
    * serving pipeline loads for ONE-pass assignment of later batches
    * (the `iters+1`-pass fit is the training cost; nightly scoring of
    * new documents should not re-pay it). Centroids persist as exact
    * doubles, so served assignments match the refit path bit-for-bit. */
  def buildPersisted(store: graft.pipeline.Store, prefix: String,
      emb: DataFrame, k: Int, iters: Int): Unit = {
    val cents = fit(emb, k, iters)
    val spark = emb.sparkSession
    import spark.implicits._
    store.write(s"${prefix}_centroids",
      cents.toSeq.map { case (c, v) => (c, v.toSeq) }.toDF("cell", "cv"))
  }

  /** Read persisted centroids for serving (k rows — codebook-sized). */
  def loadCentroids(store: graft.pipeline.Store,
      prefix: String): Array[(Int, Array[Double])] = {
    require(store.exists(s"${prefix}_centroids"),
      s"no persisted centroids under prefix '$prefix' — run buildPersisted")
    store.read(s"${prefix}_centroids", centroidSchema).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
  }
}
