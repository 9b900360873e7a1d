package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.CosineSimilarity.cosineNative
import graft.functions.expressions.HyperplaneBuckets.bucketsNative

/** Semantic deduplication (SemDedup, Abbas et al. 2023): cluster the
  * corpus embeddings with a coarse quantizer, then within each cluster
  * collapse groups of semantically near-identical items (pairwise cosine
  * above a threshold, transitively closed) down to ONE kept
  * representative — the member LEAST similar to the cluster centroid
  * (the paper's keep-least-prototypical policy: prototypical text is
  * what the rest of the cluster already covers).
  *
  * Two quantizers, one decision core:
  *  - [[semDedup]]: k-means cells via [[graft.similarity.Ivf.build]] —
  *    the production path (seeded, deterministic for a fixed corpus, but
  *    not replayable in another engine, so its gate is rows-only).
  *  - [[semDedupPortable]]: one table of seeded random hyperplanes as
  *    the quantizer ([[Dedup.hyperplaneTables]], the exact constants the
  *    DuckDB oracle re-embeds) — every stage engine-portable, carrying
  *    the full differential for the shared decision core.
  *
  * 100 TB shape: this is the SemDedup bargain — the only quadratic work
  * is WITHIN a cell, so the cell count k must scale with the corpus
  * (the paper uses k ~ sqrt(N); cells then stay bounded and the
  * pairwise phase is N·cellSize, not N²). Cells partition the corpus:
  * the pair join, the component propagation, and the keep ranking all
  * key on cell or on group ids that never cross cells, so nothing
  * shuffles corpus-wide except the one cell-assignment pass. Centroid
  * similarity uses integer-quantized per-dimension sums (micro-units),
  * so the centroid is exact in any partition order — the same
  * determinism contract as [[graft.ops.LmOps]] micro-nats.
  */
object SemDedup {

  /** Decision core over a cell-assigned corpus: near-pair edges within
    * each cell, transitive closure ([[Dedup.propagateMinLabels]]),
    * keep = the member with the LOWEST round-6 centroid cosine per
    * group (ties to the smallest id).
    *
    * `assigned`: (id, v: array&lt;double&gt;, cell); `centroids`: (cell,
    * cent: array&lt;double&gt;) — at most one row per cell, broadcast. */
  private[dedup] def decide(assigned: DataFrame, centroids: DataFrame,
      threshold: Double, maxIter: Int,
      maxCandidatePairs: Long = Long.MaxValue): DataFrame = {
    // within-cell pairs ARE the SemDedup bargain's fine print: the guard
    // measures the exact quadratic the quantizer admits (Σ n·(n−1)/2
    // over cell occupancies — one tiny aggregate), the same round-17
    // circuit-breaker contract as Dedup.guardBucketPairs' LSH sites
    Dedup.guardBucketPairs(assigned, Seq("cell"), maxCandidatePairs,
      "semDedup", advice = "A hot cell (k too small for the corpus, or " +
        "a degenerate quantizer direction) makes the within-cell pair " +
        "phase quadratic in that cell's members; raise the budget, " +
        "raise k (the paper's k ~ sqrt(N)), or raise `bits` on the " +
        "portable quantizer.")
    val a = assigned.select(col("cell"), col("id").as("id_a"), col("v").as("v_a"))
    val b = assigned.select(col("cell"), col("id").as("id_b"), col("v").as("v_b"))
    val edges = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(cosineNative(col("v_a"), col("v_b")) >= threshold)
      .select("id_a", "id_b")
    val (labels, _) = Dedup.propagateMinLabels(edges, maxIter)
    val withCent = assigned.join(broadcast(centroids), Seq("cell"))
      .select(col("id"), col("cell"),
        round(cosineNative(col("v"), col("cent")), 6).as("cent_cos"))
    withCent.join(labels.toDF("id", "lbl"), Seq("id"), "left")
      .select(col("id"), col("cell"), col("cent_cos"),
        coalesce(col("lbl"), col("id")).as("group_id"))
      .withColumn("keep", row_number().over(
        Window.partitionBy("group_id")
          .orderBy(col("cent_cos"), col("id"))) === 1)
      .select("id", "cell", "group_id", "cent_cos", "keep")
  }

  /** Exact per-dimension centroids from integer-quantized components:
    * each value rounds to micro-units (a long), per-(cell, dim) sums are
    * then order-independent integer arithmetic, and the final division
    * back to double is a single deterministic operation — bit-identical
    * across engines and partition orders. */
  private def quantizedCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg(sum(round(col("x") * lit(1e6), 0).cast("long")).as("sq"),
        count(lit(1)).as("n"))
      .groupBy("cell")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("sq"), col("n")))),
        s => s.getField("sq").cast("double") /
          (lit(1e6) * s.getField("n").cast("double"))).as("cent"))

  /** SemDedup over k-means cells — the production quantizer. `emb` needs
    * `idCol` (long-castable) and `vecCol` (numeric array). Returns
    * (id, cell, group_id, cent_cos, keep). */
  def semDedup(emb: DataFrame, vecCol: String, idCol: String,
      threshold: Double, k: Int, seed: Long = 42L,
      maxIter: Int = 20,
      maxCandidatePairs: Long = Long.MaxValue): DataFrame =
    semDedupWithIndex(
      graft.similarity.Ivf.build(emb, k, idCol, vecCol, seed),
      threshold, maxIter, maxCandidatePairs)

  /** SemDedup over an already-built (or persisted-and-loaded) IVF index
    * — the serving form: a nightly dedup pass reads the
    * [[graft.similarity.Ivf.buildPersisted]] tables instead of refitting
    * the quantizer per run (cells persist as float32; widening back to
    * double is exact for float-source embeddings, so served decisions
    * match the refit path bit-for-bit — pinned in SemDedupSpec). */
  def semDedupWithIndex(index: graft.similarity.Ivf.Index,
      threshold: Double, maxIter: Int = 20,
      maxCandidatePairs: Long = Long.MaxValue): DataFrame = {
    val assigned = index.assigned.select(col("id"),
      transform(col("emb"), x => x.cast("double")).as("v"), col("cell"))
    val spark = assigned.sparkSession
    import spark.implicits._
    val centroids = index.centroids.toSeq.toDF("cell", "cent")
    decide(assigned, centroids, threshold, maxIter, maxCandidatePairs)
  }

  /** SemDedup with a seeded-hyperplane quantizer (`bits` sign bits of
    * one table = up to 2^bits cells) and [[quantizedCentroids]] — every
    * stage replayable in a SQL oracle. */
  def semDedupPortable(emb: DataFrame, vecCol: String, idCol: String,
      threshold: Double, bits: Int, dim: Int, seed: Long = 42L,
      maxIter: Int = 20,
      maxCandidatePairs: Long = Long.MaxValue): DataFrame = {
    val planes = Dedup.hyperplaneTables(1, bits, dim, seed)
    val assigned = emb.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .select(col("id"), col("v"),
        bucketsNative(col("v"), planes).getItem(0).as("cell"))
    decide(assigned, quantizedCentroids(assigned), threshold, maxIter,
      maxCandidatePairs)
  }
}
