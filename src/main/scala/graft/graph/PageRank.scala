package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank by bounded power iteration in EXACT integer fixed-point
  * arithmetic — the link-graph quality signal a web-corpus curation
  * pipeline feeds into document scoring (the crawl-side cousin of
  * [[graft.ops.CurateOps]]' per-document quality features).
  *
  * Why integer units instead of doubles: every rank is carried in
  * "pico-units" (each node starts at 1e12) and every damping /
  * out-degree / teleport split is a flooring BIGINT division, the same
  * convention [[graft.ops.CurateOps.mixtureWeights]] established. That
  * makes the fixed iteration count bit-exact and engine-portable — the
  * DuckDB oracle replays the identical integer recurrence and the
  * differential compares hashes, with no float-summation-order slack
  * anywhere. The floor leaks a few units of mass per split by design;
  * the recurrence, not "true" real-valued PageRank, is the contract.
  *
  * Per iteration (damping 0.85 as published by Page et al. 1999):
  *   damped(v)   = (rank(v) * 85) div 100
  *   share(u<-v) = damped(v) div outdeg(v)        for each edge v->u
  *   dangling    = (sum of damped(v) over out-degree-0 v) div N
  *   rank'(u)    = 150e9 + dangling + sum share(u<-v)
  * where 150e9 = (1e12 * 15) div 100 is the per-node teleport mass.
  *
  * Scale shape (1000 executors, billions of edges): the edge list is
  * deduplicated and checkpointed ONCE and every iteration is exactly
  * one hash shuffle — join ranks to edges on src (co-partitioned with
  * the out-degree frame, which is derived from the same edges and
  * shares its partitioning) then groupBy dst with a map-side partial
  * sum. The dangling mass is a one-row aggregate cross-joined back
  * (broadcast, no driver round-trip per sweep), and per-iteration
  * localCheckpoints keep the logical plan from doubling per sweep
  * (same measured rationale as [[graft.dedup.Dedup.propagateMinLabels]]).
  */
object PageRank {

  val StartMass: Long = 1000000000000L // 1e12 pico-units per node
  val TeleportPerNode: Long = 150000000000L // (1e12 * 15) div 100

  /** `(id, rank)` for every edge endpoint after `iterations` sweeps,
    * ranks in pico-units (sum ≈ 1e12 × node count, minus floor leak).
    * Self-loops count as ordinary edges; dedupe edges first if the
    * input carries multiplicity you don't want weighted. */
  def run(edges: DataFrame, iterations: Int = 5): DataFrame =
    resume(edges, None, iterations)

  /** Power iteration from a WARM START: `startRanks` (id, rank) seeds
    * every node it covers, nodes it doesn't cover (new arrivals in a
    * delta-merged graph) start at [[StartMass]]. With `startRanks =
    * None` this is a cold [[run]]. The incremental contract
    * ([[graft.ops.ExtraOps.graphPagerankIncremental]]): a converged
    * rank vector is a far better starting point than uniform mass, so
    * a handful of warm sweeps absorbs an edge delta that a cold start
    * would spend the full budget re-deriving — and because the
    * recurrence is exact integer fixed-point, "warm start + k sweeps"
    * is itself a bit-exact, engine-portable definition that a DuckDB
    * oracle replays verbatim (not an approximation heuristic). */
  def resume(edges: DataFrame, startRanks: Option[DataFrame],
      iterations: Int = 5): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.toDF("src", "dst").distinct().localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    // N is the one driver-side scalar (bounded: a count, read once) —
    // it has to be a literal so the integer teleport/dangling shares
    // are plan constants, not a per-iteration scalar subquery.
    val n = nodes.count()
    if (n == 0)
      return nodes.select(col("id"), col("id").cast("long").as("rank"))
    val outd = e.groupBy("src").agg(count(lit(1)).as("d")).localCheckpoint()

    var ranks = startRanks match {
      case None => nodes.select(col("id"), lit(StartMass).as("rank"))
      case Some(sr) => nodes
        .join(sr.toDF("id", "rank"), Seq("id"), "left")
        .select(col("id"),
          coalesce(col("rank"), lit(StartMass)).as("rank"))
        .localCheckpoint()
    }
    var i = 0
    while (i < iterations) {
      // (rank*85) DIV 100 rewritten exactly as
      // (rank DIV 100)*85 + ((rank%100)*85) DIV 100 — identical for all
      // non-negative ranks (8500q+85r with 85r<8500), but the naive
      // product overflows ANSI longs once a mega-hub accumulates
      // > Long.Max/85 ≈ 1.08e17 pico-units (the wave-4 32× in-degree
      // probe hit it); the split form is safe up to Long.Max, i.e. the
      // representable-mass bound itself. The DuckDB oracle keeps the
      // literal (rank*85)//100 (HUGEINT intermediates) — same values.
      val damped = ranks.select(col("id"),
        expr("(rank DIV 100) * 85L + ((rank % 100) * 85L) DIV 100").as("m"))
      // one shuffle: edges x damped on src (outd shares the edge
      // frame's src partitioning), partial-summed into dst
      val contrib = e
        .join(damped.withColumnRenamed("id", "src"), Seq("src"))
        .join(outd, Seq("src"))
        .select(col("dst").as("id"), expr("m DIV d").as("c"))
        .groupBy("id").agg(sum("c").as("c"))
      // dangling nodes: no out-edges, damped mass teleports uniformly
      val dangling = damped
        .join(outd.select(col("src").as("id")), Seq("id"), "left_anti")
        .agg(coalesce(sum("m"), lit(0L)).as("dm"))
        .select(expr(s"dm DIV ${n}L").as("dang_share"))
      ranks = nodes
        .join(contrib, Seq("id"), "left")
        .crossJoin(dangling) // one broadcast row
        .select(col("id"),
          (lit(TeleportPerNode) + col("dang_share") +
            coalesce(col("c"), lit(0L))).as("rank"))
        .localCheckpoint()
      i += 1
    }
    ranks
  }

  // ---- persisted serving: rank once, absorb deltas with warm sweeps —
  // the web-corpus quality signal must not recompute from scratch per
  // crawl increment (the CorpusIndex / Ivf.buildPersisted lifecycle).
  import org.apache.spark.sql.types._

  private val edgesSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType)))
  private val ranksSchema = StructType(Seq(
    StructField("id", LongType), StructField("rank", LongType)))

  /** Rank the base graph once and persist (edges + converged ranks)
    * under `name`; crash-safe via the shared commit-marker contract. */
  def buildIndex(store: graft.pipeline.Store, name: String,
      edges: DataFrame, iterations: Int = 5): Unit = {
    val e = edges.toDF("src", "dst")
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct()
    store.write(s"${name}_edges", e)
    store.write(s"${name}_ranks", run(e, iterations))
    graft.dedup.IndexCommits.mark(store, name, "base")
  }

  /** Absorb an edge delta against the index: warm-start `sweeps` power
    * iterations over stored ∪ delta edges, stored ranks seeding every
    * known node and new nodes starting at [[StartMass]]. Returns the
    * full updated (id, rank); callers that accept the update persist it
    * back via [[appendDelta]]. The stored graph participates only
    * through its edge relation and rank vector — nothing recomputes the
    * base ranking. */
  def updateWithDelta(store: graft.pipeline.Store, name: String,
      delta: DataFrame, sweeps: Int = 2): DataFrame = {
    graft.dedup.IndexCommits.validate(store, name, Seq("_edges", "_ranks"))
    val e0 = store.read(s"${name}_edges", edgesSchema)
    val r0 = store.read(s"${name}_ranks", ranksSchema)
    val d = delta.toDF("src", "dst")
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    resume(e0.unionByName(d), Some(r0), sweeps)
  }

  /** Accept a delta: persist the merged edge set and updated ranks, with
    * a crash-safe REPLAY contract matching the other persisted indexes.
    * Unlike their append-only batch publishes, this append
    * read-modify-writes the base tables — the rank sweep is NOT
    * idempotent (a warm start from already-updated ranks diverges from a
    * clean run), and [[graft.pipeline.Store.write]] is delete-then-rename
    * (a crash between them leaves the table MISSING, which `read`
    * surfaces as an empty frame) — so BOTH pre-delta tables are
    * snapshotted under the batch tag before the base is touched:
    *
    *   1. commit marker present  → no-op (batch fully applied); retire
    *      any leftover snapshots
    *   2. no intent marker       → base is pristine: snapshot `_ranks`
    *      AND `_edges` under the tag (staged publishes), THEN write the
    *      intent marker recording each snapshot's file count
    *   3. intent marker present  → a prior attempt may have mutated (or
    *      half-deleted) the base; the snapshots, not the live tables,
    *      seed the sweep. A snapshot whose file count disagrees with
    *      the intent record fails LOUDLY — proceeding would re-rank a
    *      delta-only graph and silently drop the base edges.
    *   4. sweep from the rank snapshot over snapshot ∪ delta edges (the
    *      edge union is idempotent — [[resume]] dedups), overwrite
    *      `_edges` / `_ranks`, commit-mark, then retire snapshots +
    *      intent.
    *
    * A re-driven batch with the SAME tag therefore reproduces the
    * clean-run output from any crash point, including mid-`Store.write`
    * of either base table. */
  def appendDelta(store: graft.pipeline.Store, name: String,
      delta: DataFrame, batchTag: String, sweeps: Int = 2): Unit = {
    import graft.pipeline.FsUtils
    import java.nio.charset.StandardCharsets.UTF_8
    val preRanks = new java.io.File(store.path(s"${name}_ranks_pre"))
    val preEdges = new java.io.File(store.path(s"${name}_edges_pre"))
    val intent = new java.io.File(preRanks, s"_intent_$batchTag")
    def tagFiles(dir: java.io.File): Seq[String] =
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith(s"batch_${batchTag}_"))
        .map(_.getPath).sorted.toSeq
    def retire(): Unit = {
      intent.delete()
      FsUtils.clearBatch(preRanks.getPath, batchTag)
      FsUtils.clearBatch(preEdges.getPath, batchTag)
    }
    if (graft.dedup.IndexCommits.committedTags(store, name)
        .contains(batchTag)) {
      retire()
      return
    }
    graft.dedup.IndexCommits.validate(store, name, Seq("_edges", "_ranks"))
    val spark = delta.sparkSession
    if (!intent.exists()) {
      FsUtils.publishBatch(store.read(s"${name}_ranks", ranksSchema),
        preRanks.getPath, batchTag)
      FsUtils.publishBatch(store.read(s"${name}_edges", edgesSchema),
        preEdges.getPath, batchTag)
      java.nio.file.Files.write(intent.toPath,
        s"${tagFiles(preRanks).size} ${tagFiles(preEdges).size}"
          .getBytes(UTF_8))
    }
    val Array(nRanks, nEdges) = new String(
      java.nio.file.Files.readAllBytes(intent.toPath), UTF_8)
      .trim.split(" ").map(_.toInt)
    val (rankFiles, edgeFiles) = (tagFiles(preRanks), tagFiles(preEdges))
    require(rankFiles.size == nRanks && edgeFiles.size == nEdges,
      s"appendDelta($name, batch $batchTag): snapshot loss — intent " +
        s"records $nRanks rank / $nEdges edge files but " +
        s"${rankFiles.size} / ${edgeFiles.size} exist; replaying would " +
        "drop the pre-delta base. Restore the snapshot dirs or rebuild.")
    def snapRead(files: Seq[String],
        schema: org.apache.spark.sql.types.StructType) =
      if (files.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files: _*)
    val r0 = snapRead(rankFiles, ranksSchema)
    val d = delta.toDF("src", "dst")
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    val merged = snapRead(edgeFiles, edgesSchema)
      .unionByName(d).distinct().localCheckpoint()
    val updated = resume(merged, Some(r0), sweeps).localCheckpoint()
    store.write(s"${name}_edges", merged)
    store.write(s"${name}_ranks", updated)
    graft.dedup.IndexCommits.mark(store, name, batchTag)
    retire()
  }
}
