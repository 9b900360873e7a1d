package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.dedup.Dedup
import graft.similarity.Ann

/** Similarity search + embedding dedup over the `embeddings` table. */
object VectorOps {

  /** Seed-centroid quality scoring — the "similarity to a curated seed
    * corpus" screen (the LLaMA-1 Wikipedia-likeness filter, one linear
    * probe cheaper than a classifier): average a small trusted seed set
    * into one centroid, score every corpus vector by cosine to it, and
    * tier the corpus for downstream sampling.
    *
    * Determinism: the centroid's per-dimension mean is an exact integer
    * micro-unit sum (the SemDedup-portable pattern) divided once, so
    * both engines build bit-identical centroids; scoring is the native
    * codegen cosine, rounded to 6.
    *
    * 100 TB shape: the seed aggregate collapses to 64 rows; the centroid
    * (one 64-double array) rides into the scan as a literal — scoring is
    * a map-side expression over the corpus, no join, no shuffle at all
    * after the seed pass. */
  def seedQuality(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.expressions.CosineSimilarity.cosineNative
    val emb = load(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val seeds = emb.filter(col("vec_id") < 32)
    val nSeeds = 32.0
    val centroid = seeds
      .select(posexplode(col("v")).as(Seq("j", "x")))
      .groupBy("j").agg(sum(round(col("x") * 1e6, 0).cast("long")).as("ms"))
      .orderBy("j")
      .collect() // 64 rows — bounded centroid read, like the IVF path
      .map(r => r.getAs[Long]("ms").toDouble / (nSeeds * 1e6))
    val cv = array(centroid.toSeq.map(lit): _*)
    emb.select(col("vec_id"),
        round(cosineNative(col("v"), cv), 6).as("score"))
      .withColumn("tier",
        when(col("score") >= 0.15, "high")
          .when(col("score") >= 0.0, "mid")
          .otherwise("low"))
      .orderBy("vec_id")
  }

  private val seedQualityOracle: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |m AS (SELECT j, sum(CAST(round(v[j] * 1000000.0) AS BIGINT)) AS ms
      |  FROM (SELECT v FROM e WHERE vec_id < 32) seeds,
      |    (SELECT unnest(generate_series(1, 64)) AS j) g
      |  GROUP BY j),
      |c AS (SELECT list(CAST(ms AS DOUBLE) / (32.0 * 1000000.0) ORDER BY j)
      |    AS cv FROM m)
      |SELECT e.vec_id, round(list_cosine_similarity(e.v, c.cv), 6) AS score,
      |  CASE WHEN round(list_cosine_similarity(e.v, c.cv), 6) >= 0.15
      |    THEN 'high'
      |    WHEN round(list_cosine_similarity(e.v, c.cv), 6) >= 0.0 THEN 'mid'
      |    ELSE 'low' END AS tier
      |FROM e, c ORDER BY e.vec_id""".stripMargin

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

  /** Embedding near-dup pairs: cosine >= 0.9 within the same label block
    * (the caller-block overload — `label` is a genuine domain key here).
    * Runs over [[plantedEmbeddings]]: the raw table has no pair above
    * cosine ~0.52, so the un-planted gate compared empty sets; the twins
    * share their source's label, so the block path must surface them. */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDup(plantedEmbeddings(spark, dir),
        "embedding", "vec_id", "label", threshold = 0.9)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .orderBy("id_a", "id_b")

  /** The driver's embeddings carry no pair above cosine ~0.52 at any SF,
    * so a threshold-0.9 near-dup over the raw table is vacuous (the
    * caller-block gate above inherits that — it validates the join shape
    * on an empty survivor set). Like [[annIvfRecall]]'s planted clusters,
    * this fixture PLANTS a deterministic twin (vec_id + 100000) for every
    * vec_id < 50: coordinate j scaled by (1 + 0.001*(j mod 5)) — pure
    * double arithmetic, replayed bit-for-bit by the oracle (DuckDB lambda
    * index is 1-based; Spark's is 0-based, hence the (j+1) below). Twin
    * pairs land at cosine ~0.999997; everything else stays far below
    * threshold, so the LSH path must surface exactly the planted pairs. */
  private def plantedEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"),
        col("label"))
    val twins = e.filter(col("vec_id") < 50)
      .select((col("vec_id") + lit(100000L)).as("vec_id"),
        transform(col("embedding"), (x, j) =>
          x * (lit(1.0) + lit(0.001) * (((j + lit(1)) % 5).cast("double"))))
          .as("embedding"),
        col("label")) // a twin shares its source's domain block
    e.unionAll(twins)
  }

  /** Embedding near-dup with NO caller blocking key: the ADAPTIVE
    * internal-LSH path ([[graft.dedup.Dedup.lshParamsFor]] picks the
    * geometry from corpus size + threshold — (4 bits, 6 tables) at every
    * testdata scale, which is what the oracle replays), exact cosine
    * verifies, over [[plantedEmbeddings]]. Fully differential — the
    * oracle replays the same seeded planes, the OR-of-tables candidate
    * join, and the verify. */
  def dedupEmbeddingAuto(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDup(plantedEmbeddings(spark, dir),
        "embedding", "vec_id", threshold = 0.9, dim = 64)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .orderBy("id_a", "id_b")

  /** Recall of the internal-LSH near-dup path against the exact all-pairs
    * answer over [[plantedEmbeddings]], as one differential row (n_exact,
    * n_recalled, recall) — the all-pairs side is the oracle baseline by
    * design, same as [[annBruteForce]]. */
  def dedupEmbeddingRecall(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.expressions.CosineSimilarity.cosineNative
    val base = plantedEmbeddings(spark, dir)
    val ids = base.select(col("vec_id").as("id"), col("embedding").as("v"))
    val exact = ids.select(col("id").as("id_a"), col("v").as("v_a"))
      .join(ids.select(col("id").as("id_b"), col("v").as("v_b")),
        col("id_a") < col("id_b"))
      .filter(cosineNative(col("v_a"), col("v_b")) >= 0.9)
      .select("id_a", "id_b")
    val lsh = Dedup.embeddingNearDup(base, "embedding", "vec_id",
        threshold = 0.9, dim = 64)
      .select("id_a", "id_b")
    val hit = exact.join(lsh, Seq("id_a", "id_b"), "left_semi")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(hit.agg(count(lit(1)).as("n_recalled")))
      .select(col("n_exact"), col("n_recalled"),
        round(col("n_recalled").cast("double") /
          when(col("n_exact") === 0, lit(null)).otherwise(col("n_exact")),
          6).as("recall"))
  }

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

  /** Batch-vs-batch kNN JOIN — the shape where the query side is a
    * TABLE, not a serving batch (corpus-vs-corpus linking, SemDedup-like
    * candidate generation): [[graft.similarity.Ivf.topK]] with
    * `broadcastProbes = Some(false)` forces the cell-partitioned
    * SHUFFLE join — both sides repartition by cell, no broadcast,
    * the plan that survives when neither side fits an executor. Run at
    * FULL probe so the result is provably the exact brute-force top-3
    * for every tenth vector (the same exactness trick as q_ann_ivf),
    * giving the shuffle path its own differential; PlanShapeSpec pins
    * that no broadcast of the probe side sneaks back in. */
  def annKnnJoin(spark: SparkSession, dir: String): DataFrame = {
    val emb = load(spark, dir, "embeddings")
    val index = graft.similarity.Ivf.build(emb, k = 8)
    graft.similarity.Ivf.topK(index, emb.filter(col("vec_id") % 10 === 0),
        k = 3, nProbe = 8, broadcastProbes = Some(false))
      .orderBy("qid", "rank")
  }

  private val annKnnJoinOracle =
    """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id % 10 = 0),
      |c AS (SELECT vec_id AS neighbor, embedding::DOUBLE[] AS cv FROM embeddings)
      |SELECT qid, rank, neighbor FROM (
      |  SELECT qid, neighbor, row_number() OVER (PARTITION BY qid
      |    ORDER BY round(list_cosine_similarity(qv, cv), 6) DESC, neighbor ASC) AS rank
      |  FROM q JOIN c ON neighbor != qid) t
      |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** Incremental EMBEDDING assignment against a PERSISTED hyperplane
    * index ([[graft.dedup.EmbeddingIndex]] — the vector analog of the
    * q_dedup_incremental_indexed lifecycle): corpus = vec_id % 5 != 0
    * (built once, memoized), batch = vec_id % 5 = 0 plus planted twins
    * (+100000) of the 10 smallest corpus ids. Twins must come back
    * 'near' assigned to their source; everything else is 'novel' (the
    * raw table has no cosine-0.9 pairs). Per call — per bench repeat —
    * only the assign runs: the serving cost of continuous ingestion. */
  private val eidxStoreCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.pipeline.Store]

  def dedupEmbeddingIncremental(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val corpus = e.filter(col("vec_id") % 5 =!= 0)
    val store = eidxStoreCache.synchronized {
      eidxStoreCache.getOrElseUpdate((spark, dir), {
        val base = SourceSinkOps.tmp("eidx", dir)
        graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
        val st = new graft.pipeline.Store(spark, base)
        graft.dedup.EmbeddingIndex.build(st, "e", corpus,
          "embedding", "vec_id", dim = 64, bitsPerTable = 4, tables = 6)
        st
      })
    }
    val twins = corpus.orderBy("vec_id").limit(10)
      .select((col("vec_id") + lit(100000L)).as("vec_id"),
        transform(col("embedding"), (x, j) =>
          x * (lit(1.0) + lit(0.001) * (((j + lit(1)) % 5).cast("double"))))
          .as("embedding"))
    val batch = e.filter(col("vec_id") % 5 === 0).unionAll(twins)
    graft.dedup.EmbeddingIndex.assign(store, "e", batch,
        "embedding", "vec_id", threshold = 0.9)
      .orderBy("vec_id")
  }

  /** DuckDB replica of one persisted-index DECISION, parameterized by
    * the corpus and batch selections (both must yield (vec_id, v) with v
    * DOUBLE[]) so sequential micro-batches replay by feeding batch N's
    * accepted novels into batch N+1's corpus — same planes (shared
    * generator), same OR-of-tables candidates, best-match ranking by
    * round-6 cosine with ties to the smallest corpus id, and the
    * recursive min-label closure over verified novel pairs. */
  private def embeddingDecisionSql(corpusSel: String,
      batchSel: String): String = {
    val exprs = nearDupBucketExprs(tables = 6, bits = 4, dim = 64, seed = 42)
    def bucketUnion(rel: String): String = exprs.zipWithIndex.map {
      case (ex, t) => s"SELECT vec_id, $t AS tbl, $ex AS bkt FROM $rel"
    }.mkString("\nUNION ALL\n")
    s"""(WITH RECURSIVE
       |corpus AS MATERIALIZED ($corpusSel),
       |batch AS MATERIALIZED ($batchSel),
       |cb AS MATERIALIZED (${bucketUnion("corpus")}),
       |bb AS MATERIALIZED (${bucketUnion("batch")}),
       |cand AS (SELECT DISTINCT b.vec_id AS bid, c.vec_id AS cid
       |  FROM bb b JOIN cb c ON b.tbl = c.tbl AND b.bkt = c.bkt),
       |sc AS (SELECT cand.bid, cand.cid,
       |    round(list_cosine_similarity(bv.v, cv.v), 6) AS cos
       |  FROM cand JOIN batch bv ON bv.vec_id = cand.bid
       |  JOIN corpus cv ON cv.vec_id = cand.cid
       |  WHERE list_cosine_similarity(bv.v, cv.v) >= 0.9),
       |near AS MATERIALIZED (SELECT bid, cid FROM (SELECT bid, cid,
       |    row_number() OVER (PARTITION BY bid ORDER BY cos DESC, cid ASC)
       |      AS rn FROM sc) t WHERE rn = 1),
       |novel AS MATERIALIZED (SELECT vec_id FROM batch
       |  WHERE vec_id NOT IN (SELECT bid FROM near)),
       |np AS MATERIALIZED (SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
       |  FROM bb a JOIN bb b2 ON a.tbl = b2.tbl AND a.bkt = b2.bkt
       |    AND a.vec_id < b2.vec_id
       |  JOIN novel na ON na.vec_id = a.vec_id
       |  JOIN novel nb ON nb.vec_id = b2.vec_id
       |  JOIN batch va ON va.vec_id = a.vec_id
       |  JOIN batch vb ON vb.vec_id = b2.vec_id
       |  WHERE list_cosine_similarity(va.v, vb.v) >= 0.9),
       |edges AS MATERIALIZED (SELECT id_a AS id, id_b AS nbr FROM np
       |  UNION ALL SELECT id_b, id_a FROM np),
       |reach AS (SELECT vec_id AS id, vec_id AS label FROM novel
       |  UNION
       |  SELECT e.id, r.label FROM edges e JOIN reach r ON r.id = e.nbr),
       |nlab AS (SELECT id, min(label) AS lbl FROM reach GROUP BY id)
       |SELECT near.bid AS vec_id, near.cid AS assigned, 'near' AS matched
       |FROM near
       |UNION ALL
       |SELECT novel.vec_id AS vec_id, nlab.lbl AS assigned, 'novel' AS matched
       |FROM novel JOIN nlab ON nlab.id = novel.vec_id)""".stripMargin
  }

  private val dedupEmbeddingIncrementalOracle: String =
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |tsrc AS (SELECT vec_id, v FROM e0 WHERE vec_id % 5 <> 0
       |  ORDER BY vec_id LIMIT 10),
       |tw AS (SELECT vec_id + 100000 AS vec_id,
       |  list_transform(v, (x, j) -> x * (1.0 + 0.001 * CAST(j % 5 AS DOUBLE))) AS v
       |  FROM tsrc)
       |SELECT vec_id, assigned, matched FROM ${embeddingDecisionSql(
          "SELECT vec_id, v FROM e0 WHERE vec_id % 5 <> 0",
          "SELECT vec_id, v FROM e0 WHERE vec_id % 5 = 0"
            + " UNION ALL SELECT vec_id, v FROM tw")} t
       |ORDER BY vec_id""".stripMargin

  /** Streaming embedding ingestion
    * ([[graft.streaming.StreamingDedup.vectorIngest]]): vectors arrive
    * as TWO parquet files (vec_id % 10 = 0, then % 10 = 5 plus EXACT
    * re-keyed copies of batch 1 — a copy must come back 'near' its
    * appended batch-1 source at cosine ~1), each micro-batch assigned
    * against the persisted [[graft.dedup.EmbeddingIndex]] with
    * per-batch compaction on. The oracle replays the two decisions
    * SEQUENTIALLY (batch 2's corpus = corpus ∪ batch 1's accepted
    * novels). */
  def dedupEmbeddingStream(spark: SparkSession, dir: String): DataFrame = {
    val store = eidxStoreCache.synchronized {
      eidxStoreCache.getOrElseUpdate((spark, dir + "#stream"), {
      val base = SourceSinkOps.tmp("eidxs", dir)
      graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
      val e = load(spark, dir, "embeddings")
        .select(col("vec_id").cast("long").as("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val st = new graft.pipeline.Store(spark, s"$base/store")
      graft.dedup.EmbeddingIndex.build(st, "e",
        e.filter(col("vec_id") % 5 =!= 0), "embedding", "vec_id",
        dim = 64, bitsPerTable = 4, tables = 6)
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
      val t0 = 1700000000000L
      writeBatchFile(e.filter(col("vec_id") % 10 === 0), "b0.parquet", t0)
      writeBatchFile(e.filter(col("vec_id") % 10 === 5)
          .unionAll(e.filter(col("vec_id") % 10 === 0)
            .select((col("vec_id") + 1000000L).as("vec_id"),
              col("embedding"))),
        "b1.parquet", t0 + 3600000L)
      graft.streaming.StreamingDedup.vectorIngest(spark, landing,
        e.schema, st, "e", s"$base/ck", "embedding", "vec_id",
        threshold = 0.9, compactEvery = Some(1)).awaitTermination()
      st
    })}
    spark.read.parquet(store.path("vdecisions")).orderBy("vec_id")
  }

  private val dedupEmbeddingStreamOracle: String =
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |d0 AS MATERIALIZED (SELECT * FROM ${embeddingDecisionSql(
          "SELECT vec_id, v FROM e0 WHERE vec_id % 5 <> 0",
          "SELECT vec_id, v FROM e0 WHERE vec_id % 10 = 0")} t0),
       |acc0 AS MATERIALIZED (SELECT e.vec_id, e.v FROM e0 e
       |  JOIN d0 ON d0.vec_id = e.vec_id
       |  WHERE d0.matched = 'novel' AND d0.assigned = e.vec_id),
       |d1 AS (SELECT * FROM ${embeddingDecisionSql(
          "SELECT vec_id, v FROM e0 WHERE vec_id % 5 <> 0"
            + " UNION ALL SELECT vec_id, v FROM acc0",
          "SELECT vec_id, v FROM e0 WHERE vec_id % 10 = 5"
            + " UNION ALL SELECT vec_id + 1000000, v FROM e0"
            + " WHERE vec_id % 10 = 0")} t1)
       |SELECT vec_id, assigned, matched FROM d0
       |UNION ALL SELECT vec_id, assigned, matched FROM d1
       |ORDER BY vec_id""".stripMargin

  /** The persisted-index SERVING path: [[graft.similarity.Ivf
    * .buildPersisted]] fits and writes the index ONCE (memoized fixture);
    * every call — every bench repeat — then measures what production
    * serving pays: [[graft.similarity.Ivf.load]] + probe + re-rank, no
    * k-means refit. Full probe again, so the exact-top-3 oracle applies
    * and the whole persisted lifecycle (write, read-back schemas, float32
    * cell storage, probe against collected centroids) gets a real
    * differential. */
  private val ivfStoreCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.pipeline.Store]

  def annIvfIndexed(spark: SparkSession, dir: String): DataFrame = {
    val store = ivfStoreCache.synchronized {
      ivfStoreCache.getOrElseUpdate((spark, dir), {
        val base = SourceSinkOps.tmp("ivfidx", dir)
        graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
        val st = new graft.pipeline.Store(spark, base)
        graft.similarity.Ivf.buildPersisted(st, "ivf",
          load(spark, dir, "embeddings"), k = 16)
        st
      })
    }
    val index = graft.similarity.Ivf.load(store, "ivf")
    graft.similarity.Ivf.topK(index,
        load(spark, dir, "embeddings").filter(col("vec_id") < 8),
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

  /** DuckDB bucket expressions for the internal-LSH near-dup path: one
    * expression per hyperplane table, generated from the SAME
    * [[Dedup.hyperplaneTables]] draw the Spark path uses (Double.toString
    * literals round-trip exactly; list_reduce replays the left fold). */
  private def nearDupBucketExprs(
      tables: Int, bits: Int, dim: Int, seed: Long): Seq[String] =
    Dedup.hyperplaneTables(tables, bits, dim, seed).map { tp =>
      tp.zipWithIndex.map { case (p, i) =>
        val lst = p.mkString("[", ", ", "]")
        s"""(CASE WHEN list_reduce(
           |      list_transform(generate_series(1, $dim), j -> v[j] * ($lst)[j]),
           |      (a, x) -> a + x) >= 0
           |    THEN 1::BIGINT ELSE 0::BIGINT END << $i)""".stripMargin
      }.mkString(" +\n  ")
    }

  /** Shared WITH-clause prefix: the planted-twin fixture (mirrors
    * [[plantedEmbeddings]]; DuckDB lambda index j is 1-based where
    * Spark's is 0-based, so `j % 5` here pairs with `(j+1) % 5` there) +
    * per-table hyperplane buckets bkt_0..bkt_{n-1}. */
  private def nearDupBucketedCte: String = {
    // (bits, tables) = Dedup.lshParamsFor at every testdata scale — the
    // adaptive gate path resolves to exactly this geometry there
    val exprs = nearDupBucketExprs(tables = 6, bits = 4, dim = 64, seed = 42)
    val cols = exprs.zipWithIndex
      .map { case (e, t) => s"$e AS bkt_$t" }.mkString(",\n  ")
    s"""$plantedCte,
       |b AS (SELECT vec_id, v,
       |  $cols
       |  FROM e)""".stripMargin
  }

  /** The planted-twin fixture alone (label preserved — a twin shares its
    * source's domain block), for oracles that need no hyperplane CTE. */
  private val plantedCte: String =
    """e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |tw AS (SELECT vec_id + 100000 AS vec_id, label,
      |  list_transform(v, (x, j) -> x * (1.0 + 0.001 * CAST(j % 5 AS DOUBLE))) AS v
      |  FROM e0 WHERE vec_id < 50),
      |e AS (SELECT * FROM e0 UNION ALL SELECT * FROM tw)""".stripMargin

  private def anyBucketMatch: String =
    (0 until 6).map(t => s"a.bkt_$t = c.bkt_$t").mkString(" OR ")

  private val dedupEmbeddingAutoOracle: String =
    s"""WITH $nearDupBucketedCte,
       |cand AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b, a.v AS va, c.v AS vb
       |  FROM b a JOIN b c ON a.vec_id < c.vec_id
       |    AND ($anyBucketMatch))
       |SELECT id_a, id_b, round(list_cosine_similarity(va, vb), 6) AS cos
       |FROM cand WHERE list_cosine_similarity(va, vb) >= 0.9
       |ORDER BY id_a, id_b""".stripMargin

  private val dedupEmbeddingRecallOracle: String =
    s"""WITH $nearDupBucketedCte,
       |exact AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b
       |  FROM e a JOIN e c ON a.vec_id < c.vec_id
       |    AND list_cosine_similarity(a.v, c.v) >= 0.9),
       |cand AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b
       |  FROM b a JOIN b c ON a.vec_id < c.vec_id
       |    AND ($anyBucketMatch)
       |    AND list_cosine_similarity(a.v, c.v) >= 0.9),
       |hit AS (SELECT e.id_a, e.id_b FROM exact e
       |  JOIN cand c ON c.id_a = e.id_a AND c.id_b = e.id_b)
       |SELECT (SELECT count(*) FROM exact) AS n_exact,
       |  (SELECT count(*) FROM hit) AS n_recalled,
       |  round(CAST((SELECT count(*) FROM hit) AS DOUBLE) /
       |    nullif((SELECT count(*) FROM exact), 0), 6) AS recall""".stripMargin

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

  /** SemDedup through the PRODUCTION k-means path ([[graft.similarity
    * .Ivf.build]] quantizer → the shared decision core), run in a
    * provably-exact regime so the gate carries a FULL differential —
    * the same trick that made q_ann_ivf exact (full probe): plant EXACT
    * duplicate vectors (base ∪ copies of vec_id &lt; 50 under shifted
    * ids) and set the threshold where only exact copies can land
    * (0.9999; the nearest distinct fixture pair is far below). K-means
    * cell ids are engine-arbitrary, but `transform` is a pure function
    * of the vector, so identical vectors ALWAYS share a cell — every
    * above-threshold edge survives the within-cell restriction no
    * matter what partition the quantizer fit, the closure equals the
    * all-pairs closure, and exact copies tie on centroid cosine so
    * keep falls to the id tiebreak. The oracle replays that closure
    * all-pairs; if the fixture ever grew a distinct pair above
    * threshold split across cells, the diff would fail loudly. Cell id
    * and cent_cos stay engine-native and are not emitted here —
    * [[semdedupPortable]] carries their differential with the portable
    * quantizer, and SemDedupSpec pins the k = 16 multi-cell planted
    * semantics. */
  def semdedup(spark: SparkSession, dir: String): DataFrame = {
    val base = load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val emb = base.unionByName(base.filter(col("vec_id") < 50)
      .withColumn("vec_id", col("vec_id") + 100000))
    graft.dedup.SemDedup.semDedup(emb, "embedding", "vec_id",
        threshold = 0.9999, k = 8)
      .select(col("id").as("vec_id"), col("group_id"), col("keep"))
      .orderBy("vec_id")
  }

  private val semdedupOracle: String =
    """WITH RECURSIVE e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, embedding::DOUBLE[] FROM embeddings
      |  WHERE vec_id < 50),
      |pairs AS MATERIALIZED (SELECT a.vec_id AS id_a, c.vec_id AS id_b
      |  FROM e a JOIN e c ON a.vec_id < c.vec_id
      |    AND list_cosine_similarity(a.v, c.v) >= 0.9999),
      |edges AS MATERIALIZED (SELECT id_a AS id, id_b AS nbr FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs),
      |reach AS (SELECT id, id AS label FROM (SELECT DISTINCT id FROM edges) s
      |  UNION
      |  SELECT e2.id, r.label FROM edges e2 JOIN reach r ON r.id = e2.nbr),
      |labels AS (SELECT id, min(label) AS group_id FROM reach GROUP BY id),
      |lab AS (SELECT e.vec_id,
      |    coalesce(l.group_id, e.vec_id) AS group_id
      |  FROM e LEFT JOIN labels l ON l.id = e.vec_id)
      |SELECT vec_id, group_id,
      |  row_number() OVER (PARTITION BY group_id ORDER BY vec_id) = 1 AS keep
      |FROM lab ORDER BY vec_id""".stripMargin

  /** SemDedup with every stage engine-portable: one 6-bit seeded
    * hyperplane table as the quantizer (≤64 cells), micro-unit-quantized
    * exact centroids, within-cell cosine-0.9 components, keep =
    * least-prototypical. Full DuckDB differential including the
    * transitive closure (recursive CTE). */
  def semdedupPortable(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.SemDedup.semDedupPortable(plantedEmbeddings(spark, dir),
        "embedding", "vec_id", threshold = 0.9, bits = 6, dim = 64)
      .select(col("id").as("vec_id"), col("cell"), col("group_id"),
        col("cent_cos"), col("keep"))
      .orderBy("vec_id")

  /** Johnson–Lindenstrauss random projection 64 → 16
    * ([[graft.similarity.Projection]]): the ANN-preprocessing pass that
    * narrows vectors before indexing. Fully differential — the seeded
    * Gaussian matrix rides into the oracle as literal coefficients and
    * both engines fold the dot product left-to-right, so the projected
    * values match bit-for-bit before the round. Emitted long
    * (id, pos, value) so the diff is per-component. */
  def embedProject(spark: SparkSession, dir: String): DataFrame =
    graft.similarity.Projection.project(load(spark, dir, "embeddings"),
        "embedding", "vec_id", outDim = 16, dim = 64)
      .select(col("id").as("vec_id"),
        posexplode(col("p")).as(Seq("pos", "pv")))
      .select(col("vec_id"), col("pos"), round(col("pv"), 6).as("pv"))
      .orderBy("vec_id", "pos")

  private val embedProjectOracle: String = {
    val branches = graft.similarity.Projection.matrix(16, 64, 42L)
      .zipWithIndex.map { case (row, j) =>
        val lst = row.mkString("[", ", ", "]")
        s"""SELECT vec_id, $j AS pos, round(list_reduce(
           |  list_transform(generate_series(1, 64), i -> v[i] * ($lst)[i]),
           |  (a, x) -> a + x) / sqrt(16.0), 6) AS pv FROM e""".stripMargin
      }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
       |$branches
       |ORDER BY vec_id, pos""".stripMargin
  }

  private val semdedupPortableOracle: String = {
    val cellExpr = nearDupBucketExprs(tables = 1, bits = 6, dim = 64,
      seed = 42).head
    s"""WITH RECURSIVE $plantedCte,
       |cells AS MATERIALIZED (SELECT vec_id, v,
       |  $cellExpr AS cell
       |  FROM e),
       |cq AS (SELECT cell, i AS pos,
       |    CAST(sum(CAST(round(v[i] * 1000000.0) AS BIGINT)) AS BIGINT) AS sq,
       |    count(*) AS n
       |  FROM cells, unnest(generate_series(1, 64)) AS g(i)
       |  GROUP BY cell, i),
       |cent AS MATERIALIZED (SELECT cell,
       |    list(CAST(sq AS DOUBLE) / (1000000.0 * n) ORDER BY pos) AS cent
       |  FROM cq GROUP BY cell),
       |pairs AS MATERIALIZED (SELECT a.vec_id AS id_a, c.vec_id AS id_b
       |  FROM cells a JOIN cells c ON c.cell = a.cell
       |    AND a.vec_id < c.vec_id
       |    AND list_cosine_similarity(a.v, c.v) >= 0.9),
       |edges AS MATERIALIZED (SELECT id_a AS id, id_b AS nbr FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       |reach AS (SELECT id, id AS label FROM (SELECT DISTINCT id FROM edges) s
       |  UNION
       |  SELECT e2.id, r.label FROM edges e2 JOIN reach r ON r.id = e2.nbr),
       |labels AS (SELECT id, min(label) AS group_id FROM reach GROUP BY id),
       |cc AS (SELECT c.vec_id, c.cell,
       |    round(list_cosine_similarity(c.v, ct.cent), 6) AS cent_cos
       |  FROM cells c JOIN cent ct ON ct.cell = c.cell),
       |lab AS (SELECT cc.vec_id, cc.cell, cc.cent_cos,
       |    coalesce(l.group_id, cc.vec_id) AS group_id
       |  FROM cc LEFT JOIN labels l ON l.id = cc.vec_id)
       |SELECT vec_id, cell, group_id, cent_cos,
       |  row_number() OVER (PARTITION BY group_id
       |    ORDER BY cent_cos, vec_id) = 1 AS keep
       |FROM lab ORDER BY vec_id""".stripMargin
  }

  /** Brute-force top-3 over INT8-QUANTIZED vectors — the
    * memory-bandwidth form of the exact first pass: per-vector max-abs
    * quantization to [-127, 127] (the [[CurateOps.embedQuantize]]
    * convention; cosine is invariant to the per-vector scale, so
    * quantized cosine tracks true cosine to int8 precision), integer
    * dot products and norms (exact in any order — max |dot| here is
    * 64·127² ≈ 2^20), one double division + round-6 at the end. At 100
    * TB the int8 corpus is 8× smaller than float64 in the scan — this
    * is the candidate-generation pass PQ/IVF systems run before float
    * re-rank ([[annIvf]] provides the cell-pruned variant; composing
    * the two is cell-pruned int8 scanning). Fully differential: integer
    * cores are exact on both engines, ties broken by neighbor id. */
  def annQuantized(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("maxabs", array_max(transform(col("v"), x => abs(x))))
      .filter(col("maxabs") > 0)
      .select(col("vec_id"),
        transform(col("v"), x =>
          round(x * 127.0 / col("maxabs")).cast("long")).as("q"))
      .withColumn("nrm", sqrt(
        aggregate(col("q"), lit(0L), (a, x) => a + x * x).cast("double")))
    val qs = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("q").as("qv"), col("nrm").as("qn"))
    broadcast(qs).join(e.select(col("vec_id").as("neighbor"),
        col("q").as("cv"), col("nrm").as("cn")),
        col("neighbor") =!= col("qid"))
      .select(col("qid"), col("neighbor"),
        round(aggregate(zip_with(col("qv"), col("cv"), (a, b) => a * b),
            lit(0L), (a, x) => a + x).cast("double") /
          (col("qn") * col("cn")), 6).as("cosq"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("cosq").desc, col("neighbor"))))
      .filter(col("rank") <= 3)
      .select("qid", "rank", "neighbor", "cosq")
      .orderBy("qid", "rank")
  }

  private val annQuantizedOracle: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |qz AS (SELECT vec_id,
      |    list_transform(v, x -> CAST(round(x * 127.0 / m) AS BIGINT)) AS q
      |  FROM (SELECT vec_id, v,
      |      list_max(list_transform(v, x -> abs(x))) AS m FROM e) s
      |  WHERE m > 0),
      |n AS (SELECT vec_id, q, sqrt(CAST(list_reduce(
      |    list_prepend(CAST(0 AS BIGINT), list_transform(q, x -> x * x)),
      |    (a, x) -> a + x) AS DOUBLE)) AS nrm FROM qz),
      |qs AS (SELECT vec_id AS qid, q AS qv, nrm AS qn FROM n WHERE vec_id < 8),
      |cand AS (SELECT qs.qid, c.vec_id AS neighbor,
      |    round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(generate_series(1, 64), j -> qs.qv[j] * c.q[j])),
      |      (a, x) -> a + x) AS DOUBLE) / (qs.qn * c.nrm), 6) AS cosq
      |  FROM qs JOIN n c ON c.vec_id != qs.qid)
      |SELECT qid, CAST(rank AS INT) AS rank, neighbor, cosq FROM (
      |  SELECT qid, neighbor, cosq, row_number() OVER (PARTITION BY qid
      |    ORDER BY cosq DESC, neighbor) AS rank FROM cand) t
      |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** Corpus topic clustering via [[graft.similarity.Cluster]]: 3 Lloyd
    * rounds of spherical k-means (k = 8) from the k lowest-id seeds,
    * then the final assignment. The WHOLE fit is differential — the
    * oracle unrolls every assignment and every fixed-point recentering
    * as a CTE chain, so a drift in any iteration (not just the last
    * assignment) fails the diff. See [[graft.similarity.Cluster]] for
    * why the fit is engine-portable at all. */
  def clusterKmeans(spark: SparkSession, dir: String): DataFrame = {
    val emb = load(spark, dir, "embeddings")
      .select(col("vec_id").cast("long").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    graft.similarity.Cluster.lloyd(emb, k = 8, iters = 3)
      .select(col("id").as("vec_id"), col("cell"), col("cos"))
      .orderBy("vec_id")
  }

  /** The persisted-centroid SERVING path: [[graft.similarity.Cluster
    * .buildPersisted]] fits and writes the converged centroids ONCE
    * (memoized fixture); every call then measures what a nightly scoring
    * run pays — load k centroid rows + ONE map-side assignment pass, no
    * 4-pass refit. Centroids persist as exact doubles, so the output is
    * identical to [[clusterKmeans]] and the same unrolled-Lloyd oracle
    * differentials the whole persisted lifecycle. */
  private val clusterStoreCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.pipeline.Store]

  def clusterAssignIndexed(spark: SparkSession, dir: String): DataFrame = {
    val emb = load(spark, dir, "embeddings")
      .select(col("vec_id").cast("long").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val store = clusterStoreCache.synchronized {
      clusterStoreCache.getOrElseUpdate((spark, dir), {
        val base = SourceSinkOps.tmp("clusteridx", dir)
        graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
        val st = new graft.pipeline.Store(spark, base)
        graft.similarity.Cluster.buildPersisted(st, "km", emb,
          k = 8, iters = 3)
        st
      })
    }
    val cents = graft.similarity.Cluster.loadCentroids(store, "km")
    graft.similarity.Cluster.assign(emb, cents)
      .select(col("id").as("vec_id"), col("cell"), col("cos"))
      .orderBy("vec_id")
  }

  /** SEMANTIC decontamination — the third leg of the decontamination
    * triad (exact shingles: `CurateOps.decontaminate`; fuzzy titles:
    * `EditJoin.join`): corpus documents whose EMBEDDING sits within
    * cosine `threshold` of any benchmark item are flagged, catching the
    * paraphrased leaks token-level methods miss. Emits the evidence
    * pairs (corpus id, bench id, round-6 cosine), ordered.
    *
    * 100 TB shape: a benchmark suite is tiny next to the corpus (here
    * 40 vectors; MMLU-scale is 10^4) — the bench side BROADCASTS and the
    * scan-side BroadcastNestedLoopJoin evaluates |bench| native codegen
    * cosines per corpus row, map-side, zero corpus shuffle (the
    * seed-quality shape with k centroids instead of 1). For a bench set
    * too big to broadcast, the hyperplane-LSH bucketed join
    * ([[graft.dedup.Dedup.embeddingNearDup]]) is the drop-in scale path;
    * at threshold 0.9 both return identical pairs (gate-pinned there).
    *
    * Fixture: the driver's embeddings carry no cross pair above ~0.52,
    * so the bench set PLANTS the leak — a deterministic twin
    * (vec_id + 200000, coordinate j scaled by 1 + 0.001*((j+1) mod 5),
    * DuckDB-replayable like [[plantedEmbeddings]]) of every vec_id < 40.
    * Twins land at cosine ~0.999997 against exactly their source;
    * the gate must surface those 40 pairs and nothing else. */
  def decontaminateSemantic(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.expressions.CosineSimilarity.cosineNative
    val emb = load(spark, dir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val bench = emb.filter(col("vec_id") < 40)
      .select((col("vec_id") + lit(200000L)).as("bench_id"),
        transform(col("v"), (x, j) =>
          x * (lit(1.0) + lit(0.001) * (((j + lit(1)) % 5).cast("double"))))
          .as("bv"))
    emb.join(broadcast(bench), cosineNative(col("v"), col("bv")) >= lit(0.9))
      .select(col("vec_id"), col("bench_id"),
        round(cosineNative(col("v"), col("bv")), 6).as("cos"))
      .orderBy("vec_id", "bench_id")
  }

  private val decontaminateSemanticOracle: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |b AS (SELECT vec_id + 200000 AS bench_id,
      |    list_transform(v, (x, j) ->
      |      x * (1.0 + 0.001 * CAST(j % 5 AS DOUBLE))) AS bv
      |  FROM e WHERE vec_id < 40)
      |SELECT e.vec_id, b.bench_id,
      |  round(list_cosine_similarity(e.v, b.bv), 6) AS cos
      |FROM e, b WHERE list_cosine_similarity(e.v, b.bv) >= 0.9
      |ORDER BY e.vec_id, b.bench_id""".stripMargin

  private val clusterKmeansOracle: String = {
    // unrolled Lloyd chain: asg_i assigns against cent_{i-1}; cq/cent_i
    // recenter with the same micro-unit integer arithmetic as Spark
    def assignCte(i: Int): String =
      s"""asg$i AS MATERIALIZED (
         |  SELECT id, v, cell, cos FROM (
         |    SELECT e.id, e.v, c.cell,
         |      round(list_cosine_similarity(e.v, c.cv), 6) AS cos,
         |      row_number() OVER (PARTITION BY e.id
         |        ORDER BY round(list_cosine_similarity(e.v, c.cv), 6)
         |          DESC, c.cell) AS rn
         |    FROM e CROSS JOIN cent${i - 1} c) t WHERE rn = 1)""".stripMargin
    def recenterCte(i: Int): String =
      s"""cq$i AS (SELECT cell, g.i AS pos,
         |    CAST(sum(CAST(round(v[g.i] * 1000000.0) AS BIGINT)) AS BIGINT)
         |      AS sq,
         |    count(*) AS n
         |  FROM asg$i, unnest(generate_series(1, 64)) AS g(i)
         |  GROUP BY cell, g.i),
         |cent$i AS MATERIALIZED (SELECT cell,
         |    list(CAST(sq AS DOUBLE) / (1000000.0 * n) ORDER BY pos) AS cv
         |  FROM cq$i GROUP BY cell)""".stripMargin
    val iters = (1 to 3)
      .map(i => s"${assignCte(i)},\n${recenterCte(i)}").mkString(",\n")
    s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
       |  FROM embeddings),
       |cent0 AS MATERIALIZED (SELECT CAST(rn - 1 AS INT) AS cell, v AS cv
       |  FROM (SELECT v, row_number() OVER (ORDER BY id) AS rn FROM e
       |    QUALIFY rn <= 8) s),
       |$iters,
       |${assignCte(4)}
       |SELECT id AS vec_id, cell, cos FROM asg4 ORDER BY vec_id""".stripMargin
  }

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q_embed_seed_quality", seedQuality, Some(seedQualityOracle),
      "curate/seed-centroid-quality-screen"),
    QuerySpec("q_ann_ivf", annIvf, Some(exactTop3Oracle), "similarity/ann-ivf"),
    QuerySpec("q_ann_ivf_indexed", annIvfIndexed, Some(exactTop3Oracle),
      "similarity/ann-ivf-persisted"),
    QuerySpec("q_ann_brute_force", annBruteForce, Some(exactTop3Oracle),
      "similarity/ann-brute"),
    QuerySpec("q_ann_lsh", annLsh, Some(annLshOracle), "similarity/ann-lsh"),
    QuerySpec("q_ann_ivf_recall", annIvfRecall, Some(annIvfRecallOracle),
      "similarity/ann-ivf-recall"),
    QuerySpec("q_dedup_embedding", dedupEmbedding, Some(
      s"""WITH $plantedCte
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin), "dedup/embedding-cosine"),
    QuerySpec("q_dedup_embedding_auto", dedupEmbeddingAuto,
      Some(dedupEmbeddingAutoOracle), "dedup/embedding-lsh-auto"),
    QuerySpec("q_dedup_embedding_recall", dedupEmbeddingRecall,
      Some(dedupEmbeddingRecallOracle), "dedup/embedding-lsh-recall"),
    QuerySpec("q_dedup_embedding_incremental", dedupEmbeddingIncremental,
      Some(dedupEmbeddingIncrementalOracle), "dedup/embedding-incremental"),
    QuerySpec("q_dedup_embedding_stream", dedupEmbeddingStream,
      Some(dedupEmbeddingStreamOracle), "dedup/embedding-streaming"),
    QuerySpec("q_ann_knn_join", annKnnJoin, Some(annKnnJoinOracle),
      "similarity/knn-join-shuffle"),
    QuerySpec("q_embed_project", embedProject, Some(embedProjectOracle),
      "similarity/jl-projection"),
    QuerySpec("q_semdedup", semdedup, Some(semdedupOracle),
      "dedup/semdedup-kmeans-exact-regime"),
    QuerySpec("q_semdedup_portable", semdedupPortable,
      Some(semdedupPortableOracle), "dedup/semdedup-differential"),
    QuerySpec("q_ann_quantized", annQuantized,
      Some(annQuantizedOracle), "similarity/ann-int8-brute"),
    QuerySpec("q_cluster_kmeans", clusterKmeans,
      Some(clusterKmeansOracle), "similarity/kmeans-lloyd-portable"),
    QuerySpec("q_cluster_assign_indexed", clusterAssignIndexed,
      Some(clusterKmeansOracle), "similarity/kmeans-persisted-serving"),
    QuerySpec("q_decontaminate_semantic", decontaminateSemantic,
      Some(decontaminateSemanticOracle), "curate/semantic-decontamination"),
  )

}
