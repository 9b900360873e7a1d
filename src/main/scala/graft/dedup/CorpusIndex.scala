package graft.dedup

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Store

/** Persisted corpus indexes for incremental near-dup assignment — the
  * production contract behind [[Dedup.incrementalNearDup]]: a continuous
  * ingestion run BUILDS these once, READS them per batch, and APPENDS the
  * accepted novel representatives after each batch, so the corpus itself
  * is never re-hashed or re-shingled per run. (Reference analog: the
  * persistent natural-key indexes every nightly run reuses,
  * /root/reference/db/init_db_base.sql:137-145.)
  *
  * Three parquet tables under one [[Store]] root, named `<prefix>_*`:
  *  - `_exact`    (__h string, cid bigint): sha256(text) → smallest
  *    corpus doc id holding that content.
  *  - `_shingles` (id bigint, h bigint): distinct md5-60 word-shingle
  *    hashes per corpus doc — read back only for docs that band-collide
  *    with a batch (candidate-semi-joined before the verify join).
  *  - `_bands`    (cid bigint, band int, bsig array<bigint>): MinHash
  *    band signatures — the LSH candidate index a batch joins against.
  *
  * Invariants the caller owns: `shingleSize`/`numHashes`/`bands` must
  * match across build/assign/append for one prefix (they define the
  * signature space), doc ids are integral, and [[append]] receives only
  * docs whose content hash is absent from the index — exactly what the
  * `matched = 'novel'` self-representative rows of an [[assign]] result
  * are by construction.
  */
object CorpusIndex {

  private val exactSchema = StructType(Seq(
    StructField("__h", StringType), StructField("cid", LongType)))
  private val shingleSchema = StructType(Seq(
    StructField("id", LongType), StructField("h", LongType)))
  private val bandSchema = StructType(Seq(
    StructField("cid", LongType), StructField("band", IntegerType),
    StructField("bsig", ArrayType(LongType))))

  private def indexRows(docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int): (DataFrame, DataFrame) = {
    val c = docs.select(col(idCol).cast("long").as("id"),
      col(textCol).as("t"))
    val rows = Dedup.shingleStringRows(c, "t", "id", shingleSize)
      .select(col("id"), Dedup.md5Hash60(col("sh")).as("h")).distinct()
    val exact = c.select(sha2(col("t"), 256).as("__h"), col("id"))
      .groupBy("__h").agg(min("id").as("cid"))
    (exact, rows)
  }

  /** One-time full-corpus index build (replaces any existing tables). */
  def build(store: Store, prefix: String, corpus: DataFrame,
      textCol: String, idCol: String, shingleSize: Int = 3,
      numHashes: Int = 32, bands: Int = 8): Unit = {
    val (exact, rows) = indexRows(corpus, textCol, idCol, shingleSize)
    val r = rows.persist() // feeds both the shingle and the band table
    store.write(s"${prefix}_exact", exact)
    store.write(s"${prefix}_shingles", r)
    store.write(s"${prefix}_bands",
      Dedup.portableBandRows(r, numHashes, bands).toDF("cid", "band", "bsig"))
    r.unpersist(false)
  }

  /** Per-batch assignment against the PREBUILT indexes — the hot path of
    * continuous ingestion: only the three index tables are read; the
    * corpus documents themselves are never touched. Decision semantics
    * are identical to [[Dedup.incrementalNearDup]] (exact sha2 match,
    * else LSH-verified near match, else batch-local novel closure). */
  def assign(store: Store, prefix: String, batch: DataFrame,
      textCol: String, idCol: String, shingleSize: Int = 3,
      numHashes: Int = 32, bands: Int = 8, threshold: Double = 0.5,
      maxIter: Int = 20): DataFrame =
    Dedup.assignAgainstIndexes(
      store.read(s"${prefix}_exact", exactSchema),
      store.read(s"${prefix}_shingles", shingleSchema),
      store.read(s"${prefix}_bands", bandSchema),
      batch, textCol, idCol, shingleSize, numHashes, bands, threshold,
      maxIter)

  /** Append accepted new corpus members (novel self-representatives of an
    * [[assign]] result, with their text re-attached) to all three
    * indexes. Appends are plain parquet file adds — no read-modify-write
    * of the existing index data, so the per-batch maintenance cost is
    * proportional to the BATCH, not the corpus. */
  def append(store: Store, prefix: String, accepted: DataFrame,
      textCol: String, idCol: String, shingleSize: Int = 3,
      numHashes: Int = 32, bands: Int = 8): Unit = {
    val (exact, rows) = indexRows(accepted, textCol, idCol, shingleSize)
    val r = rows.persist()
    appendTo(store, s"${prefix}_exact", exact)
    appendTo(store, s"${prefix}_shingles", r)
    appendTo(store, s"${prefix}_bands",
      Dedup.portableBandRows(r, numHashes, bands).toDF("cid", "band", "bsig"))
    r.unpersist(false)
  }

  private def appendTo(store: Store, table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(store.path(table))
}
