package graft.merge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch MERGE (upsert) engine — the Spark-native replacement for the
  * reference's row-at-a-time `one_or_none` insert/update workhorse
  * (tcdb/etl/atcf_forecasts.py:75-135, tcdb/models/base.py:50-80).
  *
  * Instead of N database round-trips, one shuffle-join per batch:
  * `existing FULL OUTER JOIN incoming ON natural key`, with incoming
  * winning per-column where present. Scales: both sides hash-partition on
  * the natural key; no driver-side loops; at 100 TB the join co-locates by
  * key and AQE handles skew.
  */
object Merge {

  /** Upsert `incoming` into `existing` on natural-key columns `keys`.
    *
    * Both frames must share the same schema. `monotonicCol` implements the
    * reference's old-file guard (tcdb/etl/process_storms.py:136-139):
    * an update is rejected when it would move that column backwards.
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
      monotonicCol: Option[String] = None): DataFrame = {
    require(existing.columns.sorted.sameElements(incoming.columns.sorted),
      s"schema mismatch: ${existing.columns.mkString(",")} vs ${incoming.columns.mkString(",")}")
    val dataCols = existing.columns.filterNot(keys.contains).toSeq
    val ex = existing.withColumn("__ex_present", lit(true))
    val inc = incoming.columns.foldLeft(incoming)((df, c) =>
        df.withColumnRenamed(c, s"__inc_$c"))
      .withColumn("__inc_present", lit(true))
    // NULL-SAFE key equality: a NULL key component is a key VALUE — the
    // reference's one_or_none natural-key lookup compiles to `col IS
    // NULL` and matches (atcf_forecasts.py:75-135) — so a replayed batch
    // must UPDATE such rows, not insert duplicates (T5 idempotence for
    // nullable key columns like steps.hour on negative lead times).
    // Row presence comes from explicit marker columns, since with
    // null-safe matching no key column can distinguish a missing side.
    val joinCond = keys.map(k => ex(k) <=> inc(s"__inc_$k")).reduce(_ && _)
    val joined = ex.join(inc, joinCond, "full_outer")

    val hasIncoming = coalesce(col("__inc_present"), lit(false))
    val hasExisting = coalesce(col("__ex_present"), lit(false))
    // Guard only applies when both sides are present; inserts always pass.
    // NULL semantics: an EXISTING null guard value is no baseline to
    // regress, so the update is accepted (otherwise a row that first
    // landed undated could never be corrected); an INCOMING null compared
    // against a non-null existing value rejects, like `incoming.m >=
    // existing.m` in a WHERE/CASE — never wipe a dated value with an
    // undated one.
    val guard: Column = monotonicCol
      .map(m => !hasExisting || col(m).isNull || col(s"__inc_$m") >= col(m))
      .getOrElse(lit(true))
    val takeIncoming = hasIncoming && coalesce(guard, lit(false))

    val keyCols = keys.map(k => coalesce(col(k), col(s"__inc_$k")).as(k))
    val valCols = dataCols.map(c =>
      when(takeIncoming, col(s"__inc_$c")).otherwise(col(c)).as(c))
    joined.select((keyCols ++ valCols): _*)
      .select(existing.columns.map(col).toIndexedSeq: _*)
  }

  /** Per-action counters the reference logs after each run
    * (tcdb/etl/atcf_forecasts.py:137-141): inserted / updated / unchanged.
    */
  def mergeStats(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame = {
    val dataCols = existing.columns.filterNot(keys.contains).toSeq
    val ex = existing.withColumn("__ex_present", lit(true))
    val inc = incoming.columns.foldLeft(incoming)((df, c) =>
        df.withColumnRenamed(c, s"__inc_$c"))
      .withColumn("__inc_present", lit(true))
    // null-safe keys + presence markers, mirroring [[upsert]]
    val joinCond = keys.map(k => ex(k) <=> inc(s"__inc_$k")).reduce(_ && _)
    val joined = ex.join(inc, joinCond, "full_outer")
    val changed = dataCols
      .map(c => !(col(c) <=> col(s"__inc_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined.select(
      when(col("__ex_present").isNull, "inserted")
        .when(col("__inc_present").isNull, "untouched")
        .when(changed, "updated")
        .otherwise("unchanged").as("action"))
      .groupBy("action").agg(count(lit(1)).as("n"))
  }

  /** Cascading delete (tcdb/pipeline/routines.py:33-63): remove rows of
    * `child` whose FK matches a deleted parent key — a broadcast anti-join.
    */
  def cascadeDelete(child: DataFrame, deletedParents: DataFrame,
      childFk: String, parentKey: String): DataFrame =
    child.join(broadcast(deletedParents.select(col(parentKey).as(childFk)).distinct()),
      Seq(childFk), "left_anti")
}
