package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate (rollup) maintenance — the 100 TB answer to
  * "keep a per-key summary current without rescanning the corpus":
  * store the aggregate in its PARTIAL (monoid) form — additive columns
  * like counts and sums that merge by `+` — and fold each new batch's
  * delta in with one union + re-aggregate over (stored state ∪ delta
  * partials). The full table is never re-read; each maintenance tick
  * costs O(delta) + O(|state|), and the merge is exactly Spark's own
  * partial→final aggregation contract lifted to storage (the same
  * reason map-side combine is correct). Non-additive finals (avg, rate)
  * are DERIVED from the stored partials at read time, never stored.
  *
  * Pairs with [[Store.readSince]]: a maintainer checkpointed at tag A
  * reads the (A, B] delta, partial-aggregates it, and merges — the
  * incremental-view-maintenance loop of a batch-published lakehouse
  * table.
  */
object Rollup {

  /** Merge partial-aggregate frames by key: every non-key column must be
    * additive (counts, sums — longs or decimals; decimal sums merge
    * exactly, the repo's float-aggregate convention). Works for state ∪
    * one delta or any number of partial frames unioned upstream. */
  def merge(partials: DataFrame, keys: Seq[String]): DataFrame = {
    val addCols = partials.columns.filterNot(keys.contains)
    // cast each sum back to its input type: sum() widens (long→long but
    // decimal(p,s)→decimal(p+10,s)), and a drifting schema would break
    // the next tick's fixed-schema store read
    val types = partials.schema.fields.map(f => f.name -> f.dataType).toMap
    def summed(c: String): Column = sum(col(c)).cast(types(c)).as(c)
    partials.groupBy(keys.map(col): _*)
      .agg(summed(addCols.head), addCols.tail.map(summed): _*)
  }

  /** One maintenance tick against a Store: read the rollup table (empty
    * on bootstrap), merge the delta's partials, write back. The write
    * goes through [[Store.write]]'s staged replace, so a reader never
    * sees a half-merged state. */
  def applyDelta(store: Store, table: String, delta: DataFrame,
      keys: Seq[String]): DataFrame = {
    val merged = merge(store.read(table, delta.schema).unionByName(delta),
      keys)
    store.write(table, merged)
    store.read(table, delta.schema)
  }
}
