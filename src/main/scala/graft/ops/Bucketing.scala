package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time so repeated
  * fact-fact joins on the bucket key need NO exchange at read time — the
  * standing replacement for the reference's MySQL B-tree indexes on
  * natural keys (SURVEY.md §4). At 100 TB this turns every
  * `storms ⋈ observations ⋈ tracks` pipeline stage into a zipped local
  * join instead of three cluster-wide shuffles.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted table — managed, or external at
    * `path` (gates use an explicit /tmp path so no warehouse dir appears
    * in the working tree). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String], path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket keys. The `merge`
    * hint pins sort-merge: a small side must not silently degrade to a
    * broadcast join, which would pass a "no shuffle" check without
    * exercising the bucketed (pre-shuffled, pre-sorted) read path this
    * helper exists for. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right), keys)

  /** Count shuffle exchanges in a plan — 0 on a co-located join. */
  def exchangeCount(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString()
    plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
  }
}
