package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the 5-way star join (J1) with broadcast dims + exact decimal revenue. */
  def entry(spark: SparkSession): DataFrame =
    ops.RelationalOps.join5Way(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.specs.map(s => s.name -> s.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (engine-native hashing / LSH), which get a rows-only check. */
  def oracleSql: Map[String, String] =
    Registry.specs.flatMap(s => s.oracle.map(o => s.name -> o)).toMap
}
