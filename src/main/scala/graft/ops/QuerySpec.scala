package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checkable operator from SURVEY.md §2.
  *
  * `fn` is the Spark-native implementation; `oracle` is equivalent SQL the
  * driver runs in DuckDB over the same parquet tables. Queries without an
  * oracle (non-SQL-expressible ops) get a weaker rows-only check.
  *
  * Conventions that keep the differential check deterministic:
  *  - float aggregates go through exact DECIMAL sums, cast to double last;
  *  - every rank/top-k has a total tie-break (unique id last);
  *  - output column names match the oracle's aliases exactly.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    survey: String)
