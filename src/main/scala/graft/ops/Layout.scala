package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout helpers for scan pruning at scale (SURVEY.md §2.1 S8
  * complement to Store's region/season directory partitioning).
  *
  * Directory partitioning prunes on LOW-cardinality keys; for a
  * high-cardinality ordering key (event time, document id) the lever is
  * RANGE LAYOUT: `repartitionByRange` + `sortWithinPartitions` gives
  * each output file a DISJOINT key slice, so min/max statistics (parquet
  * row-group pushdown here; file-level skipping in stats-indexed table
  * formats) eliminate everything outside a range predicate. At 100 TB
  * this is the difference between scanning a day and scanning a decade.
  */
object Layout {

  /** Write `df` range-laid-out on `keys` into `numFiles` files. */
  def writeRangeLayout(df: DataFrame, path: String, numFiles: Int,
      keys: Column*): Unit =
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)

  /** Per-file (min, max) of `key` over a written table — the skip-index
    * view a stats-aware scanner sees. Disjointness of these slices is
    * exactly what makes a range predicate prune. */
  def fileRanges(df: DataFrame, key: Column): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(key).as("lo"), max(key).as("hi"))
}
