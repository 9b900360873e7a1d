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

  /** Morton (Z-order) key for TWO dimensions: interleaves the low
    * `bits` bits of `a` (even positions) and `b` (odd positions) into
    * one long. The classic multi-dimension clustering key (Delta/Iceberg
    * OPTIMIZE ZORDER): range layout on ONE key gives perfect pruning on
    * that key and none on any other; range layout on the Z-value gives
    * partial pruning on BOTH — each file's key box covers a small
    * rectangle of (a, b) space, so a 2-D predicate touches only the
    * files whose rectangles intersect it.
    *
    * Pure shift/mask column arithmetic (2·bits codegen'd terms), no UDF.
    * Inputs must be non-negative and pre-normalized to [0, 2^bits):
    * higher bits are MASKED, so out-of-range values alias mod 2^bits —
    * normalize (rank, bucket, clamp) first. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(
          shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Write `df` clustered by the Z-order of (`a`, `b`) into `numFiles`
    * files — [[writeRangeLayout]] on the Morton key. The key is dropped
    * before writing; it exists only to place rows. */
  def writeZOrder(df: DataFrame, path: String, numFiles: Int,
      a: Column, b: Column, bits: Int): Unit =
    df.withColumn("_z", zValue(a, b, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Distributed dense global rank 1..N over a total order, appended as
    * `rank` — the scalable substitute for an unpartitioned
    * `row_number()` window, which funnels the ENTIRE relation through
    * one task (the single worst global-sort pathology at 100 TB).
    * Standard two-pass distributed ranking: range-partition on the
    * order (parallel sort), rank locally per partition (a window
    * PARTITIONED by spark_partition_id, so every partition ranks
    * concurrently), then add per-partition row-count offsets — the
    * offset table is one row per partition, a documented meta-read, and
    * rejoins as a broadcast.
    *
    * The keyed frame is eagerly materialized first: RangePartitioner
    * draws its boundary sample with a seed keyed to RDD identity, so an
    * unmaterialized recompute between the count pass and the rank pass
    * could re-draw different boundaries mid-query. `order` columns must
    * be a TOTAL order (tie-break to a unique key) or ranks within ties
    * are partition-placement-dependent. */
  def globalRank(df: DataFrame, partitions: Int, order: Column*): DataFrame = {
    val keyed = df.repartitionByRange(partitions, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val cs = keyed.groupBy("pid").agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offs = cs.map(_._2).scanLeft(0L)(_ + _)
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = cs.map(_._1).zip(offs).toSeq.toDF("pid", "off")
    keyed
      .withColumn("lr", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("pid")).orderBy(order: _*)))
      .join(broadcast(offDf), Seq("pid"))
      .withColumn("rank", col("off") + col("lr"))
      .drop("pid", "lr", "off")
  }
}
