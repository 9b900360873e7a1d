package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC intake — the migration path for a user whose current system IS
  * the reference: tcdb's store of record is a MySQL star schema
  * (/root/reference/tcdb/models/database.py:19-24,
  * /root/reference/db/init_db_base.sql), so "can it read my existing
  * instance?" is the first question a migrating user asks. This module
  * answers it with `spark.read.jdbc` plumbing shaped for scale, tested
  * against Spark's bundled embedded Derby (the same JDBC surface;
  * production swaps the URL/driver for MySQL — no code change, the
  * DataSource is driver-agnostic).
  *
  * Scale shape: a single-connection JDBC read serializes the whole
  * table through one task; [[readPartitioned]] splits the read into
  * `numPartitions` range predicates on the AUTO_INCREMENT primary key
  * (every tcdb table has one), so N executors pull concurrently and
  * Catalyst pushes filters/column pruning into the remote SQL
  * (PushedFilters on a JDBCRelation — pinned in JdbcIntakeSpec).
  * Bounds come from one cheap min/max round-trip, not a full scan.
  */
object JdbcIntake {

  /** Partitioned JDBC table read: `numPartitions` concurrent range
    * scans over integer key `keyCol`. Falls back to a single-partition
    * read when the table is empty (no bounds to split). */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      keyCol: String, numPartitions: Int,
      props: java.util.Properties = new java.util.Properties): DataFrame = {
    // identifiers quoted per the target's dialect: Spark writes quoted
    // (case-exact) column names, and e.g. Derby uppercases unquoted ones
    val q = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
      .quoteIdentifier(keyCol)
    val bounds = spark.read.jdbc(url,
        s"(SELECT min($q) AS lo, max($q) AS hi FROM $table) b",
        props)
      .collect()(0)
    if (bounds.isNullAt(0))
      spark.read.jdbc(url, table, props)
    else
      spark.read.jdbc(url, table, keyCol,
        bounds.getAs[Number](0).longValue(),
        bounds.getAs[Number](1).longValue(),
        numPartitions, props)
  }

  /** The reference's storms star slice, intake-mapped to the EXACT
    * schema of [[graft.schema.Schemas.storms]] (the Store table a
    * migrated pipeline writes): `storms` joined to the `regions` dim
    * (region_id → the 2-letter short_name the Store keys on), MySQL
    * float columns widened to double, int ids kept. A tcdb user points
    * this at their instance and lands directly in the Store layout. */
  def stormsFromStar(spark: SparkSession, url: String,
      numPartitions: Int = 8,
      props: java.util.Properties = new java.util.Properties): DataFrame = {
    val storms = readPartitioned(spark, url, "storms", "id", numPartitions,
      props)
    val regions = spark.read.jdbc(url, "regions", props) // 6-row dim
    storms.join(broadcast(regions.select(col("id").as("region_id"),
        col("short_name").as("region"))), Seq("region_id"))
      .select(col("annual_id").cast("int"),
        col("region"),
        col("nhc_number").cast("int"),
        col("nhc_id"),
        col("season").cast("int"),
        col("start_date").cast("timestamp"),
        col("end_date").cast("timestamp"),
        col("status"),
        col("name"),
        col("start_lat").cast("double"),
        col("start_lon").cast("double"),
        col("run_id"),
        col("last_update").cast("timestamp"))
  }
}
