package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Parquet-backed table store for the pipeline outputs.
  *
  * Layout: `<root>/<table>/` parquet, partitioned by (region, season)
  * where present — the columnar analog of the reference's
  * `atcf/{basin}/{deck}/{year}` directory scheme
  * (tcdb/pipeline/adeck.py:141), giving dynamic partition pruning on the
  * two predicates every query starts with.
  */
final class Store(spark: SparkSession, root: String) {

  def path(table: String): String = s"$root/$table"

  def exists(table: String): Boolean =
    new java.io.File(path(table)).exists()

  /** Read with the EXPLICIT schema: skips footer inference (a real cost
    * at many-file scale) and — critically — stays well-defined when a
    * previous MERGE legitimately wrote an EMPTY table (a partitioned
    * empty write leaves no data files; inference would throw
    * UNABLE_TO_INFER_SCHEMA on the next micro-batch's read-modify-write).
    * Extra partition columns some callers append (e.g. season on the
    * ref-track steps) are still discovered and appended by Spark. */
  def read(table: String, schema: StructType): DataFrame =
    if (exists(table)) spark.read.schema(schema).parquet(path(table))
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Full-table replace (read-modify-write MERGE target). The frame is
    * materialized to a staging dir first — Spark cannot overwrite a
    * parquet dir it is concurrently reading. */
  def write(table: String, df: DataFrame): Unit =
    writeStaged(table, df, Map.empty)

  private def writeStaged(table: String, df: DataFrame,
      options: Map[String, String]): Unit = {
    val stage = s"$root/.staging_$table"
    val partCols = Seq("region", "season").filter(df.columns.contains)
    val writer = df.write.mode(SaveMode.Overwrite).options(options)
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .parquet(stage)
    val target = new java.io.File(path(table))
    if (target.exists()) FsUtils.deleteRecursively(target)
    new java.io.File(stage).renameTo(target)
  }

  /** Parquet data files currently backing the table — the quantity
    * compaction exists to manage (each file at read time is a task, a
    * footer parse, and an open; thousands of small ones per directory is
    * the classic incremental-ingest pathology). */
  def dataFileCount(table: String): Int = {
    def walk(f: java.io.File): Int =
      // listFiles() is null on an unreadable dir or one deleted mid-walk
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(path(table)))
  }

  /** Small-file compaction: rewrite the table with each (region, season)
    * directory routed to ONE task — every replace through [[write]] can
    * leave up to `spark.sql.shuffle.partitions` files per directory, and
    * a long-running incremental pipeline accumulates the read-side cost.
    * Oversized partitions still split at `maxRecordsPerFile` (the
    * size-capped planning an OPTIMIZE job does); unpartitioned tables
    * plan round-robin by total row count. Data is untouched by
    * construction — same rows, same schema, fewer files. */
  def compact(table: String, schema: StructType,
      maxRecordsPerFile: Long = 4L * 1024 * 1024): Unit = {
    // a maintenance op must not manufacture tables: read() deliberately
    // returns an empty frame for missing tables (MERGE bootstrap), which
    // here would silently create one from a typo
    require(exists(table), s"cannot compact missing table '$table'")
    val df = read(table, schema)
    val partCols = Seq("region", "season").filter(df.columns.contains)
    val planned =
      if (partCols.nonEmpty)
        df.repartition(partCols.map(org.apache.spark.sql.functions.col): _*)
      else {
        val nFiles = math.max(1L,
          (df.count() + maxRecordsPerFile - 1) / maxRecordsPerFile)
        df.repartition(nFiles.toInt)
      }
    writeStaged(table, planned,
      Map("maxRecordsPerFile" -> maxRecordsPerFile.toString))
  }
}
