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
  def write(table: String, df: DataFrame): Unit = {
    val stage = s"$root/.staging_$table"
    val partCols = Seq("region", "season").filter(df.columns.contains)
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .parquet(stage)
    val target = new java.io.File(path(table))
    if (target.exists()) {
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(del)
        f.delete()
      }
      del(target)
    }
    new java.io.File(stage).renameTo(target)
  }
}
