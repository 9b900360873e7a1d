package graft.pipeline

/** Local-filesystem helpers shared by the Store, the streaming fixtures,
  * and batch-file writers. */
object FsUtils {

  /** Recursive delete, null-safe: `listFiles()` returns null on an
    * unreadable dir or one deleted mid-walk. */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }

  /** Idempotent per-batch file publication: write `df` into a HIDDEN
    * staging dir inside `destDir` (dot-prefixed — Spark's file listing
    * ignores it), purge any `batch_<tag>_*` files left by a previous
    * attempt of the same batch, then move the parts in under
    * deterministic names. Replaying a batch republishes the same file
    * set instead of appending duplicates — the foreachBatch
    * exactly-once-effects pattern without a transaction log. */
  def publishBatch(df: org.apache.spark.sql.DataFrame, destDir: String,
      tag: String): Unit = {
    val dest = new java.io.File(destDir)
    dest.mkdirs()
    val stage = new java.io.File(dest, s".staging_batch_$tag")
    df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(stage.getPath)
    clearBatch(destDir, tag)
    Option(stage.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).zipWithIndex
      .foreach { case (part, i) =>
        java.nio.file.Files.move(part.toPath,
          new java.io.File(dest, s"batch_${tag}_p$i.parquet").toPath)
      }
    deleteRecursively(stage)
  }

  /** Remove every file a previous attempt of batch `tag` published. */
  def clearBatch(destDir: String, tag: String): Unit =
    Option(new java.io.File(destDir).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.startsWith(s"batch_${tag}_"))
      .foreach(deleteRecursively)
}
