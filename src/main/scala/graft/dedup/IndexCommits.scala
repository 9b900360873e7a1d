package graft.dedup

import graft.pipeline.Store

/** Per-batch-tag cross-table commit markers shared by the persisted
  * index families ([[CorpusIndex]], [[EmbeddingIndex]],
  * [[graft.similarity.EditJoin]]): an append
  * publishes its N tables sequentially, so a crash between publications
  * would otherwise leave a silently partial batch. The marker — an empty
  * file named by the tag under `<prefix>_commits/` — is written AFTER
  * the last table publish and validated before every assign; the fix for
  * a missing marker is the replay contract itself (clearBatch + append
  * with the SAME tag). */
private[graft] object IndexCommits {

  def dir(store: Store, prefix: String): java.io.File =
    new java.io.File(store.path(s"${prefix}_commits"))

  /** The commit point of an append — call after the LAST table publish. */
  def mark(store: Store, prefix: String, batchTag: String): Unit = {
    val d = dir(store, prefix)
    d.mkdirs()
    java.nio.file.Files.write(new java.io.File(d, batchTag).toPath,
      Array.empty[Byte])
    ()
  }

  /** Invalidate a tag — call BEFORE purging its files, so no purge
    * ordering can present a partial batch as committed. */
  def unmark(store: Store, prefix: String, batchTag: String): Unit = {
    new java.io.File(dir(store, prefix), batchTag).delete()
    ()
  }

  def committedTags(store: Store, prefix: String): Set[String] =
    Option(dir(store, prefix).listFiles()).getOrElse(Array.empty)
      .map(_.getName).toSet

  /** Every batch tag with files present in any of the index tables must
    * carry a commit marker; one without crashed mid-append. */
  def validate(store: Store, prefix: String, suffixes: Seq[String]): Unit = {
    val tagRe = "^batch_(.+)_p\\d+\\.parquet$".r
    val present = suffixes.flatMap { sfx =>
      Option(new java.io.File(store.path(s"$prefix$sfx")).listFiles())
        .getOrElse(Array.empty)
        .flatMap(f => tagRe.findFirstMatchIn(f.getName).map(_.group(1)))
    }.toSet
    val partial = present.diff(committedTags(store, prefix))
    require(partial.isEmpty,
      s"index '$prefix' has uncommitted append batch(es) " +
        s"${partial.mkString(", ")} — an append crashed between table " +
        "publications. Retry with the SAME batchTag (clearBatch + append," +
        " as a streaming replay does) or clearBatch to drop the batch.")
  }

  /** Retire markers for tags whose batch files a compaction consumed. */
  def retireExcept(store: Store, prefix: String,
      excludeTags: Set[String]): Unit =
    Option(dir(store, prefix).listFiles()).getOrElse(Array.empty)
      .filter(f => !excludeTags.contains(f.getName))
      .foreach(_.delete())
}
