package graft.dedup

import java.util.concurrent.TimeUnit

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.Store

/** The Future/Await wave pattern behind [[Dedup.incrementalNearDup]] /
  * [[Dedup.assignAgainstIndexes]] runs independent materializations as
  * CONCURRENT driver jobs. This spec covers the concurrency contract
  * the differential gates can't: a failure inside one wave job
  * propagates promptly (no deadlock, session stays usable), concurrent
  * invocations don't interfere, and the read-only indexed path stays
  * read-only under contention. */
class WaveConcurrencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (10L, "alpha beta gamma delta epsilon zeta eta theta"),
    (11L, "one two three four five six seven eight nine ten"),
    (12L, "spark catalyst tungsten codegen adaptive execution engine"))
    .toDF("doc_id", "text")

  private val batchA = Seq(
    (20L, "one two three four five six seven eight nine ten"),
    (21L, "totally novel content about persisted banded indexes here"))
    .toDF("doc_id", "text")

  private val batchB = Seq(
    (30L, "alpha beta gamma delta epsilon zeta eta theta"),
    (31L, "another unrelated novel document with different words entirely"),
    (32L, "another unrelated novel document with different words entirely"))
    .toDF("doc_id", "text")

  private def assignMap(df: DataFrame): Map[Long, (Long, String)] =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap

  test("failure injection: an exception inside one wave job propagates " +
      "to the caller without deadlocking the sibling wave") {
    // poison the BATCH text so wave 1's shingle job throws at execution
    // (raise_error is non-foldable: it detonates on the executor, the
    // shape a corrupt input file produces)
    val poisoned = batchA.withColumn("text",
      expr("CASE WHEN length(text) >= 0 " +
        "THEN CAST(raise_error('wave poison') AS STRING) ELSE text END"))
    val t0 = System.nanoTime()
    val ex = intercept[Exception] {
      Dedup.incrementalNearDup(corpus, poisoned, "text", "doc_id")
        .collect()
    }
    val elapsedSec = TimeUnit.NANOSECONDS.toSeconds(System.nanoTime() - t0)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("wave poison")), ex.getMessage)
    // Await.result would hang forever if the failing future never
    // completed; generous bound just pins "propagates, not deadlocks"
    assert(elapsedSec < 120, s"took ${elapsedSec}s — wave likely hung")

    // the session survives the failed wave: a clean run still works
    val clean = assignMap(
      Dedup.incrementalNearDup(corpus, batchA, "text", "doc_id"))
    assert(clean(20L) == ((11L, "exact")))
    assert(clean(21L) == ((21L, "novel")))
  }

  test("failure injection on the CORPUS side (the concurrent index-build " +
      "futures) also propagates") {
    val poisoned = corpus.withColumn("text",
      expr("CASE WHEN length(text) >= 0 " +
        "THEN CAST(raise_error('corpus poison') AS STRING) ELSE text END"))
    val ex = intercept[Exception] {
      Dedup.incrementalNearDup(poisoned, batchA, "text", "doc_id").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("corpus poison")), ex.getMessage)
  }

  test("re-entrancy: concurrent invocations produce the same assignments " +
      "as serial runs") {
    val serialA = assignMap(
      Dedup.incrementalNearDup(corpus, batchA, "text", "doc_id"))
    val serialB = assignMap(
      Dedup.incrementalNearDup(corpus, batchB, "text", "doc_id"))

    val fA = Future(assignMap(
      Dedup.incrementalNearDup(corpus, batchA, "text", "doc_id")))
    val fB = Future(assignMap(
      Dedup.incrementalNearDup(corpus, batchB, "text", "doc_id")))
    assert(Await.result(fA, Duration.Inf) == serialA)
    assert(Await.result(fB, Duration.Inf) == serialB)
    // sanity on the fixture: batch B exercises exact + novel + dup-of-novel
    assert(serialB(30L) == ((10L, "exact")))
    assert(serialB(31L)._2 == "novel")
    assert(serialB(32L)._1 == serialB(31L)._1) // same batch-local group
  }

  test("contention on the indexed path: concurrent assigns against one " +
      "built index agree with serial and never write to the store") {
    val base = s"/tmp/graft_ss/p${ProcessHandle.current().pid}/" +
      s"wave_spec_${System.nanoTime()}"
    val st = new Store(spark, base)
    CorpusIndex.build(st, "c", corpus, "text", "doc_id")

    def snapshot(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(base))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val serial = assignMap(
      CorpusIndex.assign(st, "c", batchA, "text", "doc_id"))
    val before = snapshot()

    val fs = (1 to 4).map { _ =>
      Future(assignMap(CorpusIndex.assign(st, "c", batchA, "text", "doc_id")))
    }
    fs.foreach(f => assert(Await.result(f, Duration.Inf) == serial))
    // assign is a pure read: no files created, deleted, or rewritten —
    // contention can't double-materialize anything into the index
    assert(snapshot() == before)
  }
}
