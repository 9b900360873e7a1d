package graft.merge

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tbl(rows: (Long, String, Double)*) =
    rows.toDF("k", "s", "v")

  test("upsert inserts new keys and updates matched ones") {
    val existing = tbl((1L, "a", 1.0), (2L, "b", 2.0))
    val incoming = tbl((2L, "B", 20.0), (3L, "c", 3.0))
    val out = Merge.upsert(existing, incoming, Seq("k"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      == Seq((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0)))
  }

  test("upsert is idempotent: same batch twice == once (T5)") {
    val existing = tbl((1L, "a", 1.0), (2L, "b", 2.0))
    val incoming = tbl((2L, "B", 20.0), (3L, "c", 3.0))
    val once  = Merge.upsert(existing, incoming, Seq("k"))
    val twice = Merge.upsert(once, incoming, Seq("k"))
    assert(once.orderBy("k").collect().toSeq
      == twice.orderBy("k").collect().toSeq)
  }

  test("monotonic guard rejects regressions but allows inserts (T6)") {
    val existing = tbl((1L, "a", 10.0))
    val incoming = tbl((1L, "x", 5.0), (2L, "n", 1.0))
    val out = Merge.upsert(existing, incoming, Seq("k"), Some("v"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      == Seq((1L, "a", 10.0), (2L, "n", 1.0)))
  }

  test("monotonic guard NULL semantics: null existing accepts, null incoming rejects") {
    val existing = Seq((1L, "a", Option.empty[Double]), (2L, "b", Some(10.0)))
      .toDF("k", "s", "v")
    val incoming = Seq((1L, "X", Some(5.0)), (2L, "Y", Option.empty[Double]))
      .toDF("k", "s", "v")
    val out = Merge.upsert(existing, incoming, Seq("k"), Some("v"))
      .orderBy("k").collect()
    // k=1: existing v NULL = no baseline to regress -> update lands
    assert(out(0).getString(1) == "X" && out(0).getDouble(2) == 5.0)
    // k=2: incoming v NULL vs dated existing -> rejected, row untouched
    assert(out(1).getString(1) == "b" && out(1).getDouble(2) == 10.0)
  }

  test("mergeStats counts inserted/updated/unchanged (A14)") {
    val existing = tbl((1L, "a", 1.0), (2L, "b", 2.0), (4L, "d", 4.0))
    val incoming = tbl((1L, "a", 1.0), (2L, "B", 2.0), (3L, "c", 3.0))
    val stats = Merge.mergeStats(existing, incoming, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("unchanged" -> 1L, "updated" -> 1L,
      "inserted" -> 1L, "untouched" -> 1L))
  }

  test("cascadeDelete removes children of deleted parents (S12)") {
    val child = tbl((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
    val deleted = Seq(2L, 3L).toDF("pk")
    val out = Merge.cascadeDelete(child, deleted, "k", "pk").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("property: upsert of random batches is idempotent (seeded)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 10) {
      def batch(tag: String) = (1 to rnd.nextInt(20))
        .map(_ => (rnd.nextInt(15).toLong, tag, rnd.nextInt(100).toDouble))
        .distinctBy(_._1).toDF("k", "s", "v")
      val existing = batch("e")
      val incoming = batch("i")
      val once = Merge.upsert(existing, incoming, Seq("k"))
      val twice = Merge.upsert(once, incoming, Seq("k"))
      assert(once.orderBy("k").collect().toSeq
        == twice.orderBy("k").collect().toSeq)
    }
  }
}
