package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The round-18 runtime skew advisory: the plain/chunked operator pairs
  * warn — loudly, with the scale-safe sibling named — when the key
  * histogram says the plain form is about to funnel one key through one
  * task. Purely advisory: results bit-identical either way. */
class HotKeyAdvisorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // 9 of 12 events on user 7 (share 0.75 > the 0.5 advisory)
  private def skewed = (1 to 12).map(i =>
      (i.toLong, if (i <= 9) 7L else i.toLong, ts(f"2024-01-01 00:$i%02d:00")))
    .toDF("event_id", "user_id", "ts")
    .withColumn("ts", org.apache.spark.sql.functions.col("ts")
      .cast("timestamp_ntz"))

  private def captured(body: => Unit): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true))(body)
    out.toString
  }

  test("advisory thresholds are the documented defaults") {
    assert(HotKeyAdvisor.DefaultWarnShare == 0.5)
    assert(HotKeyAdvisor.DefaultWarnMinRows == 100000L)
  }

  test("the probe memoizes per (plan, keys): a repeated invocation " +
      "pays no second aggregate and warns once") {
    sys.props("graft.skew.warnMinRows") = "1"
    try {
      val first = captured {
        HotKeyAdvisor.advise(skewed, Seq("user_id"), "memo.site", "x")
          .collect()
      }
      val second = captured {
        HotKeyAdvisor.advise(skewed, Seq("user_id"), "memo.site", "x")
          .collect()
      }
      assert(first.contains("WARN memo.site"), first)
      assert(!second.contains("WARN"), second)
    } finally sys.props.remove("graft.skew.warnMinRows")
  }

  test("warn fires past the share threshold, names the sibling, and " +
      "results are bit-identical; uniform keys stay silent; the row " +
      "floor keeps small corpora silent by default") {
    // floor lowered: the 12-row fixture is probed
    sys.props("graft.skew.warnMinRows") = "1"
    val (warnedRows, log) = try {
      var rows: Seq[Seq[Any]] = null
      val log = captured {
        rows = OlapOps.sessionizeEvents(skewed)
          .orderBy("user_id", "session_id")
          .collect().map(_.toSeq).toSeq
      }
      (rows, log)
    } finally sys.props.remove("graft.skew.warnMinRows")
    assert(log.contains("WARN OlapOps.sessionize"), log)
    assert(log.contains("sessionizeChunkedEvents"), log)
    assert(log.contains("75.0%"), log)

    // advisory disabled -> silent, output unchanged (bit-identical)
    sys.props("graft.skew.warnShare") = "0"
    val (plainRows, silent) = try {
      var rows: Seq[Seq[Any]] = null
      val log = captured {
        rows = OlapOps.sessionizeEvents(skewed)
          .orderBy("user_id", "session_id")
          .collect().map(_.toSeq).toSeq
      }
      (rows, log)
    } finally sys.props.remove("graft.skew.warnShare")
    assert(!silent.contains("WARN"), silent)
    assert(warnedRows == plainRows)

    // uniform keys (12 users, one event each): probed, but silent
    sys.props("graft.skew.warnMinRows") = "1"
    val uniformLog = try captured {
      OlapOps.sessionizeEvents(skewed
          .withColumn("user_id",
            org.apache.spark.sql.functions.col("event_id")))
        .collect()
    } finally sys.props.remove("graft.skew.warnMinRows")
    assert(!uniformLog.contains("WARN"), uniformLog)

    // default 100k floor: the skewed fixture is far below it -> silent
    val floored = captured { OlapOps.sessionizeEvents(skewed).collect() }
    assert(!floored.contains("WARN"), floored)
  }

  test("every plain form of a mitigated pair carries the advisory " +
      "(the discoverability seam itself, pinned per site)") {
    sys.props("graft.skew.warnMinRows") = "1"
    // en holds ~39% of sf0.001 docs — drop the share knob under that so
    // the lang-keyed sites fire (which also pins the knob itself)
    sys.props("graft.skew.warnShare") = "0.3"
    try {
      val dir = "/root/testdata/sf0.001"
      val packLog = captured { CurateOps.packSequences(spark, dir).collect() }
      assert(packLog.contains("WARN CurateOps.packSequences")
        && packLog.contains("packSequencesChunked"), packLog)
      val qfLog = captured { CurateOps.qualityFilter(spark, dir).collect() }
      assert(qfLog.contains("WARN CurateOps.qualityFilter")
        && qfLog.contains("qualityFilterRank"), qfLog)
      // user-keyed sites fire on the skewed fixture
      val frameLog = captured {
        OlapOps.windowRangeFramePlainEvents(
          skewed.withColumn("value",
            org.apache.spark.sql.functions.lit(1.0))).collect()
      }
      assert(frameLog.contains("WARN OlapOps.windowRangeFramePlain")
        && frameLog.contains("prefix-difference"), frameLog)
      // sf0.001 events are uniform by user: probed, silent — the plain
      // form stays warn-free exactly when it is safe
      val packEvLog = captured { ExtraOps.nestedPack(spark, dir).collect() }
      assert(!packEvLog.contains("WARN"), packEvLog)
    } finally {
      sys.props.remove("graft.skew.warnMinRows")
      sys.props.remove("graft.skew.warnShare")
    }
  }
}
