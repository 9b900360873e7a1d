package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PSL registered-domain extraction: ccTLD second-level suffixes,
  * longest-match, fallback, suffix-only hosts, ports — on both the
  * broadcast-join seam and the literal column form, which must agree. */
class PublicSuffixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cases: Seq[(String, String)] = Seq(
    "www.bbc.co.uk" -> "bbc.co.uk", // the classic mis-bucket, fixed
    "bbc.co.uk" -> "bbc.co.uk",
    "cdn.shop.com.au" -> "shop.com.au",
    "deep.sub.example.com" -> "example.com", // gTLD: last-two still right
    "example.com" -> "example.com",
    "co.uk" -> "co.uk", // host IS a public suffix → itself
    "uk" -> "uk",
    "a.b.unknowntld" -> "b.unknowntld", // no rule → last-two fallback
    "news.en-press.co.uk" -> "en-press.co.uk", // the gate fixture shape
    "x.ac.jp" -> "x.ac.jp",
    "bbc.co.uk:8443" -> "bbc.co.uk") // port ignored for bucketing

  test("join seam resolves ccTLD suffixes with longest-match") {
    val df = cases.map(_._1).toDF("host")
    val got = PublicSuffix.withRegisteredDomain(df, "host", "domain")
      .select("host", "domain").as[(String, String)].collect().toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"host $h: got ${got(h)}, want $want")
    }
  }

  test("literal column form agrees with the join seam") {
    val df = cases.map(_._1).toDF("host")
    val viaLit = df.select(col("host"),
        PublicSuffix.registeredDomainLit(col("host")).as("domain"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (h, want) => assert(viaLit(h) == want, h) }
  }

  test("the seam never shuffles: all PSL joins are broadcast") {
    val df = cases.map(_._1).toDF("host")
    val out = PublicSuffix.withRegisteredDomain(df, "host", "domain")
    out.collect() // AQE finalizes the plan on execution
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}
