package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PSL registered-domain extraction: ccTLD second-level suffixes,
  * longest-match, wildcard/exception rules, fallback, suffix-only
  * hosts, dot-less hosts, ports — on both the broadcast-join seam and
  * the literal column form, which must agree. */
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
    "localhost" -> "localhost", // dot-less unmatched → itself
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

  test("wildcard and exception rules follow the PSL algorithm") {
    // publicsuffix.org's canonical example set: plain ck-free, one
    // wildcard, one exception; plus a wildcard whose base is ALSO a
    // plain rule (kobe.jp-style) to pin precedence-by-length.
    val rules = Seq("com", "*.ck", "!www.ck", "jp", "kobe.jp", "*.kobe.jp",
      "!city.kobe.jp").toDF("suffix")
    val wantByHost = Seq(
      "ck" -> "ck",                       // no match (wildcard needs a label)
      "foo.ck" -> "foo.ck",               // foo.ck IS a public suffix → itself
      "bar.foo.ck" -> "bar.foo.ck",       // suffix foo.ck + one label
      "deep.bar.foo.ck" -> "bar.foo.ck",
      "www.ck" -> "www.ck",               // exception: registrable
      "sub.www.ck" -> "www.ck",
      "kobe.jp" -> "kobe.jp",             // plain rule kobe.jp → itself
      "x.kobe.jp" -> "x.kobe.jp",         // wildcard beats shorter plain
      "y.x.kobe.jp" -> "y.x.kobe.jp",     // suffix x.kobe.jp + one label
      "z.y.x.kobe.jp" -> "y.x.kobe.jp",
      "city.kobe.jp" -> "city.kobe.jp",   // exception: registrable
      "z.city.kobe.jp" -> "city.kobe.jp",
      "example.com" -> "example.com")
    val df = wantByHost.map(_._1).toDF("host")
    val got = PublicSuffix.withRegisteredDomain(df, "host", "domain",
        suffixes = Some(rules))
      .select("host", "domain").as[(String, String)].collect().toMap
    wantByHost.foreach { case (h, want) =>
      assert(got(h) == want, s"host $h: got ${got(h)}, want $want")
    }
  }

  test("full-PSL-sized suffix table (~9k rules) resolves correctly") {
    // Synthetic full-scale PSL: 9000 plain two-label rules + the builtin
    // + a wildcard/exception pair, exercising the broadcast path at the
    // real list's size and the dedup of repeated rules.
    val bulk = (0 until 9000).map(i => s"r$i.zz")
    val rules = (bulk ++ bulk.take(100) /* dupes must not multiply rows */
      ++ PublicSuffix.builtin ++ Seq("*.ck", "!www.ck")).toDF("suffix")
    val hosts = Seq("a.r7777.zz", "r7777.zz", "b.a.r42.zz", "www.bbc.co.uk",
      "x.ck", "www.ck", "plain.zz")
    val df = hosts.toDF("host")
    val out = PublicSuffix.withRegisteredDomain(df, "host", "domain",
      suffixes = Some(rules))
    assert(out.count() == hosts.size) // duplicate rules don't fan out
    val got = out.select("host", "domain").as[(String, String)]
      .collect().toMap
    assert(got("a.r7777.zz") == "a.r7777.zz")
    assert(got("r7777.zz") == "r7777.zz")
    assert(got("b.a.r42.zz") == "a.r42.zz")
    assert(got("www.bbc.co.uk") == "bbc.co.uk")
    assert(got("x.ck") == "x.ck")
    assert(got("www.ck") == "www.ck")
    assert(got("plain.zz") == "plain.zz") // zz itself is not a rule → last-two
  }

  test("the seam never shuffles: PSL matching is one map-side project") {
    // The rule table is driver-bounded by the PSL contract, so it
    // compiles to InSet predicates: no join, no exchange of ANY kind.
    val df = cases.map(_._1).toDF("host")
    val out = PublicSuffix.withRegisteredDomain(df, "host", "domain")
    out.collect() // AQE finalizes the plan on execution
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
    // the full-PSL-scale rule set must also stay map-side
    val big = (0 until 9000).map(i => s"r$i.zz") ++ PublicSuffix.builtin
    val out2 = PublicSuffix.withRegisteredDomain(df, "host", "domain",
      suffixes = Some(big.toDF("suffix")))
    out2.collect()
    val plan2 = out2.queryExecution.executedPlan.toString
    assert(!plan2.contains("Join") && !plan2.contains("Exchange"), plan2)
  }
}
