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

  test("canonical publicsuffix.org checkPublicSuffix vectors " +
      "(transcribed), against the official rules they exercise") {
    // The checkPublicSuffix test data published with the PSL
    // (publicsuffix.org/list — the test file dedicates any copyright to
    // the public domain), transcribed: every vector class is here —
    // null input, mixed case, leading dots, unlisted TLDs, 1-rule and
    // 2-level TLDs, wildcard-only TLDs (*.mm), the kyoto/kobe.jp
    // complex block, wildcard+exception (ck), US K12, and the IDN block
    // in BOTH unicode and punycode forms. The rule set below is the
    // subset of the official list those vectors exercise (including the
    // unicode AND punycode spellings of the cn/中国 rules:
    // registeredDomain does string-level matching by design — IDN
    // encoding conversion is the caller's canonicalization step, so the
    // rule table must carry the encodings the hosts use).
    //
    // Convention translation, documented in the Scaladoc: where the
    // official function returns NULL for a structurally VALID host
    // because the host IS a public suffix (or a lone unlisted label, an
    // implicit-* suffix), this extractor returns the lowercased host
    // itself — a bucketing key must not collapse every suffix-host into
    // one null bucket. Official nulls for INVALID hosts (null, leading
    // dot) stay null here.
    val rules = Seq(
      "ac", "biz", "com", "uk.com", "*.mm",
      "jp", "ac.jp", "kyoto.jp", "ide.kyoto.jp", "*.kobe.jp",
      "!city.kobe.jp", "*.ck", "!www.ck",
      "us", "ak.us", "k12.ak.us",
      "cn", "com.cn", "公司.cn", "中国",
      "xn--55qx5d.cn", "xn--fiqs8s").toDF("suffix")
    // (host, official checkPublicSuffix expectation)
    val vectors: Seq[(String, Option[String])] = Seq(
      // null input handled separately below
      // Mixed case
      "COM" -> None,
      "example.COM" -> Some("example.com"),
      "WwW.example.COM" -> Some("example.com"),
      // Leading dot (invalid)
      ".com" -> None, ".example" -> None, ".example.com" -> None,
      ".example.example" -> None,
      // Unlisted TLD (implicit * rule)
      "example" -> None,
      "example.example" -> Some("example.example"),
      "b.example.example" -> Some("example.example"),
      "a.b.example.example" -> Some("example.example"),
      // TLD with only 1 rule
      "biz" -> None,
      "domain.biz" -> Some("domain.biz"),
      "b.domain.biz" -> Some("domain.biz"),
      "a.b.domain.biz" -> Some("domain.biz"),
      // TLD with some 2-level rules
      "com" -> None,
      "example.com" -> Some("example.com"),
      "b.example.com" -> Some("example.com"),
      "a.b.example.com" -> Some("example.com"),
      "uk.com" -> None,
      "example.uk.com" -> Some("example.uk.com"),
      "b.example.uk.com" -> Some("example.uk.com"),
      "a.b.example.uk.com" -> Some("example.uk.com"),
      "test.ac" -> Some("test.ac"),
      // TLD with only 1 (wildcard) rule
      "mm" -> None,
      "c.mm" -> None,
      "b.c.mm" -> Some("b.c.mm"),
      "a.b.c.mm" -> Some("b.c.mm"),
      // More complex TLD
      "jp" -> None,
      "test.jp" -> Some("test.jp"),
      "www.test.jp" -> Some("test.jp"),
      "ac.jp" -> None,
      "test.ac.jp" -> Some("test.ac.jp"),
      "www.test.ac.jp" -> Some("test.ac.jp"),
      "kyoto.jp" -> None,
      "test.kyoto.jp" -> Some("test.kyoto.jp"),
      "ide.kyoto.jp" -> None,
      "b.ide.kyoto.jp" -> Some("b.ide.kyoto.jp"),
      "a.b.ide.kyoto.jp" -> Some("b.ide.kyoto.jp"),
      "c.kobe.jp" -> None,
      "b.c.kobe.jp" -> Some("b.c.kobe.jp"),
      "a.b.c.kobe.jp" -> Some("b.c.kobe.jp"),
      "city.kobe.jp" -> Some("city.kobe.jp"),
      "www.city.kobe.jp" -> Some("city.kobe.jp"),
      // TLD with a wildcard rule and exceptions
      "ck" -> None,
      "test.ck" -> None,
      "b.test.ck" -> Some("b.test.ck"),
      "a.b.test.ck" -> Some("b.test.ck"),
      "www.ck" -> Some("www.ck"),
      "www.www.ck" -> Some("www.ck"),
      // US K12
      "us" -> None,
      "test.us" -> Some("test.us"),
      "www.test.us" -> Some("test.us"),
      "ak.us" -> None,
      "test.ak.us" -> Some("test.ak.us"),
      "www.test.ak.us" -> Some("test.ak.us"),
      "k12.ak.us" -> None,
      "test.k12.ak.us" -> Some("test.k12.ak.us"),
      "www.test.k12.ak.us" -> Some("test.k12.ak.us"),
      // IDN labels (unicode forms)
      "食狮.com.cn" -> Some("食狮.com.cn"),
      "食狮.公司.cn" -> Some("食狮.公司.cn"),
      "www.食狮.公司.cn" -> Some("食狮.公司.cn"),
      "shishi.公司.cn" -> Some("shishi.公司.cn"),
      "公司.cn" -> None,
      "食狮.中国" -> Some("食狮.中国"),
      "www.食狮.中国" -> Some("食狮.中国"),
      "shishi.中国" -> Some("shishi.中国"),
      "中国" -> None,
      // Same as above, but punycoded
      "xn--85x722f.com.cn" -> Some("xn--85x722f.com.cn"),
      "xn--85x722f.xn--55qx5d.cn" -> Some("xn--85x722f.xn--55qx5d.cn"),
      "www.xn--85x722f.xn--55qx5d.cn" -> Some("xn--85x722f.xn--55qx5d.cn"),
      "shishi.xn--55qx5d.cn" -> Some("shishi.xn--55qx5d.cn"),
      "xn--55qx5d.cn" -> None,
      "xn--85x722f.xn--fiqs8s" -> Some("xn--85x722f.xn--fiqs8s"),
      "www.xn--85x722f.xn--fiqs8s" -> Some("xn--85x722f.xn--fiqs8s"),
      "shishi.xn--fiqs8s" -> Some("shishi.xn--fiqs8s"),
      "xn--fiqs8s" -> None)

    def oursExpected(host: String, official: Option[String]): Option[String] =
      if (host.startsWith(".")) None // invalid → null in both conventions
      else official.orElse(Some(host.toLowerCase)) // suffix = own bucket

    val df = vectors.map(_._1).toDF("host")
    val got = PublicSuffix.withRegisteredDomain(df, "host", "domain",
        suffixes = Some(rules))
      .select("host", "domain").as[(String, String)]
      .collect().map { case (h, d) => h -> Option(d) }.toMap
    vectors.foreach { case (h, official) =>
      assert(got(h) == oursExpected(h, official),
        s"host $h: got ${got(h)}, official $official, " +
          s"ours-expected ${oursExpected(h, official)}")
    }
    // null input → null output
    val nullGot = PublicSuffix.withRegisteredDomain(
        Seq(Option.empty[String]).toDF("host"), "host", "domain")
      .select("domain").collect()(0)
    assert(nullGot.isNullAt(0))
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
