package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class UrlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Url.canonicalize(col("u"))).as[String].collect().toSeq

  test("case, www, default port, fragment, trailing slash all collapse") {
    assert(canon(
      "https://example.com/a",
      "HTTPS://WWW.EXAMPLE.COM/a/",
      "https://example.com:443/a#frag",
      "https://www.example.com/a").distinct == Seq("https://example.com/a"))
  }

  test("http strips :80 but not :8080; non-www subdomains survive") {
    assert(canon("http://example.com:80/x") == Seq("http://example.com/x"))
    assert(canon("http://example.com:8080/x") ==
      Seq("http://example.com:8080/x"))
    assert(canon("https://cdn.example.com/x") ==
      Seq("https://cdn.example.com/x"))
  }

  test("tracking params stripped wherever they sit; real params survive") {
    assert(canon("https://e.com/p?utm_source=x") == Seq("https://e.com/p"))
    assert(canon("https://e.com/p?utm_source=x&id=3") ==
      Seq("https://e.com/p?id=3"))
    assert(canon("https://e.com/p?id=3&utm_medium=y&q=z&fbclid=abc") ==
      Seq("https://e.com/p?id=3&q=z"))
    assert(canon("https://e.com/p?gclid=1&utm_a=2") == Seq("https://e.com/p"))
  }

  test("root path and empty path normalize identically") {
    assert(canon("https://e.com/", "https://e.com").distinct ==
      Seq("https://e.com"))
  }

  test("schemeless / malformed input canonicalizes to null, never '://…'") {
    val got = Seq("no-scheme", "example.com/path", "://broken", "")
      .toDF("u").select(Url.canonicalize(col("u")).as("c")).collect()
    assert(got.forall(_.isNullAt(0)), got.mkString(","))
  }

  test("registered domain takes the last two labels of the canonical host") {
    val d = Seq("https://www.cdn.deep.sub.example.com/x")
      .toDF("u").select(Url.registeredDomain(col("u"))).as[String].collect()
    assert(d.toSeq == Seq("example.com"))
  }
}
