package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Public-suffix-aware registered-domain extraction — the bucketing key
  * for per-domain corpus stats and caps. The naive "last two labels"
  * heuristic ([[Url.registeredDomain]]) buckets every `*.co.uk` host
  * into one giant "co.uk" domain (and likewise com.au, co.jp, …),
  * which at crawl scale both corrupts per-domain quality stats and
  * defeats domain capping exactly where it matters most.
  *
  * PSL semantics (publicsuffix.org algorithm, plain rules): the
  * registered domain is the matched public suffix plus ONE more label,
  * with the LONGEST matching suffix winning ("www.bbc.co.uk": "uk" and
  * "co.uk" both match; "co.uk" wins → "bbc.co.uk"). Wildcard and
  * exception rules (`*.ck`, `!www.ck`) are out of scope for the
  * builtin subset; hosts matching no rule fall back to the last-two-
  * labels heuristic (the PSL's implicit `*` catch-all rule), and a host
  * that IS a public suffix returns itself.
  *
  * 100 TB shape: the suffix table — ~9k rows for the full PSL, the
  * [[builtin]] subset here — is BROADCAST; matching is `maxLabels`
  * consecutive broadcast hash joins on the last-k-labels string (pure
  * equi-joins: a k-label candidate can only string-equal a k-label
  * suffix), so the corpus never shuffles and the whole chain stays in
  * one codegen stage per join. No explode, no re-group, no UDF.
  */
object PublicSuffix {

  /** Curated subset of the Public Suffix List: the gTLDs plus the
    * second-level-registration ccTLDs a web corpus actually hits. This
    * is the deploy-time seam — swap in the full PSL as a DataFrame via
    * the `suffixes` parameter; the algorithm is rule-count-agnostic. */
  val builtin: Seq[String] = Seq(
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "io", "co", "ai", "dev", "app", "xyz",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk",
    "ltd.uk", "plc.uk", "sch.uk", "nhs.uk",
    "jp", "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "au", "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "nz", "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz",
    "br", "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "in", "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "za", "co.za", "org.za", "gov.za", "ac.za", "web.za",
    "cn", "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "mx", "com.mx", "org.mx", "gob.mx", "edu.mx",
    "ar", "com.ar", "org.ar", "gob.ar",
    "kr", "co.kr", "or.kr", "go.kr", "ac.kr",
    "tw", "com.tw", "org.tw", "gov.tw",
    "de", "fr", "it", "es", "nl", "pl", "ru", "se", "no", "fi", "dk",
    "ch", "at", "be", "cz", "pt", "gr", "ie", "hu", "ca", "us", "eu")

  /** Append `outCol` = the PSL registered domain of `hostCol` (a
    * canonical host, optionally `:port`-suffixed — the port is ignored
    * for bucketing). `suffixes` must expose a `suffix` column; defaults
    * to [[builtin]]. `maxLabels` bounds rule length (the full PSL needs
    * 4; the builtin subset only contains 1- and 2-label rules but the
    * join chain is cheap enough to leave headroom). */
  def withRegisteredDomain(df: DataFrame, hostCol: String, outCol: String,
      suffixes: Option[DataFrame] = None, maxLabels: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val psl = suffixes.getOrElse(builtin.toDF("suffix"))
    val h = col("__psl_h")
    var out = df.withColumn("__psl_h",
      regexp_replace(lower(col(hostCol)), ":\\d+$", ""))
    (1 to maxLabels).foreach { i =>
      out = out.join(
        broadcast(psl.select(col("suffix").as(s"__psl_s$i")).distinct()),
        substring_index(h, ".", -i) === col(s"__psl_s$i"), "left")
    }
    // longest match wins; registered = suffix + one label.
    // substring_index saturates to the whole host when the host has no
    // label left of the suffix — i.e. a host that IS a public suffix
    // returns itself. No match → last-two-labels fallback (implicit *).
    val reg = coalesce((maxLabels to 1 by -1).map(i =>
      when(col(s"__psl_s$i").isNotNull,
        substring_index(h, ".", -(i + 1)))) :+
      regexp_extract(h, "([^.]+\\.[^.]+)$", 1): _*)
    out.withColumn(outCol, reg)
      .drop("__psl_h" +: (1 to maxLabels).map(i => s"__psl_s$i"): _*)
  }

  /** Column form for tests/composition over an already-extracted host
    * when the suffix set is the builtin (literal `isin` membership —
    * same semantics as the join form, for bounded rule sets only). */
  def registeredDomainLit(host: Column): Column = {
    val h = regexp_replace(lower(host), ":\\d+$", "")
    val byLen = builtin.groupBy(_.count(_ == '.') + 1)
    val ks = byLen.keys.toSeq.sorted.reverse
    coalesce(ks.map(i =>
      when(substring_index(h, ".", -i).isin(byLen(i): _*),
        substring_index(h, ".", -(i + 1)))) :+
      regexp_extract(h, "([^.]+\\.[^.]+)$", 1): _*)
  }
}
