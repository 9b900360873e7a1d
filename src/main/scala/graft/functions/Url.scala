package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL column functions for web-corpus curation (the CommonCrawl /
  * RefinedWeb pipeline stage that precedes text dedup): canonicalization
  * collapses the cosmetic variants crawlers see for one resource
  * (scheme/host case, `www.`, default ports, tracking params, fragments,
  * trailing slashes), and registered-domain extraction feeds per-domain
  * stats and caps. Pure column regex expressions — codegen'd,
  * partition-parallel, no UDFs.
  *
  * Scope: the canonicalizer is deliberately conservative — it never
  * strips non-`www` subdomains, never reorders surviving query params,
  * and never touches path case (all of which can change the resource).
  */
object Url {

  /** Lowercased scheme ("https"); empty if the value has no scheme. */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host[:port] authority component. */
  def hostPort(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))

  /** Canonical host: lowercase, `www.` stripped, default port stripped. */
  def canonicalHost(url: Column): Column = {
    val h0 = regexp_replace(hostPort(url), "^www\\.", "")
    when(scheme(url) === "https", regexp_replace(h0, ":443$", ""))
      .when(scheme(url) === "http", regexp_replace(h0, ":80$", ""))
      .otherwise(h0)
  }

  /** Registered domain, last-two-labels HEURISTIC ("cdn.en-news.com" ->
    * "en-news.com"). This is the PSL's implicit `*` fallback rule only —
    * it mis-buckets second-level-registration ccTLDs (`bbc.co.uk` ->
    * "co.uk"). Domain bucketing at corpus scale should go through
    * [[PublicSuffix.withRegisteredDomain]], the broadcast-PSL seam,
    * which uses this heuristic exactly for hosts no rule covers. */
  def registeredDomain(url: Column): Column =
    regexp_extract(canonicalHost(url), "([^.:]+\\.[^.:]+)$", 1)

  /** Canonical URL: lowercased scheme + canonical host + path with
    * trailing slashes stripped + query with tracking params
    * (utm_*, fbclid, gclid) removed and separators re-normalized;
    * fragment dropped. Deterministic, replayable in any regex engine. */
  def canonicalize(url: Column): Column = {
    // path+query (fragment dropped), then split path from query
    val pq = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path = regexp_replace(regexp_extract(pq, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(pq, "(\\?[^#]*)$", 1)
    // strip tracking params (separator goes with them), then restore a
    // leading '?' on whatever survives
    val q1 = regexp_replace(query,
      "[?&](utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*", "")
    val q2 = when(q1 === "", lit(""))
      .otherwise(concat(lit("?"), regexp_replace(q1, "^[?&]", "")))
    // schemeless / malformed input would otherwise assemble "://" +
    // leftovers — silent corruption on real crawl data where not every
    // url value parses. No scheme -> null, callers drop-or-quarantine.
    when(scheme(url) === "", lit(null).cast("string"))
      .otherwise(concat(scheme(url), lit("://"), canonicalHost(url), path, q2))
  }
}
