package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.functions.Url

/** Web-corpus curation operators: URL canonicalization/dedup and
  * per-domain statistics — the crawl-side stage that precedes text-level
  * dedup in a CommonCrawl-style pipeline.
  *
  * The documents table carries no URL column, so the gates attach a
  * deterministic messy URL to every doc (four crawler-variant shapes:
  * plain, WWW+uppercase+trailing-slash, tracking params, cdn-subdomain
  * +default-port+fragment) — built by IDENTICAL integer arithmetic in
  * both engines, so the differential tests the canonicalizer, not the
  * fixture.
  *
  * 100 TB shape: canonicalization is a map-side regex chain; URL dedup
  * is one groupBy on the canonical string (hash-partition, partial agg
  * map-side); domain stats aggregate to |domains| rows. Nothing joins,
  * nothing broadcasts, nothing collects.
  */
object WebOps {

  /** The messy-URL fixture, shared by both gates (Spark side). Variant 4
    * is a ccTLD host on a second-level-registration suffix (…co.uk) so
    * the PSL path in [[domainStats]] is exercised, not just the .com
    * fallback. */
  private def withRawUrl(docs: DataFrame): DataFrame = {
    val base = concat(col("lang"), lit("-news.com"))
    val ccBase = concat(col("lang"), lit("-press.co.uk"))
    val pathId = (col("doc_id") % 30).cast("long")
    val variant = expr("(doc_id div 30) % 5") // integer division, both engines
    val path = concat(lit("/articles/"), pathId)
    val url = when(variant === 0, concat(lit("https://"), base, path))
      .when(variant === 1,
        concat(lit("HTTPS://WWW."), upper(base), path, lit("/")))
      .when(variant === 2,
        concat(lit("https://www."), base, path,
          lit("?id="), pathId, lit("&utm_source=feed")))
      .when(variant === 3,
        concat(lit("https://cdn."), base, lit(":443"), path, lit("#frag")))
      .otherwise(concat(lit("https://news."), ccBase, path))
    docs.withColumn("url", url)
  }

  /** The same fixture in DuckDB SQL. */
  private val rawUrlSql: String =
    """CASE CAST((doc_id // 30) % 5 AS BIGINT)
      |  WHEN 0 THEN 'https://' || lang || '-news.com/articles/' || (doc_id % 30)
      |  WHEN 1 THEN 'HTTPS://WWW.' || upper(lang || '-news.com') ||
      |    '/articles/' || (doc_id % 30) || '/'
      |  WHEN 2 THEN 'https://www.' || lang || '-news.com/articles/' ||
      |    (doc_id % 30) || '?id=' || (doc_id % 30) || '&utm_source=feed'
      |  WHEN 3 THEN 'https://cdn.' || lang || '-news.com:443/articles/' ||
      |    (doc_id % 30) || '#frag'
      |  ELSE 'https://news.' || lang || '-press.co.uk/articles/' ||
      |    (doc_id % 30)
      |END""".stripMargin

  /** URL dedup: canonicalize, then keep-first per canonical URL. The
    * plain and WWW-variant shapes (and default-port/fragment noise)
    * collapse across docs; the id-param shape survives with its real
    * query param kept and the utm param stripped. */
  def urlDedup(spark: SparkSession, dir: String): DataFrame =
    withRawUrl(load(spark, dir, "documents"))
      .select(Url.canonicalize(col("url")).as("canonical_url"), col("doc_id"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_urls"), min("doc_id").as("first_doc"))
      .orderBy("canonical_url")

  private val urlDedupOracle: String =
    s"""WITH u AS (SELECT doc_id, $rawUrlSql AS url FROM documents),
       |c AS (SELECT doc_id,
       |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
       |  lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))
       |    AS hp,
       |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1)
       |    AS pq
       |  FROM u),
       |c2 AS (SELECT doc_id, sch,
       |  CASE WHEN sch = 'https'
       |    THEN regexp_replace(regexp_replace(hp, '^www\\.', ''), ':443$$', '')
       |    WHEN sch = 'http'
       |    THEN regexp_replace(regexp_replace(hp, '^www\\.', ''), ':80$$', '')
       |    ELSE regexp_replace(hp, '^www\\.', '') END AS host,
       |  regexp_replace(regexp_extract(pq, '^([^?]*)', 1), '/+$$', '') AS path,
       |  regexp_replace(regexp_extract(pq, '(\\?[^#]*)$$', 1),
       |    '[?&](utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*', '', 'g') AS q1
       |  FROM c),
       |canon AS (SELECT doc_id,
       |  CASE WHEN sch = '' THEN NULL
       |       ELSE sch || '://' || host || path ||
       |    CASE WHEN q1 = '' THEN ''
       |         ELSE '?' || regexp_replace(q1, '^[?&]', '') END
       |  END AS canonical_url
       |  FROM c2)
       |SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_urls,
       |  min(doc_id) AS first_doc
       |FROM canon GROUP BY 1 ORDER BY canonical_url""".stripMargin

  /** Per-registered-domain corpus stats: docs, distinct hosts (apex /
    * www / cdn variants counted canonically), total chars. Bucketing
    * goes through the broadcast public-suffix seam
    * ([[graft.functions.PublicSuffix]]), so `news.en-press.co.uk`
    * buckets as `en-press.co.uk`, not `co.uk` — the difference between
    * per-site and per-TLD stats on real crawl data. */
  def domainStats(spark: SparkSession, dir: String): DataFrame = {
    val hosts = withRawUrl(load(spark, dir, "documents"))
      .select(Url.canonicalHost(col("url")).as("host"),
        col("doc_id"), col("n_chars"))
    graft.functions.PublicSuffix
      .withRegisteredDomain(hosts, "host", "domain")
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        sum("n_chars").as("total_chars"))
      .orderBy("domain")
  }

  private val domainStatsOracle: String = {
    val pslList = graft.functions.PublicSuffix.builtin
      .map(s => s"'$s'").mkString(", ")
    s"""WITH u AS (SELECT doc_id, n_chars, $rawUrlSql AS url FROM documents),
       |h AS (SELECT doc_id, n_chars,
       |  CASE WHEN lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://',
       |      1)) = 'https'
       |    THEN regexp_replace(regexp_replace(
       |      lower(regexp_extract(url,
       |        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
       |      '^www\\.', ''), ':443$$', '')
       |    ELSE regexp_replace(
       |      lower(regexp_extract(url,
       |        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
       |      '^www\\.', '') END AS host
       |  FROM u),
       |psl AS (SELECT unnest([$pslList]) AS suffix),
       |lab AS (SELECT doc_id, n_chars, host,
       |  string_split(host, '.') AS labs,
       |  len(string_split(host, '.')) AS n FROM h),
       |m AS (SELECT doc_id, n_chars, host, labs, n,
       |  CASE
       |    WHEN array_to_string(labs[greatest(1, n - 3):n], '.')
       |      IN (SELECT suffix FROM psl) THEN 4
       |    WHEN array_to_string(labs[greatest(1, n - 2):n], '.')
       |      IN (SELECT suffix FROM psl) THEN 3
       |    WHEN array_to_string(labs[greatest(1, n - 1):n], '.')
       |      IN (SELECT suffix FROM psl) THEN 2
       |    WHEN array_to_string(labs[greatest(1, n):n], '.')
       |      IN (SELECT suffix FROM psl) THEN 1
       |    ELSE NULL END AS k
       |  FROM lab)
       |SELECT CASE WHEN k IS NULL THEN
       |    CASE WHEN host NOT LIKE '%.%' THEN host
       |         ELSE regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) END
       |    ELSE array_to_string(labs[greatest(1, n - k):n], '.') END
       |  AS domain,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM m GROUP BY 1 ORDER BY domain""".stripMargin
  }

  /** [[domainStats]] under a CUSTOM rule set exercising the full PSL
    * grammar — wildcard (`*.co.uk`: every co.uk slot is its own public
    * suffix) and exception (`!en-press.co.uk`: that slot is registrable
    * after all) rules, prevailing-rule precedence included. On the
    * fixture this buckets `news.en-press.co.uk` as `en-press.co.uk`
    * (exception beats wildcard) while every OTHER language's press host
    * buckets as `news.<lang>-press.co.uk` (wildcard suffix + one
    * label). The oracle replays the PSL algorithm over the same rules
    * in SQL, so wildcard/exception semantics are differential-gated,
    * not just spec-tested. */
  def domainStatsWild(spark: SparkSession, dir: String): DataFrame = {
    val hosts = withRawUrl(load(spark, dir, "documents"))
      .select(Url.canonicalHost(col("url")).as("host"),
        col("doc_id"), col("n_chars"))
    import spark.implicits._
    val rules = Seq("com", "uk", "*.co.uk", "!en-press.co.uk")
      .toDF("suffix")
    graft.functions.PublicSuffix
      .withRegisteredDomain(hosts, "host", "domain", suffixes = Some(rules))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        sum("n_chars").as("total_chars"))
      .orderBy("domain")
  }

  private val domainStatsWildOracle: String =
    s"""WITH u AS (SELECT doc_id, n_chars, $rawUrlSql AS url FROM documents),
       |h AS (SELECT doc_id, n_chars,
       |  CASE WHEN lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://',
       |      1)) = 'https'
       |    THEN regexp_replace(regexp_replace(
       |      lower(regexp_extract(url,
       |        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
       |      '^www\\.', ''), ':443$$', '')
       |    ELSE regexp_replace(
       |      lower(regexp_extract(url,
       |        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
       |      '^www\\.', '') END AS host
       |  FROM u),
       |lab AS (SELECT doc_id, n_chars, host,
       |  string_split(host, '.') AS labs,
       |  len(string_split(host, '.')) AS n FROM h),
       |m AS (SELECT doc_id, n_chars, host, labs, n,
       |  -- exception !en-press.co.uk: suffix = rule minus leftmost label
       |  CASE WHEN n >= 3 AND
       |    array_to_string(labs[n - 2:n], '.') = 'en-press.co.uk'
       |    THEN 2 ELSE NULL END AS k_exc,
       |  -- wildcard *.co.uk: one extra label joins the suffix
       |  CASE WHEN n >= 3 AND
       |    array_to_string(labs[n - 1:n], '.') = 'co.uk'
       |    THEN 3 ELSE NULL END AS k_wild,
       |  -- plain rules com, uk
       |  CASE WHEN labs[n] IN ('com', 'uk') THEN 1 ELSE NULL END AS k_pl
       |  FROM lab),
       |k AS (SELECT doc_id, n_chars, host, labs, n,
       |  COALESCE(k_exc,
       |    NULLIF(GREATEST(COALESCE(k_wild, 0), COALESCE(k_pl, 0)), 0))
       |    AS k
       |  FROM m)
       |SELECT CASE WHEN k IS NULL THEN
       |    CASE WHEN host NOT LIKE '%.%' THEN host
       |         ELSE regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) END
       |    ELSE array_to_string(labs[greatest(1, n - k):n], '.') END
       |  AS domain,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM k GROUP BY 1 ORDER BY domain""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q_url_dedup", urlDedup, Some(urlDedupOracle),
      "web curation: URL canonicalization + keep-first dedup"),
    QuerySpec("q_domain_stats", domainStats, Some(domainStatsOracle),
      "web curation: registered-domain stats (docs, hosts, chars)"),
    QuerySpec("q_domain_stats_wild", domainStatsWild,
      Some(domainStatsWildOracle),
      "web curation: PSL wildcard/exception rules, differential-gated"))
}
