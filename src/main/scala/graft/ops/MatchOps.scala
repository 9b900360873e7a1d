package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.functions.Text
import graft.similarity.EditJoin

/** Fuzzy record-matching operators over the document corpus. */
object MatchOps {

  /** Edit-distance self-join on document "titles" (first 5 tokens): all
    * pairs within levenshtein <= 4, found via rarest-first q-gram prefix
    * filtering ([[graft.similarity.EditJoin]]) — never an all-pairs scan.
    * The oracle IS the all-pairs form, so the differential proves the
    * pruned candidate set loses nothing. */
  def joinFuzzy(spark: SparkSession, dir: String): DataFrame = {
    val titles = load(spark, dir, "documents")
      .select(col("doc_id"),
        array_join(slice(Text.tokens(col("text")), 1, 5), " ").as("title"))
    EditJoin.selfJoin(titles, "doc_id", "title", maxDist = 4)
      .orderBy("id_a", "id_b")
  }

  private val joinFuzzyOracle: String =
    """WITH t AS (SELECT doc_id,
      |    array_to_string(list_filter(regexp_split_to_array(text, ' +'),
      |      w -> w != '')[1:5], ' ') AS title
      |  FROM documents)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(levenshtein(a.title, b.title) AS INT) AS ed
      |FROM t a, t b
      |WHERE a.doc_id < b.doc_id
      |  AND abs(length(a.title) - length(b.title)) <= 4
      |  AND levenshtein(a.title, b.title) <= 4
      |ORDER BY id_a, id_b""".stripMargin

  /** Entity resolution end-to-end — the composition the fuzzy join
    * exists for: near-identical titles (ed <= 4) become edges, connected
    * components merge transitive matches, each doc resolves to its
    * component's canonical id (min doc_id), singletons to themselves.
    * One differential covers EditJoin + ConnectedComponents + canonical
    * selection stacked, the way q_curation_pipeline covers the curation
    * chain; the oracle replays the closure as a recursive CTE over the
    * all-pairs edge set. */
  def entityResolution(spark: SparkSession, dir: String): DataFrame = {
    val titles = load(spark, dir, "documents")
      .select(col("doc_id"),
        array_join(slice(Text.tokens(col("text")), 1, 5), " ").as("title"))
    val edges = EditJoin.selfJoin(titles, "doc_id", "title", maxDist = 4)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val comps = graft.graph.ConnectedComponents.run(edges)
      .withColumnRenamed("id", "doc_id")
    val resolved = titles.select(col("doc_id"))
      .join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("canon_id"))
    val sizes = resolved.groupBy("canon_id")
      .agg(count(lit(1)).as("cluster_size"))
    resolved.join(sizes, "canon_id")
      .select("doc_id", "canon_id", "cluster_size")
      .orderBy("doc_id")
  }

  private val entityResolutionOracle: String =
    """WITH RECURSIVE
      |t AS MATERIALIZED (SELECT doc_id,
      |    array_to_string(list_filter(regexp_split_to_array(text, ' +'),
      |      w -> w != '')[1:5], ' ') AS title
      |  FROM documents),
      |e AS MATERIALIZED (SELECT a.doc_id AS a, b.doc_id AS b
      |  FROM t a, t b
      |  WHERE a.doc_id < b.doc_id
      |    AND abs(length(a.title) - length(b.title)) <= 4
      |    AND levenshtein(a.title, b.title) <= 4),
      |und AS MATERIALIZED (SELECT a AS id, b AS nbr FROM e
      |  UNION ALL SELECT b, a FROM e),
      |reach AS (SELECT id, id AS label
      |    FROM (SELECT DISTINCT id FROM und) s
      |  UNION
      |  SELECT u.id, r.label FROM und u JOIN reach r ON r.id = u.nbr),
      |lab AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
      |res AS (SELECT t.doc_id,
      |    coalesce(lab.component, t.doc_id) AS canon_id
      |  FROM t LEFT JOIN lab ON lab.id = t.doc_id),
      |sz AS (SELECT canon_id, CAST(count(*) AS BIGINT) AS cluster_size
      |  FROM res GROUP BY canon_id)
      |SELECT res.doc_id, res.canon_id, sz.cluster_size
      |FROM res JOIN sz USING (canon_id) ORDER BY res.doc_id""".stripMargin

  /** Fuzzy decontamination — the cross-corpus form of the edit-distance
    * join: train titles (doc_id % 10 != 0) within ed <= 4 of any
    * benchmark title (doc_id % 10 == 0). Exact-hash decontamination
    * (q_decontaminate) misses near-identical rephrasings; this is the
    * fuzzy sweep that follows it. Oracle is the all-pairs cross join. */
  def decontaminateFuzzy(spark: SparkSession, dir: String): DataFrame = {
    val titles = load(spark, dir, "documents")
      .select(col("doc_id"),
        array_join(slice(Text.tokens(col("text")), 1, 5), " ").as("title"))
    val train = titles.filter(col("doc_id") % 10 =!= 0)
    val bench = titles.filter(col("doc_id") % 10 === 0)
    EditJoin.join(train, bench, "doc_id", "title", maxDist = 4)
      .withColumnRenamed("id_l", "train_doc")
      .withColumnRenamed("id_r", "bench_doc")
      .orderBy("train_doc", "bench_doc")
  }

  private val decontaminateFuzzyOracle: String =
    """WITH t AS (SELECT doc_id,
      |    array_to_string(list_filter(regexp_split_to_array(text, ' +'),
      |      w -> w != '')[1:5], ' ') AS title
      |  FROM documents)
      |SELECT a.doc_id AS train_doc, b.doc_id AS bench_doc,
      |  CAST(levenshtein(a.title, b.title) AS INT) AS ed
      |FROM t a, t b
      |WHERE a.doc_id % 10 != 0 AND b.doc_id % 10 = 0
      |  AND abs(length(a.title) - length(b.title)) <= 4
      |  AND levenshtein(a.title, b.title) <= 4
      |ORDER BY train_doc, bench_doc""".stripMargin

  /** Fuzzy matching served from the PERSISTED prefix index: the corpus
    * side (even doc_ids) is indexed once — member list, distinct
    * strings, frozen element-frequency order, prefix relation — and the
    * batch (odd doc_ids) assigns against the frozen tables with no
    * corpus-side recompute. Same oracle family as the direct cross
    * join; EditJoinSpec additionally pins served == direct. */
  private val fuzzyStoreCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.pipeline.Store]

  def joinFuzzyIndexed(spark: SparkSession, dir: String): DataFrame = {
    def titles = load(spark, dir, "documents")
      .select(col("doc_id"),
        array_join(slice(Text.tokens(col("text")), 1, 5), " ").as("title"))
    // the index build is memoized fixture prep (the train-once artifact,
    // like the IVF/PQ/DSIR twins); every call — every bench repeat —
    // times what production serving pays: assign against frozen tables
    val store = fuzzyStoreCache.synchronized {
      fuzzyStoreCache.getOrElseUpdate((spark, dir), {
        val base = SourceSinkOps.tmp("fuzzyidx", dir)
        graft.pipeline.FsUtils.deleteRecursively(new java.io.File(base))
        val st = new graft.pipeline.Store(spark, base)
        EditJoin.buildIndex(st, "fz",
          titles.filter(col("doc_id") % 2 === 0), "doc_id", "title",
          maxDist = 4)
        st
      })
    }
    val batch = titles.filter(col("doc_id") % 2 =!= 0)
    EditJoin.assignAgainstIndex(store, "fz", batch, "doc_id", "title",
        maxDist = 4)
      .withColumnRenamed("id_l", "batch_doc")
      .withColumnRenamed("id_r", "corpus_doc")
      .orderBy("batch_doc", "corpus_doc")
  }

  private val joinFuzzyIndexedOracle: String =
    """WITH t AS (SELECT doc_id,
      |    array_to_string(list_filter(regexp_split_to_array(text, ' +'),
      |      w -> w != '')[1:5], ' ') AS title
      |  FROM documents)
      |SELECT a.doc_id AS batch_doc, b.doc_id AS corpus_doc,
      |  CAST(levenshtein(a.title, b.title) AS INT) AS ed
      |FROM t a, t b
      |WHERE a.doc_id % 2 != 0 AND b.doc_id % 2 = 0
      |  AND abs(length(a.title) - length(b.title)) <= 4
      |  AND levenshtein(a.title, b.title) <= 4
      |ORDER BY batch_doc, corpus_doc""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q_join_fuzzy", joinFuzzy, Some(joinFuzzyOracle),
      "J5+ fuzzy edit-distance join (ED-Join prefix filtering)"),
    QuerySpec("q_join_fuzzy_indexed", joinFuzzyIndexed,
      Some(joinFuzzyIndexedOracle),
      "match/fuzzy-join-persisted-index-serving"),
    QuerySpec("q_decontaminate_fuzzy", decontaminateFuzzy,
      Some(decontaminateFuzzyOracle),
      "curate/fuzzy-decontamination (cross-corpus edit-distance join)"),
    QuerySpec("q_entity_resolution", entityResolution,
      Some(entityResolutionOracle),
      "match/entity-resolution (fuzzy join -> CC -> canonical)"))
}
