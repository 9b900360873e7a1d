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

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q_join_fuzzy", joinFuzzy, Some(joinFuzzyOracle),
      "J5+ fuzzy edit-distance join (ED-Join prefix filtering)"))
}
