package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.SimilarityJoin

/** SURVEY.md §2 rows 36–43: the similarity-join suite. */
object SimilarityQueries {

  /** q36 ★flagship — token-set Jaccard self-join on documents, blocked by
    * (lang, source), τ = 0.8. 342 pairs at sf0.001 (FIXTURES.md).
    */
  val q36 = Q(
    "q36_jaccard_self_join",
    (s, d) => SimilarityJoin.jaccardSelf(
      Tables.documents(s, d), "doc_id", "text", Seq("lang", "source"), 0.8),
    Some("""
      WITH t AS (
        SELECT doc_id, lang, source,
               list_distinct(regexp_split_to_array(text, ' +')) AS toks
        FROM documents
      )
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             ROUND(len(list_intersect(a.toks, b.toks))::DOUBLE
                   / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6) AS sim
      FROM t a JOIN t b
        ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
            / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8
      ORDER BY a_id, b_id
    """.stripMargin.trim))

  def all: Seq[Q] = Seq(q36)
}
