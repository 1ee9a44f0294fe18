package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Positional phrase search as an inventory entry — the
  * [[graft.operators.Search]] kernel over the documents table with a
  * fixed query phrase, DuckDB-mirrored by the same postings chain.
  */
object SearchQ {

  /** The query phrase, single-sourced into both engines. Chosen from
    * the synthetic vocabulary so every SF has real matches (including
    * overlapping-adjacency cases the spec pins on fixtures).
    */
  val Phrase: Seq[String] = Seq("batch", "stream")

  def q99(s: SparkSession, dir: String): DataFrame =
    graft.operators.Search.phrase(Tables(s, dir).documents, Phrase)

  val q99Sql: String = {
    val joins = Phrase.zipWithIndex.drop(1).map { case (t, k) =>
      s"JOIN p p$k ON p$k.doc_id = p0.doc_id AND p$k.pos = p0.pos + $k AND p$k.t = '$t'"
    }.mkString("\n       |  ")
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(
       |    trim(lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))), '\\s+') AS a
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, unnest(a) AS t,
       |    unnest(generate_series(1, len(a))) AS pos
       |  FROM toks),
       |m AS (
       |  SELECT p0.doc_id, p0.pos
       |  FROM p p0
       |  $joins
       |  WHERE p0.t = '${Phrase.head}')
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_phrase,
       |  CAST(min(pos) AS BIGINT) AS first_pos
       |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val entries: Seq[Entry] = Seq(
    Entry("q99_phrase_search", q99, Some(q99Sql)))
}
