package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Exact substring dedup as an inventory entry — the
  * [[graft.operators.SubstrDedup]] operator over the documents table,
  * with its DuckDB oracle. See the operator scaladoc for the method
  * (Lee et al. 2021 window-anchored verbatim-run localization) and
  * the 100 TB shape.
  */
object SubstrQ {

  /** Anchor window in tokens — ONE definition interpolated into both
    * the Scala path and the SQL mirror (the SemDedupThreshold
    * pattern), so the registered query and its oracle cannot drift.
    * 16 tokens ≈ two q59 line-windows: long enough that a shared run
    * is a real quote, short enough that the sf-corpus boilerplate
    * runs (2+ consecutive 8-word windows) are caught.
    */
  val SubstrWindow: Int = 16

  /** q74: verbatim duplicated-run spans ≥ [[SubstrWindow]] tokens
    * shared across documents, keep-lowest-doc.
    */
  def q74(s: SparkSession, dir: String): DataFrame =
    graft.operators.SubstrDedup.spans(Tables(s, dir).documents, SubstrWindow)

  val q74Sql: String = {
    val w = SubstrWindow
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(
       |    trim(lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))), '\\s+') AS a
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, a,
       |    unnest(generate_series(1, len(a) - ${w - 1})) AS p
       |  FROM toks WHERE len(a) >= $w),
       |ph AS (
       |  SELECT doc_id, p,
       |    md5_number_lower(array_to_string(list_slice(a, p, p + ${w - 1}), ' ')) AS h
       |  FROM pos),
       |dup AS (
       |  SELECT h, min(doc_id) AS keeper
       |  FROM ph GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |mk AS (
       |  SELECT ph.doc_id, ph.p
       |  FROM ph JOIN dup USING (h) WHERE ph.doc_id <> dup.keeper),
       |isl AS (
       |  SELECT doc_id, p,
       |    p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS grp
       |  FROM mk)
       |SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
       |  CAST(max(p) + ${w - 1} AS BIGINT) AS span_end,
       |  CAST(max(p) + $w - min(p) AS BIGINT) AS n_tok
       |FROM isl GROUP BY doc_id, grp
       |ORDER BY doc_id, span_start""".stripMargin
  }

  val entries: Seq[Entry] = Seq(
    Entry("q74_substr_spans", q74, Some(q74Sql)))
}
