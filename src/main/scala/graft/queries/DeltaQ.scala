package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-evolution operators: snapshot diffing (the delta feed the
  * maintainer family consumes) and quality-weighted selection.
  */
object DeltaQ {

  /** q116: corpus snapshot DIFF ([[graft.operators.CorpusDiff]]) —
    * old = the documents table, new = a DETERMINISTICALLY EVOLVED
    * copy (the q76/q84 injection device, so both engines must detect
    * identical known changes rather than agree on an empty diff):
    * docs with id ≡ 0 (mod 31) are removed, survivors with id ≡ 0
    * (mod 37) are edited in place (` rev2` appended), and every id ≡
    * 0 (mod 41) re-enters as a NEW doc at id + 10⁹. Output is the
    * delta only — (doc_id, change) for added/removed/changed —
    * never the unchanged mass; text dies map-side into 128-bit
    * digests before the one full-outer exchange.
    */
  def q116(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir).documents
    val txt = coalesce(col("text"), lit(""))
    val evolvedBase = t.filter(col("doc_id") % 31 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 37 === 0, concat(txt, lit(" rev2")))
          .otherwise(txt).as("text"))
    val arrived = t.filter(col("doc_id") % 41 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"), txt.as("text"))
    graft.operators.CorpusDiff.delta(t, evolvedBase.unionByName(arrived))
      .orderBy(col("doc_id"), col("change"))
  }

  val q116Sql: String =
    """WITH oldS AS (
      |  SELECT doc_id, md5(coalesce(text, '')) AS dig FROM documents),
      |newRaw AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 37 = 0 THEN coalesce(text, '') || ' rev2'
      |         ELSE coalesce(text, '') END AS text2
      |  FROM documents WHERE doc_id % 31 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000000, coalesce(text, '')
      |  FROM documents WHERE doc_id % 41 = 0),
      |newS AS (SELECT doc_id, md5(text2) AS dig FROM newRaw),
      |d AS (
      |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |    CASE WHEN o.doc_id IS NULL THEN 'added'
      |         WHEN n.doc_id IS NULL THEN 'removed'
      |         WHEN o.dig <> n.dig THEN 'changed' END AS change
      |  FROM oldS o FULL OUTER JOIN newS n ON o.doc_id = n.doc_id)
      |SELECT doc_id, change FROM d WHERE change IS NOT NULL
      |ORDER BY doc_id, change""".stripMargin

  /** q117: QUALITY-WEIGHTED sampling — per-row keep probability
    * proportional to a quality score (the DCLM/FineWeb-style
    * quality-scored selection that replaces hard threshold filters:
    * borderline docs survive at reduced rate instead of dying at a
    * cliff), vs q47's per-CLASS fixed rates and q55's fixed per-class
    * COUNTS. Weight = q77's quality9 blend (nano-units ∈ [0, 10⁹]:
    * least(n_words,100)·5·10⁶ + n_stop·5·10⁸ DIV n_words); draw = 30
    * low bits of the domain-separated portable md5 ("wq:" — the
    * Sample.keep decorrelation rule, so stacking over q47's gate is
    * two independent coins); keep iff draw·10⁹ < quality9·2³⁰ — an
    * exact BIGINT cross-multiply (both products < 2⁶³), no division,
    * no float, engine-identical.
    *
    * ONE codegen'd projection: no shuffle, no state — composes
    * map-side into CorpusPrep and streams unchanged (the q47/q52
    * stateless-stage shape). Emits every doc with its verdict (the
    * audit form, like q64); a pipeline ships `WHERE kept = 1`.
    */
  def q117(s: SparkSession, dir: String): DataFrame = {
    val qw = graft.operators.QualityWeight
    qw.withQuality9(Tables(s, dir).documents)
      .select(col("doc_id"), col("quality9"),
        qw.draw30(col("doc_id")).as("draw30"))
      .withColumn("kept",
        qw.keeps(col("draw30"), col("quality9")).cast("bigint"))
      .orderBy(col("doc_id"))
  }

  val q117Sql: String =
    s"""WITH q AS (
      |  SELECT doc_id, ${graft.operators.QualityWeight.Quality9Sql} AS quality9,
      |    CAST(md5_number_lower('wq:' || CAST(doc_id AS VARCHAR)) & 1073741823 AS BIGINT) AS draw30
      |  FROM documents)
      |SELECT doc_id, quality9, draw30,
      |  CAST(draw30 * 1000000000 < quality9 * 1073741824 AS BIGINT) AS kept
      |FROM q ORDER BY doc_id""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("q116_corpus_diff", q116, Some(q116Sql)),
    Entry("q117_weighted_sample", q117, Some(q117Sql)))
}
