package graft.operators

import graft.functions.TextOps.{normText, tokens}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Positional full-text primitives: the inverted-index-with-positions
  * shape behind phrase search. A term-only index answers "docs
  * containing all of X Y" but not "docs containing the PHRASE
  * "X Y"" — adjacency needs token positions, which is exactly what
  * search engines store in their postings (Lucene's term positions).
  *
  * Here the "index" is the posting frame derived in-plan: one
  * posexplode to (doc_id, pos, term), filtered to the QUERY'S terms
  * before anything shuffles — the filter is map-side, so the join
  * exchanges carry (doc_id, pos) pairs for matching terms only, a
  * frame bounded by the query terms' document frequency, not the
  * corpus. A persisted deployment would materialize the same frame
  * bucketed by term ([[Bucketed]]); the operator is the QUERY side
  * and is identical over either.
  *
  * Matches may overlap ("a a a" contains the phrase "a a" twice) —
  * the standard positional-search convention, pinned in the spec.
  */
object Search {

  /** Documents containing `terms` as a consecutive phrase:
    * (doc_id, n_phrase, first_pos), positions 1-based, ordered by
    * doc_id. The k-th term joins on pos = p0 + k — a chain of
    * equi-joins each bounded by that term's postings.
    */
  def phrase(docs: DataFrame, terms: Seq[String],
             idCol: Column = col("doc_id"),
             textCol: Column = col("text")): DataFrame = {
    require(terms.nonEmpty, "phrase needs at least one term")
    // postings are built from NORMALIZED text, so the query terms must
    // normalize the same way — a raw "Batch" would match nothing,
    // silently. A term with interior whitespace can never be one
    // token: refuse it rather than return an empty result
    val qs = terms.map(_.trim.toLowerCase)
    require(qs.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"phrase terms must be single non-empty tokens, got $terms")
    // CACHED (the q86/SimJoin rationale): one consumer per query term
    // would otherwise re-scan and re-tokenize the corpus k times for
    // a k-term phrase (different filters defeat plan-level reuse).
    // The frame is query-term postings only — document-frequency-
    // sized. Lifecycle is the caller's, as with SimJoin: CacheManager
    // dedupes repeated identical queries; a service joining many
    // different corpora should clear entries after materializing.
    val post = docs
      .select(idCol.as("doc_id"),
        posexplode(tokens(normText(coalesce(textCol, lit(""))))).as(Seq("i", "t")))
      .select(col("doc_id"), (col("i") + 1).cast("long").as("pos"), col("t"))
      .filter(col("t").isin(qs.distinct: _*))
      .cache()
    val head = post.filter(col("t") === qs.head)
      .select(col("doc_id"), col("pos"))
    val matched = qs.zipWithIndex.drop(1).foldLeft(head) {
      case (acc, (term, k)) =>
        // equi-join on BOTH keys (doc, expected position): hash join,
        // never a per-doc postings product
        val pk = post.filter(col("t") === term)
          .select(col("doc_id"), col("pos").as("_want"))
        acc.withColumn("_want", col("pos") + k)
          .join(pk, Seq("doc_id", "_want"))
          .drop("_want")
    }
    matched.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_phrase"), min(col("pos")).as("first_pos"))
      .orderBy(col("doc_id"))
  }
}
