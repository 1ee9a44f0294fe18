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

  /** Materialize-then-release (the q96 rationale): the postings cache
    * is scoped to this call via an eager localCheckpoint of the
    * (match-count-sized) result; plan pins use the lazy operator.
    */
  def q99(s: SparkSession, dir: String): DataFrame = {
    val sc = graft.operators.Search.phraseScoped(
      Tables(s, dir).documents, Phrase)
    try sc.df.localCheckpoint() finally sc.release()
  }

  /** The q99 postings-chain oracle, parameterized by an optional
    * document predicate (ONE definition serves q99/q104/q114 — empty
    * predicate — and q123's survivors-only variant).
    */
  private def phraseSql(docsWhere: String): String = {
    val joins = Phrase.zipWithIndex.drop(1).map { case (t, k) =>
      s"JOIN p p$k ON p$k.doc_id = p0.doc_id AND p$k.pos = p0.pos + $k AND p$k.t = '$t'"
    }.mkString("\n       |  ")
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(
       |    trim(lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))), '\\s+') AS a
       |  FROM documents$docsWhere),
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

  val q99Sql: String = phraseSql("")

  /** q100's conjunctive query terms + the integer idf scale, single-
    * sourced into both engines.
    */
  val RankTerms: Seq[String] = Seq("merge", "join", "batch")
  val IdfScale = 1000000L

  /** q100: ranked CONJUNCTIVE keyword retrieval — docs containing ALL
    * query terms, ranked by Σ_t tf(d,t)·idf6(t) where idf6 =
    * ⌊N·10⁶ / df(t)⌋ — an integer rarity weight (the N/df core of
    * idf without the logarithm, which is libm and not engine-portable
    * — the Q.scala exactness rule; the log only compresses the
    * ordering this corpus's 3-term query doesn't need). Ties break by
    * doc_id; top 100.
    *
    * Scale shape: postings filter to the query terms MAP-SIDE (the
    * q99 property — exchanges are bounded by the terms' document
    * frequency); df is a terms-sized aggregate joined back; N
    * attaches as a one-row broadcast (the q57/q86 lazy-count device,
    * exempt-listed in PlanShapeSpec); the conjunctive gate is one
    * per-doc aggregate with count(distinct term) == |terms|.
    */
  def q100(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = Tables(s, dir)
    // ONE scoring kernel shared with the persisted-index path
    // (Search.rankedIndexed) — the in-plan face derives postings from
    // the corpus, the index face reads the term-bucketed table; both
    // run the same rankedOverPostings (index == in-plan spec-pinned)
    graft.operators.Search.rankedOverPostings(
      graft.operators.Search.postingsFrame(
        t.documents, RankTerms, col("doc_id"), col("text")),
      RankTerms,
      t.documents.agg(count(lit(1)).as("nd")),
      IdfScale, 100)
  }

  val q100Sql: String = {
    val termList = RankTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(
       |    trim(lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))), '\\s+') AS a
       |  FROM documents),
       |post AS (
       |  SELECT doc_id, unnest(a) AS tok FROM toks),
       |tf AS (
       |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       |  FROM post WHERE tok IN ($termList) GROUP BY 1, 2),
       |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
       |sc AS (
       |  SELECT tf.doc_id,
       |    count(DISTINCT tf.tok) AS nt,
       |    CAST(sum(tf.tf) AS BIGINT) AS tf_total,
       |    CAST(sum(tf.tf * (n.nd * $IdfScale // dfq.df)) AS BIGINT) AS score6
       |  FROM tf JOIN dfq USING (tok) CROSS JOIN n
       |  GROUP BY tf.doc_id)
       |SELECT doc_id, tf_total, score6
       |FROM sc WHERE nt = ${RankTerms.length}
       |ORDER BY score6 DESC, doc_id LIMIT 100""".stripMargin
  }

  /** q104: q99 served from the PERSISTED index
    * ([[graft.operators.Search.buildIndex]] → `phraseIndexed`) under
    * the SAME oracle as q99 — the driver then independently verifies
    * the build → bucket-pruned-query path end-to-end, not just the
    * spec's indexed==in-plan parity pin. The index is built ONCE per
    * corpus (that is a persisted index's point — rebuilding per query
    * would misstate its cost) and version-stamped with the corpus
    * dir; the query face DEMANDS that version, so the freshness
    * contract runs inside the oracle path too, and a stale cached
    * table from another corpus triggers a rebuild instead of serving
    * wrong hits.
    */
  def q104(s: SparkSession, dir: String): DataFrame = {
    val (t, v) = ensureIndex(s, dir)
    graft.operators.Search.phraseIndexed(s, t, Phrase,
      expectCorpusVersion = Some(v))
  }

  /** q105: q100 served from the SAME persisted index as q104 (one
    * build serves both query faces — the point of a persisted index)
    * under q100's own oracle: the ranked path's bucket-pruned scan
    * and shared `rankedOverPostings` kernel get independent driver
    * verification too. nDocs is the corpus count rankedIndexed needs
    * (NOT derivable from postings — an empty doc has none); the
    * count is footer-cheap.
    */
  def q105(s: SparkSession, dir: String): DataFrame = {
    val (t, v) = ensureIndex(s, dir)
    graft.operators.Search.rankedIndexed(s, t, RankTerms,
      Tables(s, dir).documents.count(), IdfScale, 100,
      expectCorpusVersion = Some(v))
  }

  /** CONTENT-derived corpus identity: the path plus an md5 over the
    * parquet file listing (name, length, mtime). A corpus regenerated
    * IN PLACE at the same path (the driver regenerates /root/testdata
    * between rounds) changes the fingerprint, so a cached index built
    * from the old contents fails the freshness check and rebuilds —
    * the path alone would pass and silently serve stale postings.
    */
  private def corpusVersion(s: SparkSession, dir: String): String =
    graft.util.ContentVersion.of(s, dir)

  /** The q104/q105 shared build-once index table for `dir`: built
    * when absent or version-stamped for another corpus CONTENT
    * ([[corpusVersion]] — the freshness contract validates every
    * reuse; a stale cached table triggers a rebuild, never wrong
    * hits). Returns (table, version).
    */
  /** The build-once freshness scaffold every SearchQ index face
    * shares: rebuild when the table is absent or stamped for another
    * corpus CONTENT. A stale sibling maintainer LOCK from a
    * hard-killed earlier lifecycle is cleared first (these scratch
    * tables are single-process face property; buildIndex recreates
    * the table but deliberately never clears the sibling lock, so a
    * q123-style delete+compact lifecycle killed mid-mutation would
    * otherwise refuse forever).
    */
  private def ensureTable(s: SparkSession, table: String, v: String)
                         (build: => Unit): Unit = {
    val fresh = s.catalog.tableExists(table) &&
      graft.operators.Search.indexVersion(s, table).contains(v)
    if (!fresh) {
      if (s.catalog.tableExists(table)) {
        val lf = graft.util.PathLock.lockFile(
          graft.operators.Search.indexLocationOf(s, table))
        lf.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(lf, false)
        ()
      }
      build
    }
  }

  private def ensureIndex(s: SparkSession, dir: String): (String, String) = {
    val table = "graft_q104_postings"
    val v = corpusVersion(s, dir)
    ensureTable(s, table, v) {
      graft.operators.Search.buildIndex(Tables(s, dir).documents, table, 8,
        corpusVersion = Some(v))
    }
    (table, v)
  }

  /** q114: q99 served from an INCREMENTALLY MAINTAINED index — the
    * [[graft.operators.Search.maintainIndex]] path under q99's own
    * oracle: the index is BUILT from the even-doc_id half of the
    * corpus and brought to full coverage by a maintain batch carrying
    * the odd half (a delta-sized append — no rebuild, no corpus
    * re-tokenize), then the phrase query runs bucket-pruned against
    * the maintained table. Exactness of the maintained index ==
    * one-shot build is thereby driver-verified end-to-end, not just
    * spec-pinned; the final version stamp is the FULL corpus content
    * version and the query face demands it, so the freshness contract
    * covers maintained indexes too. Build+maintain amortize per
    * corpus CONTENT (the q104 device); tombstone deletion and crash
    * healing are spec-territory (they change the result set, which
    * the shared oracle must not).
    */
  def q114(s: SparkSession, dir: String): DataFrame = {
    val (t, v) = ensureMaintainedIndex(s, dir)
    graft.operators.Search.phraseIndexed(s, t, Phrase,
      expectCorpusVersion = Some(v))
  }

  private def ensureMaintainedIndex(s: SparkSession, dir: String): (String, String) = {
    import org.apache.spark.sql.functions.col
    val table = "graft_q114_postings"
    val v = corpusVersion(s, dir)
    ensureTable(s, table, v) {
      val docs = Tables(s, dir).documents
      graft.operators.Search.buildIndex(
        docs.filter(col("doc_id") % 2 === 0), table, 8,
        corpusVersion = Some(s"$v:bootstrap-even"))
      graft.operators.Search.maintainIndex(
        s, table, docs.filter(col("doc_id") % 2 === 1),
        batchId = s"$v:odd", newVersion = Some(v))
    }
    (table, v)
  }

  /** Victim predicate for the q123 RTBF face — [[Q.ForgetMod]], the
    * ONE definition q122 shares.
    */
  private def ForgetMod = Q.ForgetMod

  /** q123: the search index's RTBF path — tombstone THEN physical
    * reclaim — under q99's oracle: build the full-corpus index,
    * [[graft.operators.Search.deleteDocs]] every doc_id ≡ 0 mod
    * [[ForgetMod]], [[graft.operators.Search.compactIndex]] (the
    * rewrite bakes the deletes in and clears the log), then the
    * phrase query against the compacted table. Oracle = the q99
    * postings chain over the SURVIVING docs only — a victim hit
    * escaping the tombstone filter, a survivor's postings lost by
    * compaction, or a compaction baking partial state all diverge
    * the hash. Own scratch table (deleting on q104's/q114's shared
    * artifacts would corrupt those faces); delete+compact amortize
    * per corpus content (the q104 device).
    */
  def q123(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val table = "graft_q123_postings"
    val v = corpusVersion(s, dir)
    ensureTable(s, table, v) {
      val docs = Tables(s, dir).documents
      graft.operators.Search.buildIndex(docs, table, 8,
        corpusVersion = Some(s"$v:pre-delete"))
      // RTBF-request-sized by construction (ids, not rows)
      val victims = docs
        .filter(pmod(col("doc_id"), lit(ForgetMod)) === 0)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      graft.operators.Search.deleteDocs(s, table, victims)
      graft.operators.Search.compactIndex(s, table, newVersion = Some(v))
    }
    graft.operators.Search.phraseIndexed(s, table, Phrase,
      expectCorpusVersion = Some(v))
  }

  val q123Sql: String = phraseSql(s" WHERE doc_id % $ForgetMod <> 0")

  val entries: Seq[Entry] = Seq(
    Entry("q99_phrase_search", q99, Some(q99Sql)),
    Entry("q100_ranked_search", q100, Some(q100Sql)),
    Entry("q104_phrase_indexed", q104, Some(q99Sql)),
    Entry("q105_ranked_indexed", q105, Some(q100Sql)),
    Entry("q114_phrase_maintained", q114, Some(q99Sql)),
    Entry("q123_search_forget", q123, Some(q123Sql)))
}
