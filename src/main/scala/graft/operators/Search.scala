package graft.operators

import graft.functions.TextOps.{normText, tokens}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * corpus. A persisted deployment materializes the same frame
  * bucketed by term via [[buildIndex]] and queries it with
  * [[phraseIndexed]]/[[rankedIndexed]] — identical results
  * (spec-pinned), bucket-pruned IO, no per-query tokenize.
  *
  * Matches may overlap ("a a a" contains the phrase "a a" twice) —
  * the standard positional-search convention, pinned in the spec.
  */
object Search {

  /** Result frame + the handle to the internal postings cache entry
    * (the [[SimJoin.Scoped]] contract): release once `df` is
    * materialized; lazy use after release recomputes the postings.
    */
  final case class Scoped(df: DataFrame,
                          private[graft] val cached: DataFrame) {
    def release(): Unit = { cached.unpersist(); () }
  }

  /** Normalize query terms the same way postings are built — a raw
    * "Batch" would match nothing, silently. A term with interior
    * whitespace can never be one token: refuse it rather than return
    * an empty result.
    */
  private def normTerms(terms: Seq[String]): Seq[String] = {
    require(terms.nonEmpty, "phrase needs at least one term")
    val qs = terms.map(_.trim.toLowerCase)
    require(qs.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"phrase terms must be single non-empty tokens, got $terms")
    qs
  }

  /** The query-term postings frame (doc_id, pos, t), term-filtered
    * map-side — one definition shared by the in-plan query, the
    * index writer, and the cache probe in the spec.
    */
  private[graft] def postingsFrame(docs: DataFrame, qs: Seq[String],
                                   idCol: Column, textCol: Column): DataFrame = {
    val base = docs
      .select(idCol.as("doc_id"),
        posexplode(tokens(normText(coalesce(textCol, lit(""))))).as(Seq("i", "t")))
      .select(col("doc_id"), (col("i") + 1).cast("long").as("pos"), col("t"))
    if (qs.isEmpty) base else base.filter(col("t").isin(qs.distinct: _*))
  }

  /** The phrase match + per-doc collapse over any postings frame
    * (in-plan or read back from a persisted index).
    */
  private def phraseOverPostings(post: DataFrame, qs: Seq[String]): DataFrame = {
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

  /** Documents containing `terms` as a consecutive phrase:
    * (doc_id, n_phrase, first_pos), positions 1-based, ordered by
    * doc_id. The k-th term joins on pos = p0 + k — a chain of
    * equi-joins each bounded by that term's postings. Lazy form: the
    * internal postings cache entry outlives the call — a long-lived
    * service querying many different corpora should use
    * [[phraseScoped]] and release after materializing.
    */
  def phrase(docs: DataFrame, terms: Seq[String],
             idCol: Column = col("doc_id"),
             textCol: Column = col("text")): DataFrame =
    phraseScoped(docs, terms, idCol, textCol).df

  /** [[phrase]] with the cache handle returned ([[Scoped]]). */
  def phraseScoped(docs: DataFrame, terms: Seq[String],
                   idCol: Column = col("doc_id"),
                   textCol: Column = col("text")): Scoped = {
    val qs = normTerms(terms)
    // CACHED (the q86/SimJoin rationale): one consumer per query term
    // would otherwise re-scan and re-tokenize the corpus k times for
    // a k-term phrase (different filters defeat plan-level reuse).
    // The frame is query-term postings only — document-frequency-
    // sized. Lifecycle: the returned Scoped.release.
    val post = postingsFrame(docs, qs, idCol, textCol).cache()
    Scoped(phraseOverPostings(post, qs), post)
  }

  /** PERSIST the positional postings index: the full (doc_id, pos, t)
    * frame written once as a TERM-BUCKETED, term-sorted table
    * ([[graft.sources.Bucketed]]). The in-plan operators above
    * re-derive postings from the corpus per query — correct, but at
    * 100 TB every phrase query would re-scan and re-tokenize the
    * whole corpus. Against the index, a query's term filter prunes to
    * the BUCKETS holding its terms before any IO (Spark's bucket
    * pruning on equality/IN over the bucket column), so a repeated
    * query reads ~terms/buckets of the index instead of the corpus,
    * and the tokenize cost is paid once at build time. The index
    * write is one shuffle (the bucketing exchange), once.
    */
  def buildIndex(docs: DataFrame, table: String, buckets: Int,
                 idCol: Column = col("doc_id"),
                 textCol: Column = col("text"),
                 corpusVersion: Option[String] = None): Unit = {
    val spark = docs.sparkSession
    // ORPHANED-LOCATION recovery: with the default in-memory catalog,
    // the catalog dies with the JVM but a managed table's warehouse
    // directory does not — the next session's create then refuses
    // with LOCATION_ALREADY_EXISTS. A location the current catalog
    // has no table for is orphaned WITHIN THIS SESSION'S VIEW, so
    // clear it before the write — but ONLY in the layout the path
    // derivation below is actually correct for: an unqualified name
    // resolved in the `default` database (<warehouse>/<table>). A
    // qualified name or a non-default current database would make the
    // string-derived path point at a DIFFERENT table's data — there
    // we skip the cleanup and let saveAsTable fail with Spark's own
    // actionable error instead of deleting on a guess. (Like every
    // index maintainer here, the build assumes a single writer; a
    // concurrent JVM sharing the warehouse dir must coordinate
    // externally.)
    val cleanableLayout = !table.contains(".") &&
      spark.catalog.currentDatabase == "default"
    if (cleanableLayout && !spark.catalog.tableExists(table)) {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val loc = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(wh),
        table.toLowerCase(java.util.Locale.ROOT))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) { fs.delete(loc, true); () }
    }
    graft.sources.Bucketed.write(
      postingsFrame(docs, Nil, idCol, textCol), table, "t", buckets)
    corpusVersion.foreach { v =>
      require(!v.contains("'"),
        s"corpusVersion must not contain a quote: $v")
      docs.sparkSession.sql(
        s"ALTER TABLE $table SET TBLPROPERTIES ('$VersionProp' = '$v')")
      ()
    }
  }

  /** Table property recording which corpus snapshot a [[buildIndex]]
    * table was built from — the FRESHNESS CONTRACT: the index is a
    * point-in-time derivation, and serving queries for a corpus it
    * does not match silently returns stale hits/misses. The version
    * string is the CALLER's snapshot identity (e.g. the snapshot
    * path + publish version, or a manifest digest) — whatever the
    * deployment uses to name "the corpus as of this index build".
    */
  private val VersionProp = "graft.corpus.version"

  /** The corpus version recorded on a [[buildIndex]] table, if any. */
  def indexVersion(spark: SparkSession, table: String): Option[String] =
    spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .collectFirst { case r if r.getString(0) == VersionProp => r.getString(1) }

  /** Refuse to serve an index that does not match the corpus the
    * caller is querying: a recorded version different from `want`, or
    * NO recorded version when the caller demands one (an unverifiable
    * index is treated as stale, not trusted). `None` skips the check —
    * the pre-contract behavior for callers that manage freshness
    * elsewhere.
    */
  private def checkVersion(spark: SparkSession, table: String,
                           expect: Option[String]): Unit =
    expect.foreach { want =>
      val got = indexVersion(spark, table)
      require(got.contains(want),
        s"search index $table was built from corpus version " +
          s"${got.getOrElse("<unrecorded>")} but the query expects '$want' " +
          "— rebuild with Search.buildIndex over the current corpus " +
          "(stale index hits/misses would otherwise be served silently)")
    }

  /** [[phrase]] served from a [[buildIndex]] table: identical output
    * (spec-pinned), no corpus scan, no tokenize — the scan reads only
    * the query terms' buckets. `expectCorpusVersion` enforces the
    * freshness contract ([[indexVersion]]).
    */
  def phraseIndexed(spark: SparkSession, table: String,
                    terms: Seq[String],
                    expectCorpusVersion: Option[String] = None): DataFrame = {
    val qs = normTerms(terms)
    checkVersion(spark, table, expectCorpusVersion)
    phraseOverPostings(
      spark.table(table).filter(col("t").isin(qs.distinct: _*)), qs)
  }

  /** Ranked conjunctive retrieval over any postings frame — the q100
    * scoring as one kernel shared by the in-plan query and the index
    * path: docs containing ALL query terms, scored
    * Σ_t tf(d,t)·⌊N·idfScale/df(t)⌋ (integer rarity weight — the N/df
    * core of idf without the non-portable logarithm), ties by doc_id,
    * top `limit`. `nDocs` is a ONE-ROW frame with a single BIGINT
    * column `nd` (the corpus document count — NOT derivable from
    * postings: an empty doc has none), attached as a broadcast.
    */
  def rankedOverPostings(post: DataFrame, terms: Seq[String],
                         nDocs: DataFrame, idfScale: Long,
                         limit: Int): DataFrame = {
    val qs = normTerms(terms).distinct
    val tf = post.filter(col("t").isin(qs: _*))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "t")
      .crossJoin(broadcast(nDocs))
      .withColumn("idf6", expr(s"nd * ${idfScale}L DIV df"))
      .groupBy(col("doc_id"))
      .agg(
        count_distinct(col("t")).as("nt"),
        sum(col("tf")).as("tf_total"),
        sum(col("tf") * col("idf6")).as("score6"))
      .filter(col("nt") === qs.length)
      .select(col("doc_id"), col("tf_total"), col("score6"))
      .orderBy(col("score6").desc, col("doc_id"))
      .limit(limit)
  }

  /** [[rankedOverPostings]] served from a [[buildIndex]] table.
    * `expectCorpusVersion` enforces the freshness contract
    * ([[indexVersion]]).
    */
  def rankedIndexed(spark: SparkSession, table: String,
                    terms: Seq[String], nDocs: Long, idfScale: Long,
                    limit: Int,
                    expectCorpusVersion: Option[String] = None): DataFrame = {
    checkVersion(spark, table, expectCorpusVersion)
    rankedOverPostings(spark.table(table), terms,
      spark.range(1).select(lit(nDocs).cast("long").as("nd")),
      idfScale, limit)
  }
}
