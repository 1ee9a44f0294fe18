package graft

import graft.operators.Search
import org.apache.spark.sql.DataFrame

/** Fixture pins for the positional phrase kernel (q99): overlap
  * convention, multi-term chains, and the plan's term-filtered
  * postings. The oracle carries corpus-level exactness.
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private def run(d: DataFrame, terms: String*): Map[Long, (Long, Long)] =
    Search.phrase(d, terms).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("two-term phrase: counts, positions, overlap convention, case/whitespace normalization") {
    val d = docs(
      1L -> "x batch stream y batch stream",   // two separate matches
      2L -> "batch batch stream",              // one (at pos 2)
      3L -> "stream batch",                    // reversed: none
      4L -> "  Batch\tSTREAM extra",           // normalization -> pos 1
      5L -> "batch",                           // incomplete
      6L -> "")
    val got = run(d, "batch", "stream")
    assert(got == Map(
      1L -> (2L, 2L),
      2L -> (1L, 2L),
      4L -> (1L, 1L)), s"$got")
  }

  test("repeated-term phrase overlaps count: 'a a a a' holds 'a a' three times") {
    val got = run(docs(1L -> "a a a a", 2L -> "a b a"), "a", "a")
    assert(got == Map(1L -> (3L, 1L)), s"$got")
  }

  test("three-term chain: only full consecutive runs match") {
    val d = docs(
      1L -> "q batch stream merge w",
      2L -> "batch stream x merge",        // broken chain
      3L -> "batch stream merge batch stream merge")
    val got = run(d, "batch", "stream", "merge")
    assert(got == Map(1L -> (1L, 2L), 3L -> (2L, 1L)), s"$got")
  }

  test("fuzz: phrase counts equal a driver scan over 200 random docs and phrases") {
    val rnd = new scala.util.Random(99100)
    val vocab = Vector("a", "b", "c", "d")   // tiny vocab -> dense matches
    val rows = (1L to 200L).map { id =>
      id -> (0 until 3 + rnd.nextInt(25))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val d = docs(rows: _*)
    (1 to 5).foreach { _ =>
      val plen = 1 + rnd.nextInt(3)
      val phrase = (0 until plen).map(_ => vocab(rnd.nextInt(vocab.length)))
      val got = run(d, phrase: _*)
      val want = rows.flatMap { case (id, text) =>
        val toks = text.split(" ").toSeq
        val hits = (0 to toks.length - plen)
          .filter(i => toks.slice(i, i + plen) == phrase)
        if (hits.isEmpty) None
        else Some(id -> (hits.length.toLong, hits.min.toLong + 1))
      }.toMap
      assert(got == want, s"phrase $phrase: got $got want $want")
    }
  }

  test("q99 plan: postings are term-filtered map-side — exchanges carry no strings") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, StringType}
    // the LAZY operator form (the registered q99 wrapper returns an
    // eagerly checkpointed frame — LogicalRDD plan)
    val sc = Search.phraseScoped(Tables(spark, sf).documents,
      queries.SearchQ.Phrase)
    try {
      val qe = sc.df.queryExecution
      val plan = qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty)
      exchanges.foreach(e =>
        assert(!e.output.exists(a => a.dataType == StringType ||
          a.dataType.isInstanceOf[ArrayType]),
          s"a q99 exchange carries strings/arrays: ${e.output}"))
    } finally sc.release()
  }

  test("scoped cache: release drops the postings entry; the q99 wrapper leaves none behind") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.storage.StorageLevel
    val sc = Search.phraseScoped(docs(1L -> "batch stream x"), Seq("batch", "stream"))
    val out = sc.df.localCheckpoint()
    assert(sc.cached.storageLevel != StorageLevel.NONE)
    sc.release()
    assert(sc.cached.storageLevel == StorageLevel.NONE)
    assert(out.count() == 1)
    assert(queries.SearchQ.q99(spark, sf).count() >= 0)
    val probe = Search.postingsFrame(Tables(spark, sf).documents,
      queries.SearchQ.Phrase.map(_.trim.toLowerCase),
      col("doc_id"), col("text"))
    assert(probe.storageLevel == StorageLevel.NONE,
      "q99 leaked its postings cache entry into the session")
  }

  test("persisted index: phraseIndexed == phrase, rankedIndexed == q100, scan is bucket-pruned with no tokenize") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.functions.{col, count, lit}
    val d = docs(
      1L -> "x batch stream y batch stream merge",
      2L -> "batch batch stream",
      3L -> "stream batch merge join",
      4L -> "  Batch\tSTREAM extra merge join batch",
      5L -> "merge join batch nothing else",
      6L -> "")
    val table = "graft_searchspec_postings"
    Search.buildIndex(d, table, 8)
    // phrase: indexed == in-plan on every term combination exercised
    for (terms <- Seq(Seq("batch", "stream"), Seq("merge"), Seq("batch", "stream", "merge"))) {
      val inPlan = run(d, terms: _*)
      val idx = Search.phraseIndexed(spark, table, terms).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(idx == inPlan, s"terms $terms: indexed $idx != in-plan $inPlan")
    }
    // ranked: indexed == the in-plan kernel over the same corpus
    val nDocs = d.count()
    val terms = Seq("merge", "join", "batch")
    val inPlanRanked = Search.rankedOverPostings(
      Search.postingsFrame(d, terms, col("doc_id"), col("text")),
      terms, d.agg(count(lit(1)).as("nd")),
      queries.SearchQ.IdfScale, 100).collect().map(_.toSeq).toSeq
    val idxRanked = Search.rankedIndexed(spark, table, terms, nDocs,
      queries.SearchQ.IdfScale, 100).collect().map(_.toSeq).toSeq
    assert(idxRanked == inPlanRanked)
    // plan over the index: the term filter prunes BUCKETS before IO
    // (SelectedBucketsCount < 8) and nothing re-tokenizes (no Generate)
    val qe = Search.phraseIndexed(spark, table, Seq("batch", "stream"))
      .queryExecution
    val plan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(!plan.exists(_.getClass.getSimpleName.contains("Generate")),
      "indexed query must not re-tokenize the corpus")
    val scans = plan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "no file scan over the index table")
    scans.foreach { f =>
      val bs = f.optionalBucketSet
      assert(bs.isDefined, "bucket pruning did not engage on the term filter")
      assert(bs.get.cardinality() < 8,
        s"expected pruned buckets, got ${bs.get.cardinality()} of 8")
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  // location derivation for the maintenance tests: unqualified name in
  // the default database (the layout the whole spec uses)
  private def loc(table: String): String =
    new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir")),
      table.toLowerCase(java.util.Locale.ROOT)).toString

  private val fullDocs = Seq(
    1L -> "x batch stream y batch stream merge",
    2L -> "batch batch stream",
    3L -> "stream batch merge join",
    4L -> "batch stream extra merge join batch",
    5L -> "merge join batch nothing else",
    6L -> "batch stream closing")

  test("maintainIndex: build half + two maintain batches == one-shot index, version restamped") {
    val table = "graft_searchspec_maintained"
    val d = docs(fullDocs: _*)
    try {
      Search.buildIndex(d.filter("doc_id <= 2"), table, 8,
        corpusVersion = Some("v:bootstrap"))
      Search.maintainIndex(spark, table, d.filter("doc_id IN (3, 4)"),
        batchId = "b1", newVersion = Some("v:b1"))
      Search.maintainIndex(spark, table, d.filter("doc_id >= 5"),
        batchId = "b2", newVersion = Some("v:b2"))
      assert(Search.indexVersion(spark, table).contains("v:b2"))
      for (terms <- Seq(Seq("batch", "stream"), Seq("merge", "join"))) {
        val inPlan = run(d, terms: _*)
        val idx = Search.phraseIndexed(spark, table, terms,
          expectCorpusVersion = Some("v:b2")).collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        assert(idx == inPlan, s"terms $terms: maintained $idx != in-plan $inPlan")
      }
      import org.apache.spark.sql.functions.{col, count, lit}
      val terms = Seq("merge", "join", "batch")
      val inPlanRanked = Search.rankedOverPostings(
        Search.postingsFrame(d, terms, col("doc_id"), col("text")),
        terms, d.agg(count(lit(1)).as("nd")),
        queries.SearchQ.IdfScale, 100).collect().map(_.toSeq).toSeq
      val idxRanked = Search.rankedIndexed(spark, table, terms, d.count(),
        queries.SearchQ.IdfScale, 100).collect().map(_.toSeq).toSeq
      assert(idxRanked == inPlanRanked)
      // a completed maintain leaves no pending marker and no lock
      val fs = new org.apache.hadoop.fs.Path(loc(table))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${loc(table)}._graft_pending")))
      assert(!fs.exists(graft.util.PathLock.lockFile(loc(table))))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("deleteDocs tombstones without rewrite; compactIndex applies and clears them, keeping the version") {
    val table = "graft_searchspec_deleted"
    val d = docs(fullDocs: _*)
    try {
      Search.buildIndex(d, table, 8, corpusVersion = Some("v:full"))
      Search.deleteDocs(spark, table, Seq(1L, 4L))
      Search.deleteDocs(spark, table, Seq(4L, 5L))   // monotone accumulation
      assert(Search.deletedIds(spark, table).get.collect()
        .map(_.getLong(0)).toSet == Set(1L, 4L, 5L))
      val live = d.filter("doc_id NOT IN (1, 4, 5)")
      val want = run(live, "batch", "stream")
      val got = Search.phraseIndexed(spark, table, Seq("batch", "stream"),
        expectCorpusVersion = Some("v:full")).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == want, s"tombstoned index $got != live corpus $want")
      // the ranked face anti-filters too
      val rg = Search.rankedIndexed(spark, table, Seq("batch"), live.count(),
        queries.SearchQ.IdfScale, 100).collect().map(_.getLong(0)).toSet
      assert(!rg.exists(Set(1L, 4L, 5L)), s"ranked served a tombstoned doc: $rg")
      // compaction: physical removal, log cleared, version survives
      Search.compactIndex(spark, table)
      assert(Search.deletedIds(spark, table).isEmpty, "compaction must clear the tombstone log")
      assert(Search.indexVersion(spark, table).contains("v:full"))
      val got2 = Search.phraseIndexed(spark, table, Seq("batch", "stream"),
        expectCorpusVersion = Some("v:full")).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got2 == want)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("maintainIndex crash heal: replaying an interrupted batch dedupes to the one-shot index") {
    val table = "graft_searchspec_crash"
    val d = docs(fullDocs: _*)
    try {
      Search.buildIndex(d.filter("doc_id <= 4"), table, 8)
      val batch = d.filter("doc_id >= 5")
      // simulate the crashed attempt: marker written, PART of the
      // batch's postings landed (doc 5 only), then death
      val fs = new org.apache.hadoop.fs.Path(loc(table))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val pending = new org.apache.hadoop.fs.Path(s"${loc(table)}._graft_pending")
      val o = fs.create(pending, true)
      try o.write("b-crash".getBytes("UTF-8")) finally o.close()
      import org.apache.spark.sql.functions.col
      graft.sources.Bucketed.write(
        Search.postingsFrame(d.filter("doc_id = 5"), Nil,
          col("doc_id"), col("text")),
        table, "t", 8, mode = org.apache.spark.sql.SaveMode.Append)
      // the replay of the SAME batch self-heals (append + distinct)
      Search.maintainIndex(spark, table, batch, batchId = "b-crash")
      assert(!fs.exists(pending))
      val want = run(d, "batch", "stream")
      val got = Search.phraseIndexed(spark, table, Seq("batch", "stream"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == want, s"healed index $got != one-shot $want")
      // postings hold no duplicates at all after the heal
      val dup = spark.table(table).groupBy("doc_id", "pos", "t")
        .count().filter("count > 1").count()
      assert(dup == 0L, s"$dup duplicate postings survived the heal")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("compactIndex refuses an interrupted batch's marker; the heal preserves the version stamp") {
    val table = "graft_searchspec_compactguard"
    val d = docs(fullDocs: _*)
    try {
      Search.buildIndex(d.filter("doc_id <= 4"), table, 8,
        corpusVersion = Some("v-keep"))
      val fs = new org.apache.hadoop.fs.Path(loc(table))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val pending = new org.apache.hadoop.fs.Path(s"${loc(table)}._graft_pending")
      val o = fs.create(pending, true)
      try o.write("b-int".getBytes("UTF-8")) finally o.close()
      import org.apache.spark.sql.functions.col
      graft.sources.Bucketed.write(
        Search.postingsFrame(d.filter("doc_id = 5"), Nil,
          col("doc_id"), col("text")),
        table, "t", 8, mode = org.apache.spark.sql.SaveMode.Append)
      // compaction must NOT bake the partial batch in and erase the
      // marker — the replay would then double-append
      val e = intercept[IllegalStateException] {
        Search.compactIndex(spark, table)
      }
      assert(e.getMessage.contains("b-int"), e.getMessage)
      // the mandated replay heals — and with newVersion = None the
      // compaction inside the heal must PRESERVE the prior stamp
      Search.maintainIndex(spark, table, d.filter("doc_id >= 5"),
        batchId = "b-int")
      assert(Search.indexVersion(spark, table).contains("v-keep"),
        s"heal lost the version stamp: ${Search.indexVersion(spark, table)}")
      val want = run(d, "batch", "stream")
      val got = Search.phraseIndexed(spark, table, Seq("batch", "stream"),
        expectCorpusVersion = Some("v-keep")).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == want, s"healed $got != one-shot $want")
      // an EMPTY marker (append never started) clears and compaction runs
      fs.create(pending, true).close()
      Search.compactIndex(spark, table)
      assert(!fs.exists(pending))
      assert(Search.indexVersion(spark, table).contains("v-keep"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("maintainIndexUnlocked keepMarker: the marker survives the heal's table recreation") {
    val table = "graft_searchspec_keepmarker"
    val d = docs(fullDocs: _*)
    try {
      Search.buildIndex(d.filter("doc_id <= 4"), table, 8)
      val fs = new org.apache.hadoop.fs.Path(loc(table))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val pending = new org.apache.hadoop.fs.Path(s"${loc(table)}._graft_pending")
      val o = fs.create(pending, true)
      try o.write("k1".getBytes("UTF-8")) finally o.close()
      import org.apache.spark.sql.functions.col
      graft.sources.Bucketed.write(
        Search.postingsFrame(d.filter("doc_id = 5"), Nil,
          col("doc_id"), col("text")),
        table, "t", 8, mode = org.apache.spark.sql.SaveMode.Append)
      // the sink's heal path: compaction recreates the table, but the
      // KEPT marker must be re-created — its ledger entry has not
      // landed yet, and without the marker a crash before the ledger
      // write would replay the batch as fresh (double-append)
      Search.maintainIndexUnlocked(spark, table, d.filter("doc_id >= 5"),
        batchId = "k1", idCol = col("doc_id"), textCol = col("text"),
        newVersion = None, keepMarker = true)
      assert(Search.pendingBatchId(spark, table).contains("k1"),
        "kept marker must survive the heal compaction")
      Search.clearPendingMarker(spark, table)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("maintainIndex refusals: foreign marker, tombstoned re-add, held lock; empty marker tolerated") {
    val table = "graft_searchspec_refuse"
    val d = docs(fullDocs: _*)
    try {
      Search.buildIndex(d.filter("doc_id <= 4"), table, 8)
      val fs = new org.apache.hadoop.fs.Path(loc(table))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val pending = new org.apache.hadoop.fs.Path(s"${loc(table)}._graft_pending")
      // a marker from a DIFFERENT batch refuses with the remedy
      val o = fs.create(pending, true)
      try o.write("someone-else".getBytes("UTF-8")) finally o.close()
      val e = intercept[IllegalStateException] {
        Search.maintainIndex(spark, table, d.filter("doc_id = 5"), "mine")
      }
      assert(e.getMessage.contains("someone-else") &&
        e.getMessage.contains("compactIndex"), e.getMessage)
      // an EMPTY marker is the crashed-before-id-write case: nothing
      // was appended, so the maintain proceeds
      val o2 = fs.create(pending, true)
      o2.close()
      Search.maintainIndex(spark, table, d.filter("doc_id = 5"), "b5")
      assert(!fs.exists(pending))
      // re-adding a tombstoned doc refuses loudly
      Search.deleteDocs(spark, table, Seq(3L))
      val e2 = intercept[IllegalArgumentException] {
        Search.maintainIndex(spark, table, d.filter("doc_id = 3"), "readd")
      }
      assert(e2.getMessage.contains("compactIndex"), e2.getMessage)
      // whole-cycle single-writer: a held location lock fails fast
      val lfs = graft.util.PathLock.lockFile(loc(table))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.util.PathLock.acquire(lfs, loc(table), 0L, "test")
      try {
        val e3 = intercept[IllegalStateException] {
          Search.maintainIndex(spark, table, d.filter("doc_id = 6"), "b6")
        }
        assert(e3.getMessage.contains("lock"), e3.getMessage)
        val e4 = intercept[IllegalStateException] {
          Search.deleteDocs(spark, table, Seq(6L))
        }
        assert(e4.getMessage.contains("lock"), e4.getMessage)
      } finally graft.util.PathLock.release(lfs, loc(table))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("index freshness: recorded version serves; mismatch and unrecorded refuse; None skips") {
    val d = docs(1L -> "alpha beta", 2L -> "beta gamma")
    val table = "graft_searchspec_versioned"
    Search.buildIndex(d, table, 4, corpusVersion = Some("snap-v7"))
    try {
      assert(Search.indexVersion(spark, table).contains("snap-v7"))
      // matching expectation serves normally (both faces)
      assert(Search.phraseIndexed(spark, table, Seq("beta"),
        expectCorpusVersion = Some("snap-v7")).count() == 2)
      assert(Search.rankedIndexed(spark, table, Seq("beta"), 2L,
        queries.SearchQ.IdfScale, 10,
        expectCorpusVersion = Some("snap-v7")).count() == 2)
      // a stale index refuses loudly, naming both versions
      val e = intercept[IllegalArgumentException] {
        Search.phraseIndexed(spark, table, Seq("beta"),
          expectCorpusVersion = Some("snap-v8"))
      }
      assert(e.getMessage.contains("snap-v7") && e.getMessage.contains("snap-v8"),
        e.getMessage)
      val er = intercept[IllegalArgumentException] {
        Search.rankedIndexed(spark, table, Seq("beta"), 2L,
          queries.SearchQ.IdfScale, 10, expectCorpusVersion = Some("snap-v8"))
      }
      assert(er.getMessage.contains("rebuild"), er.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
    // an UNVERSIONED index refuses a versioned expectation (cannot be
    // verified -> treated as stale), but serves with no expectation
    val t2 = "graft_searchspec_unversioned"
    Search.buildIndex(d, t2, 4)
    try {
      assert(Search.indexVersion(spark, t2).isEmpty)
      assert(Search.phraseIndexed(spark, t2, Seq("beta")).count() == 2)
      val e2 = intercept[IllegalArgumentException] {
        Search.phraseIndexed(spark, t2, Seq("beta"),
          expectCorpusVersion = Some("snap-v7"))
      }
      assert(e2.getMessage.contains("<unrecorded>"), e2.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t2")
  }
}
