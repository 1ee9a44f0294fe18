package graft

import graft.queries.LmQ
import org.apache.spark.sql.functions._

/** Semantic envelopes for the corpus-model operators (q70–q72). The
  * exactness gate is the DuckDB oracle; these pin the properties the
  * oracle can't see — kernel behavior on synthetic corpora with known
  * structure, and invariants over the real tables.
  */
class LmQSpec extends SparkSpec {

  private val G = 1000000000L

  test("q70: total over documents, scores inside [0, 1e9], bigram counts exact") {
    val out = LmQ.q70(spark, sf).collect()
    val nDocs = Tables(spark, sf).documents.count()
    assert(out.length == nDocs, s"q70 dropped docs: ${out.length} != $nDocs")
    out.foreach { r =>
      val sc = r.getAs[Long]("lm_score9")
      assert(sc >= 0 && sc <= G, s"score out of range: $r")
      assert(r.getAs[Long]("n_bigrams") >= 0, s"negative bigrams: $r")
    }
    // n_bigrams is exactly tokens-1 summed over the corpus
    val expected = Tables(spark, sf).documents
      .select((size(split(trim(col("text")), "\\s+")) - 1).cast("long").as("nb"))
      .agg(sum(col("nb"))).head.getLong(0)
    assert(out.map(_.getAs[Long]("n_bigrams")).sum == expected)
  }

  test("lmScore kernel: formulaic docs outscore unique-token docs") {
    import spark.implicits._
    // "a b" repeated: its one bigram is 100% of the a-prefix mass in
    // docs 1..3; doc 4's bigrams are all distinct one-offs sharing
    // prefixes with nothing, so every p9 is c_ab/c_a = 1/1 -> 1e9 too.
    // Make doc 4 genuinely atypical: reuse prefix tokens of the
    // formulaic docs with DIFFERENT continuations, so c_ab=1 under a
    // large c_a.
    val docs = Seq(
      (1L, "a b a b a b"), (2L, "a b a b"), (3L, "a b"),
      (4L, "a x a y a z")).toDF("doc_id", "text")
    val m = LmQ.lmScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lm_score9")).toMap
    assert(m(1L) > m(4L) && m(3L) > m(4L),
      s"formulaic docs must outscore the atypical one: $m")
    // single-token doc: zero bigrams, visible zero score
    val single = LmQ.lmScore(Seq((9L, "solo")).toDF("doc_id", "text")).head
    assert(single.getAs[Long]("n_bigrams") == 0 &&
      single.getAs[Long]("lm_score9") == 0)
  }

  test("q71: chunks reconstruct every document exactly (coverage, overlap, ids)") {
    val byDoc = LmQ.q71(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id")).view.mapValues(
        _.sortBy(_.getAs[Long]("chunk_id"))).toMap
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), lower(trim(regexp_replace(col("text"), "\\s+", " ")))
        .as("norm")).collect()
    assert(byDoc.keySet == docs.map(_.getAs[Long]("doc_id")).toSet)
    docs.foreach { d =>
      val toks = d.getAs[String]("norm").split(" ", -1).toSeq
      val chunks = byDoc(d.getAs[Long]("doc_id"))
      // ids are 0..k-1; starts advance by exactly the stride
      chunks.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Long]("chunk_id") == i)
        assert(c.getAs[Long]("start_tok") == 1 + 24L * i)
        assert(c.getAs[Long]("n_tok") ==
          c.getAs[String]("chunk").split(" ", -1).length)
      }
      // every chunk but the last is emitted only because its
      // predecessor was full-width, so the overlap is always W-S=8:
      // dropping it re-concatenates to the exact token stream
      val rebuilt = chunks.head.getAs[String]("chunk").split(" ", -1).toSeq ++
        chunks.tail.flatMap(_.getAs[String]("chunk").split(" ", -1).drop(8).toSeq)
      assert(rebuilt == toks, s"doc ${d.getAs[Long]("doc_id")} not covered")
    }
  }

  test("dupNgrams kernel: verbatim duplicates score 1e9, disjoint docs 0") {
    import spark.implicits._
    val text = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, text), (2L, text),                          // exact pair
      (3L, "alpha beta gamma delta epsilon zeta")      // disjoint
    ).toDF("doc_id", "text")
    val m = LmQ.dupNgrams(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_frac9")).toMap
    assert(m(1L) == G && m(2L) == G, s"verbatim dup must be 1e9: $m")
    assert(m(3L) == 0L, s"disjoint doc must be 0: $m")
  }

  test("q72: totality and bounds over the real corpus") {
    val out = LmQ.q72(spark, sf).collect()
    assert(out.length == Tables(spark, sf).documents.count())
    out.foreach { r =>
      val ns = r.getAs[Long]("n_shingles")
      val nd = r.getAs[Long]("n_dup")
      val fr = r.getAs[Long]("dup_frac9")
      assert(ns >= 1 && nd >= 0 && nd <= ns, s"bad counts: $r")
      assert(fr >= 0 && fr <= G, s"frac out of range: $r")
      assert(fr == nd * G / ns, s"frac != fixed-point ratio: $r")
    }
  }

  test("q73: per-cluster quota, determinism, no duplicate picks") {
    val out = graft.queries.VecQ.q73(spark, sf).collect()
    val perCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    perCluster.foreach { case (c, rows) =>
      assert(rows.length <= 8, s"cluster $c over quota: ${rows.length}")
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq ==
        (1L to rows.length).toSeq, s"cluster $c ranks not dense")
    }
    val ids = out.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == ids.length, "a vector sampled twice")
    // deterministic: a second run picks the identical sample
    val again = graft.queries.VecQ.q73(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("trigramScore: all four backoff branches on hand-computed fixtures") {
    import spark.implicits._
    // model (the ref side): unigrams a:2 b:2 c:2 d:1 e:1 (ctot=8),
    // bigrams "a b":2 "b c":2 "c a":1 "d e":1, trigrams "a b c":2
    // "b c a":1 "c a b":1
    val ref = Seq((0L, "a b c a b c"), (2L, "d e")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c"),   // trigram hit: 2e9 DIV 2 = 1e9
      (3L, "x a b c"), // "x a b" backs off to bigram "a b": 2e9*4 DIV 2 DIV 10 = 4e8; "a b c" = 1e9
      (5L, "z z d"),   // unigram-only "d": 1e9*16 DIV 8 DIV 100 = 2e7
      (7L, "q q q"),   // fully unseen: 0
      (9L, "a")        // no trigram at all: totality row with 0s
    ).toDF("doc_id", "text")
    val m = LmQ.trigramScore(docs, ref).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Long]("bo_score9"))).toMap
    assert(m(1L) == (1L, 1000000000L), s"trigram branch: ${m(1L)}")
    assert(m(3L) == (2L, (400000000L + 1000000000L) / 2), s"mixed: ${m(3L)}")
    assert(m(5L) == (1L, 20000000L), s"unigram branch: ${m(5L)}")
    assert(m(7L) == (1L, 0L), s"unseen branch: ${m(7L)}")
    assert(m(9L) == (0L, 0L), s"totality row: ${m(9L)}")
  }

  test("q86: total over documents, scores in [0, 1e9], seen docs outscore unseen") {
    val out = LmQ.q86(spark, sf).collect()
    assert(out.length == Tables(spark, sf).documents.count())
    out.foreach { r =>
      val sc = r.getAs[Long]("bo_score9")
      assert(sc >= 0 && sc <= G, s"score out of range: $r")
    }
    // the model's own docs (even ids) score higher on average than the
    // held-out odd ones — the shared vocabulary keeps odd docs well
    // above zero, but every even trigram is by construction a model hit
    val (even, odd) = out.partition(_.getAs[Long]("doc_id") % 2 == 0)
    def mean(rs: Array[org.apache.spark.sql.Row]): Double = {
      val xs = rs.filter(_.getAs[Long]("n_trigrams") > 0)
      xs.map(_.getAs[Long]("bo_score9").toDouble).sum / xs.length
    }
    assert(mean(even) > mean(odd),
      s"model docs must outscore held-out docs: ${mean(even)} vs ${mean(odd)}")
  }
}
