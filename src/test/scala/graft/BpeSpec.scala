package graft

import graft.functions.expressions.Bpe
import graft.queries.TextQ
import org.apache.spark.sql.functions._

/** BPE has no SQL oracle (an iterative data-dependent merge loop is
  * not expressible in DuckDB), so exactness is pinned here instead:
  * hand-computed merge tables and token counts, plus determinism of
  * the trained vocab.
  */
class BpeSpec extends SparkSpec {

  test("train: learns the hand-computed merges with deterministic tie-breaks") {
    // corpus "ab ab ab": pairs (a,b) and (b,</w>) both occur 3 times;
    // the lexicographic tie-break picks (a,b); after that merge the
    // only pair is (ab,</w>)
    val v = Bpe.train(Seq("ab ab", "ab"), numMerges = 5)
    assert(v.merges == Seq(("a", "b"), ("ab", Bpe.EndOfWord)),
      v.merges.toString)
    // no pair repeats -> nothing learned
    assert(Bpe.train(Seq("xy"), 5).merges.isEmpty)
  }

  test("count: fixture-exact token counts under a manual vocab") {
    import spark.implicits._
    val vocab = Bpe.Vocab(Seq(("a", "b"), ("ab", "c")))
    // "abc"  -> [a b c </w>] -> [ab c </w>] -> [abc </w>]      = 2
    // "abcd" -> [a b c d </w>] -> [ab c d </w>] -> [abc d </w>] = 3
    // "xyz"  -> [x y z </w>]                                    = 4
    val rows = Seq((1L, "abc abcd xyz"), (2L, "   "), (3L, "abc"))
      .toDF("id", "t")
      .select(col("id"), Bpe.count(col("t"), vocab).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) == 9L, s"got ${rows(1L)}")
    assert(rows(2L) == 0L, "blank text must count 0")
    assert(rows(3L) == 2L)
    // null text -> null count
    val nullRow = Seq((4L, null: String)).toDF("id", "t")
      .select(Bpe.count(col("t"), vocab).as("n")).collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("count: non-BMP text splits on code points, never surrogate halves") {
    import spark.implicits._
    // U+1F600 is a surrogate pair in UTF-16: with no merges the word
    // must count codePoints + 1 (end marker), not utf16 units + 1
    val n = Seq(("😀😀")).toDF("t")
      .select(Bpe.count(col("t"), Bpe.Vocab(Nil)).as("n"))
      .collect()(0).getLong(0)
    assert(n == 3L, s"got $n (2 code points + </w>)")
  }

  test("trainOn is deterministic and q60 counts are reproducible") {
    val docs = Tables(spark, sf).documents
    val v1 = Bpe.trainOn(docs, col("doc_id"), col("text"), 50, sampleN = 100)
    val v2 = Bpe.trainOn(docs, col("doc_id"), col("text"), 50, sampleN = 100)
    assert(v1 == v2, "vocab training must be deterministic")
    assert(v1.merges.nonEmpty)
    val a = TextQ.q60(spark, sf).collect().map(_.toString).toSeq
    val b = TextQ.q60(spark, sf).collect().map(_.toString).toSeq
    assert(a == b, "q60 must be rerun-identical")
    // sanity: every doc counted, counts positive, and merges actually
    // compress relative to raw code points + markers
    assert(a.nonEmpty)
    val rows = TextQ.q60(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("n_bpe_tokens") > 0))
    val rawSyms = docs.select(
      sum(length(regexp_replace(col("text"), "\\s+", "")) +
        size(split(trim(col("text")), "\\s+"))).as("s"))
      .collect()(0).getLong(0)
    val bpeTotal = rows.map(_.getAs[Long]("n_bpe_tokens")).sum
    assert(bpeTotal < rawSyms,
      s"merges did not compress: bpe=$bpeTotal raw=$rawSyms")
  }

  test("CorpusPrep packing under a BPE budget: offsets within budget, deterministic") {
    val docs = Tables(spark, sf).documents
    val vocab = Bpe.trainOn(docs, col("doc_id"), col("text"), 50, sampleN = 100)
    val cfg = graft.pipeline.CorpusPrep.Config(
      langRates = Map.empty, defaultRate = 1.0, nShards = 4,
      packBudget = Some(64), bpeVocab = Some(vocab))
    val rows = graft.pipeline.CorpusPrep.plan(docs, cfg)
      .select(col("doc_id"), col("shard"), col("pos"),
        col("pack_id"), col("pack_offset"),
        graft.functions.expressions.Bpe.count(col("text"), vocab).as("n"))
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (s, rs) =>
      var cum = 0L
      rs.sortBy(_.getAs[Long]("pos")).foreach { r =>
        assert(r.getAs[Long]("pack_id") == cum / 64,
          s"shard $s doc ${r.getAs[Long]("doc_id")}: bad pack_id")
        assert(r.getAs[Long]("pack_offset") == cum % 64)
        cum += r.getAs[Long]("n")
      }
    }
  }

  test("trainDistributed == train on identical texts (tie-breaks, early stop)") {
    import spark.implicits._
    // hand corpus with a real tie to break and enough repetition to
    // learn several rounds deep, plus blank/whitespace rows to ignore
    // "\tab ab\n" and "\t\n": Spark trim() strips only ASCII space,
    // Java trim all chars <= U+0020 — the distributed path must drop
    // the empty tokens a leading tab leaves behind and ignore
    // tab/newline-only docs, exactly like the local trainer
    val texts = Seq("ab ab", "ab", "abc abc abd", "xy xy zz", "  ",
      "a b ab", "\tab ab\n", "\t\n")
    val local = Bpe.train(texts, numMerges = 20)
    // default path = the collect regime (indexed local loop)
    val dist = Bpe.trainDistributed(
      texts.toDF("text"), col("text"), numMerges = 20, checkpointEvery = 4)
    assert(local.merges.nonEmpty)
    assert(dist == local,
      s"distributed ${dist.merges} != local ${local.merges}")
    // the fully-distributed full-aggregation regime, forced
    val distFull = Bpe.trainDistributed(
      texts.toDF("text"), col("text"), numMerges = 20, checkpointEvery = 4,
      incremental = Some(false))
    assert(distFull == local,
      s"full-agg regime ${distFull.merges} != local ${local.merges}")
    // the indexed trainer alone must replay train() exactly on the
    // same word table (pair bags, tie-breaks, early stop)
    val wf = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(t => Option(t).map(_.trim).filter(_.nonEmpty).foreach(
      _.split("\\s+").filter(_.nonEmpty).foreach(w =>
        wf(w) = wf.getOrElse(w, 0L) + 1)))
    def symsOf(w: String): Vector[String] =
      (w.codePoints().toArray.toVector.map(cp =>
        new String(Character.toChars(cp))) :+ Bpe.EndOfWord)
    val indexed = Bpe.trainIndexed(
      wf.toSeq.map { case (w, f) => (symsOf(w), f) }, 20)
    assert(indexed == local,
      s"indexed ${indexed.merges} != local ${local.merges}")
    // the Sennrich-delta (incremental standing pair table) regime — the
    // large-vocab path, forced here on the same fixture — must learn
    // the identical table: deltas equal a recount at every round
    val distDelta = Bpe.trainDistributed(
      texts.toDF("text"), col("text"), numMerges = 20, checkpointEvery = 4,
      incremental = Some(true))
    assert(distDelta == local,
      s"delta regime ${distDelta.merges} != local ${local.merges}")
    // early stop: nothing repeats -> no merges, both paths
    assert(Bpe.trainDistributed(Seq("xy").toDF("text"), col("text"), 5)
      == Bpe.train(Seq("xy"), 5))
    assert(Bpe.trainDistributed(Seq("xy").toDF("text"), col("text"), 5,
      incremental = Some(true)) == Bpe.train(Seq("xy"), 5))
  }

  test("tie-breaks are code-point order on BOTH paths (astral vs U+E000.. would split UTF-16 from UTF-8 order)") {
    import spark.implicits._
    // U+1F600 (astral: UTF-16 lead surrogate 0xD83D) vs U+E000
    // (private use): Java String order puts the surrogate FIRST,
    // UTF-8/code-point order puts U+E000 first. Every word appears
    // twice, so (astral,</w>) and (pua,</w>) tie at 2 -- the chosen
    // merge IS the tie-break, and the two trainers must agree on it.
    val astral = new String(Character.toChars(0x1F600))
    val pua = "\uE000"
    val texts = Seq(s"$astral $pua", s"$astral $pua")
    val local = Bpe.train(texts, numMerges = 1)
    assert(local.merges == Seq((pua, Bpe.EndOfWord)),
      s"local tie-break must be code-point order: ${local.merges}")
    val dist = Bpe.trainDistributed(texts.toDF("text"), col("text"), 1)
    assert(dist == local, s"distributed ${dist.merges} != local ${local.merges}")
    // the same tie must break identically in the DISTRIBUTED argmax
    // (UTF8String orderBy) — the collect regime above never reaches it
    val distFull = Bpe.trainDistributed(texts.toDF("text"), col("text"), 1,
      incremental = Some(false))
    assert(distFull == local,
      s"distributed argmax tie-break ${distFull.merges} != ${local.merges}")
    // guard: bad checkpointEvery fails fast, not mid-training
    intercept[IllegalArgumentException] {
      Bpe.trainDistributed(texts.toDF("text"), col("text"), 1,
        checkpointEvery = 0)
    }
  }

  test("trainDistributed parity on real documents + q66 merge table shape") {
    val docs = Tables(spark, sf).documents
    // the corpus-scale path must reproduce the driver-local trainer
    // bit-for-bit when handed the same texts
    val texts = docs.orderBy(col("doc_id")).limit(60)
      .select(col("text")).collect().map(_.getString(0)).toSeq
    val local = Bpe.train(texts, numMerges = 40)
    val dist = Bpe.trainDistributed(
      docs.orderBy(col("doc_id")).limit(60).select(col("text")),
      col("text"), numMerges = 40)
    assert(dist == local,
      s"distributed ${dist.merges.take(8)}... != local ${local.merges.take(8)}...")
    // the Sennrich-delta distributed regime on real text, forced
    val distDelta = Bpe.trainDistributed(
      docs.orderBy(col("doc_id")).limit(60).select(col("text")),
      col("text"), numMerges = 40, incremental = Some(true))
    assert(distDelta == local,
      s"delta regime ${distDelta.merges.take(8)}... != local")
    // q66: rank is 0..n-1 in order, symbols non-empty
    val t = graft.queries.TextQ.q66(spark, sf).collect()
    assert(t.nonEmpty)
    assert(t.map(_.getAs[Long]("rank")).toSeq == t.indices.map(_.toLong),
      "rank must be the dense merge order")
    assert(t.forall(r => r.getAs[String]("left_sym").nonEmpty &&
      r.getAs[String]("right_sym").nonEmpty))
  }
}
