package graft

import graft.functions.{TextOps, VecOps}
import graft.queries.{TextQ, VecQ}
import org.apache.spark.sql.functions._

class TextVecQueriesSpec extends SparkSpec {

  test("every text/vec entry runs and returns rows on sf0.001") {
    (TextQ.entries ++ VecQ.entries).foreach { e =>
      assert(e.run(spark, sf).count() > 0, s"${e.name} returned no rows")
    }
  }

  test("q30 exact dedup keeps one id per normalized text") {
    val t = Tables(spark, sf)
    val norms = t.documents
      .select(TextOps.normText(col("text")).as("n")).distinct().count()
    assert(TextQ.q30(spark, sf).count() == norms)
  }

  test("LineDedup: boilerplate lines dropped everywhere but the lowest doc") {
    import spark.implicits._
    import graft.operators.LineDedup
    val banner = "subscribe to our newsletter today"
    val footer = "copyright example corp all rights reserved"
    val docs = Seq(
      (1L, s"unique alpha content\n$banner\n$footer"),
      (2L, s"$banner\nunique beta content here\n$footer"),
      (3L, s"unique gamma content entirely\n$banner"),
      (4L, "totally standalone document"))
      .toDF("doc_id", "text")
    val out = LineDedup.dedupe(docs, split(col("text"), "\n"), minDf = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1 is the lowest id containing each boilerplate line → keeper
    assert(out(1L).getAs[Long]("n_kept") == 3, out(1L).toString)
    assert(out(1L).getAs[String]("text_kept") ==
      s"unique alpha content $banner $footer")
    // docs 2/3 lose the banner/footer but keep their unique line
    assert(out(2L).getAs[Long]("n_lines") == 3 &&
      out(2L).getAs[Long]("n_kept") == 1, out(2L).toString)
    assert(out(2L).getAs[String]("text_kept") == "unique beta content here")
    assert(out(3L).getAs[String]("text_kept") == "unique gamma content entirely")
    // untouched doc passes through whole
    assert(out(4L).getAs[String]("text_kept") == "totally standalone document")
  }

  test("q64 verdicts: pass iff every rule passes, and the rules discriminate") {
    val rows = TextQ.q64(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flags = Seq("ok_len", "ok_word_len", "ok_stop", "ok_alpha")
        .map(r.getAs[Long](_))
      assert(flags.forall(f => f == 0L || f == 1L), r.toString)
      assert((r.getAs[Long]("pass") == 1L) == flags.forall(_ == 1L),
        s"pass must be the conjunction of the rules: $r")
    }
    assert(rows.exists(_.getAs[Long]("pass") == 1L) &&
      rows.exists(_.getAs[Long]("pass") == 0L),
      "thresholds must actually split this corpus")
  }

  test("LineDedup.dedupeWithinDoc: repeats after the first occurrence drop, other docs irrelevant") {
    import spark.implicits._
    import graft.operators.LineDedup
    val docs = Seq(
      (1L, "alpha\nbeta\nalpha\ngamma\nalpha"), // alpha x3 -> keep first only
      (2L, "alpha\ndelta"))                     // doc 1's repeats don't affect doc 2
      .toDF("doc_id", "text")
    val out = LineDedup.dedupeWithinDoc(docs, split(col("text"), "\n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_lines") == 5 &&
      out(1L).getAs[Long]("n_kept") == 3, out(1L).toString)
    assert(out(1L).getAs[String]("text_kept") == "alpha beta gamma")
    assert(out(2L).getAs[Long]("n_kept") == 2 &&
      out(2L).getAs[String]("text_kept") == "alpha delta", out(2L).toString)
  }

  test("LineDedup.droppedSpans: consecutive dropped lines count as one span") {
    import spark.implicits._
    import graft.operators.LineDedup
    val (b1, b2, b3) = ("banner one here", "banner two here", "banner three here")
    val docs = Seq(
      (1L, s"unique alpha\n$b1\n$b2\nunique beta\n$b3"), // keeper of all banners
      (2L, s"$b1\n$b2\nunique gamma\n$b3\nunique delta"), // spans: [b1,b2], [b3]
      (3L, "totally unique\nnothing shared"))
      .toDF("doc_id", "text")
    val out = LineDedup.droppedSpans(docs, split(col("text"), "\n"), minDf = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("longest_span"),
          r.getAs[Long]("n_dropped"))).toMap
    // only doc 2 dropped anything: one 2-line run + one isolated line
    assert(out.keySet == Set(2L), s"docs with spans: ${out.keySet}")
    assert(out(2L) == ((2L, 2L, 3L)), s"doc 2 spans: ${out(2L)}")
  }

  test("LineDedup.dedupeSpans: only runs of >= minRun marked lines drop; minRun=1 == dedupe") {
    import spark.implicits._
    import graft.operators.LineDedup
    val (b1, b2, b3) = ("banner one here", "banner two here", "banner three here")
    val docs = Seq(
      (1L, s"unique alpha\n$b1\n$b2\nunique beta\n$b3"), // keeper: drops nothing
      (2L, s"$b1\n$b2\nunique gamma\n$b3\nunique delta"), // run [b1,b2] drops; isolated b3 SURVIVES
      (3L, "totally unique\nnothing shared"))
      .toDF("doc_id", "text")
    val out = LineDedup.dedupeSpans(docs, split(col("text"), "\n"),
      minDf = 2, minRun = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_kept") == 5, out(1L).toString)
    assert(out(2L).getAs[Long]("n_kept") == 3 &&
      out(2L).getAs[String]("text_kept") ==
        s"unique gamma $b3 unique delta", out(2L).toString)
    assert(out(3L).getAs[Long]("n_kept") == 2)
    // degenerate minRun=1 must be exactly the line-by-line pass
    val spans1 = LineDedup.dedupeSpans(docs, split(col("text"), "\n"),
      minDf = 2, minRun = 1).collect().map(_.toString).sorted.toSeq
    val lineBy = LineDedup.dedupe(docs, split(col("text"), "\n"), minDf = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(spans1 == lineBy, "minRun=1 must degenerate to dedupe()")
    // a marked line at the very START of a doc preceded by nothing and a
    // run split across kept lines must both gate independently
    val edge = Seq(
      (10L, s"$b1\nmiddle text\n$b2"),
      (11L, s"$b1\nmiddle other\n$b2"))
      .toDF("doc_id", "text")
    val e = LineDedup.dedupeSpans(edge, split(col("text"), "\n"),
      minDf = 2, minRun = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // both shared lines are isolated (separated by a unique middle line)
    // -> nothing drops in either doc
    assert(e(10L).getAs[Long]("n_kept") == 3, e(10L).toString)
    assert(e(11L).getAs[Long]("n_kept") == 3, e(11L).toString)
  }

  test("LineDedup.wordWindows: non-overlapping windows, tail keeps its remainder") {
    import spark.implicits._
    import graft.operators.LineDedup
    val rows = Seq((1L, "a b c d e f g h i j"), (2L, " "), (3L, "\n\t \n"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), LineDedup.wordWindows(col("text"), 8).as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L) == Seq("a b c d e f g h", "i j"))
    assert(rows(2L).isEmpty, "blank text must yield zero segments")
    assert(rows(3L).isEmpty,
      "tab/newline-only text must yield zero segments (trim strips only spaces)")
  }

  test("q31 minhash finds the known near-dup pairs with high estimate") {
    // ground truth from offline brute force at sf0.001: 28 pairs with
    // 3-gram Jaccard >= 0.5, most >= 0.9 — LSH at 16 bands of 4 must
    // recover nearly all of them.
    val pairs = TextQ.q31(spark, sf).cache()
    assert(pairs.count() >= 20, "LSH missed most known near-dup pairs")
    assert(pairs.filter(col("est_jaccard") > 1.0 || col("est_jaccard") < 0.5).count() == 0)
    // identical docs would estimate 1.0: check estimator on self-pair
    val sig = t0Sig()
    assert(sig == 1.0)
    pairs.unpersist()
  }

  private def t0Sig(): Double = {
    val t = Tables(spark, sf)
    val d = t.documents.filter(col("doc_id") === 0)
      .select(TextOps.minhashSig(TextOps.wordShingles(col("text"), 3), 64).as("s"))
    d.select(TextOps.sigJaccard(col("s"), col("s"), 64).as("j"))
      .collect()(0).getDouble(0)
  }

  test("q32 simhash pairs are all within hamming 3, and exist") {
    val pairs = TextQ.q32(spark, sf).cache()
    assert(pairs.count() > 0)
    assert(pairs.filter(col("hamming") > 3).count() == 0)
    pairs.unpersist()
  }

  test("q33 reported jaccard matches a brute-force recomputation") {
    val t = Tables(spark, sf)
    val res = TextQ.q33(spark, sf).cache()
    assert(res.count() >= 20)
    // recompute exact jaccard for reported pairs straight from shingles
    val sh = t.documents.select(col("doc_id"),
      TextOps.wordShingles(col("text"), 3).as("sh"))
    val check = res
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sa")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
      .select(col("jaccard"),
        TextOps.exactJaccard(col("sa"), col("sb")).as("truth"))
    assert(check.filter(col("jaccard") =!= col("truth")).count() == 0)
    res.unpersist()
  }

  test("q40 assigns every doc a language with confidence in [0,1]") {
    val t = Tables(spark, sf)
    val res = TextQ.q40(spark, sf).cache()
    assert(res.count() == t.documents.count())
    assert(res.filter(col("confidence") < 0 || col("confidence") > 1).count() == 0)
    assert(res.filter(col("pred_lang").isNull).count() == 0)
    res.unpersist()
  }

  test("q43 fingerprints: identical text => identical fingerprints, and shared content overlaps") {
    val t = Tables(spark, sf)
    val fp = TextQ.q43(spark, sf)
    assert(fp.count() == t.documents.count())
    assert(fp.filter(col("n_fingerprints") <= 0).count() == 0)
    // winnowing is deterministic: recompute and diff
    val again = TextQ.q43(spark, sf)
    assert(fp.exceptAll(again).count() == 0)
  }

  test("q34 brute-force top-k: 10 neighbors per query, ranked by cosine desc") {
    val res = VecQ.q34(spark, sf).cache()
    assert(res.count() == 50) // 5 queries x 10 neighbors
    val bad = res.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), max(col("rnk")).as("mx"))
      .filter(col("n") =!= 10 || col("mx") =!= 10).count()
    assert(bad == 0)
    // ranks are ordered by non-increasing similarity
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id")).orderBy(col("rnk"))
    assert(res.withColumn("prev", lag(col("cos_sim"), 1).over(w))
      .filter(col("prev").isNotNull && col("cos_sim") > col("prev"))
      .count() == 0)
    res.unpersist()
  }

  test("q35 LSH ANN results are a subset of true similarities, with decent hit rate") {
    val ann = VecQ.q35(spark, sf).cache()
    assert(ann.count() > 0)
    // every reported neighbor's cosine must match the brute-force value
    val t = Tables(spark, sf)
    val emb = t.embeddings.select(col("vec_id"), VecOps.toDoubles(col("embedding")).as("v"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val truth = ann.join(q, "query_id")
      .join(emb.select(col("vec_id").as("neighbor_id"), col("v")), "neighbor_id")
      .select(col("cos_sim"),
        VecOps.cosine(col("qv"), col("v")).as("truth"))
    assert(truth.filter(col("cos_sim") =!= col("truth")).count() == 0)
    ann.unpersist()
  }

  test("q37 IVF ANN: 10 correct-cosine neighbors per query, sane recall vs brute force") {
    val ivf = VecQ.q37(spark, sf).cache()
    val brute = VecQ.q34(spark, sf).cache()
    // exactly 10 per query
    assert(ivf.groupBy("query_id").count()
      .filter(col("count") =!= 10).count() == 0)
    // every reported cosine must equal the brute-force value for that pair
    val joined = ivf.alias("i").join(brute.alias("b"),
      Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("i.cos_sim") =!= col("b.cos_sim")).count() == 0)
    // probing 4/16 lists must still recover a sane share of true top-10
    val recall = joined.count().toDouble / brute.count()
    assert(recall >= 0.2, s"IVF recall $recall too low")
    ivf.unpersist(); brute.unpersist()
  }

  test("q36 near-dup pairs all meet the threshold and are canonical (a<b)") {
    val res = VecQ.q36(spark, sf).cache()
    assert(res.count() > 0)
    assert(res.filter(col("cos_sim") < 0.3).count() == 0)
    assert(res.filter(col("vec_a") >= col("vec_b")).count() == 0)
    res.unpersist()
  }

  test("q68 semantic dedup: verdicts match a brute-force within-cluster recomputation; keep-lowest holds") {
    val rows = VecQ.q68(spark, sf).collect()
    val t = Tables(spark, sf)
    assert(rows.length == t.embeddings.count(),
      "every vector gets a verdict")
    assert(rows.exists(_.getAs[Long]("kept") == 0L) &&
      rows.exists(_.getAs[Long]("kept") == 1L),
      "threshold must actually split this corpus")
    // brute-force ground truth: embeddings + the query's own cluster
    // assignment (the clustering is the operator's model; what the
    // spec checks independently is the dedup RULE on top of it)
    val vecs = t.embeddings.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding"))
          .map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.values.foreach { members =>
      val ids = members.map(_.getAs[Long]("vec_id")).sorted
      members.foreach { r =>
        val id = r.getAs[Long]("vec_id")
        val lower = ids.filter(_ < id)
        val maxSim = if (lower.isEmpty) None
          else Some(lower.map(l => cos(vecs(id), vecs(l))).max)
        val expectKept = maxSim.forall(_ < 0.3)
        assert((r.getAs[Long]("kept") == 1L) == expectKept,
          s"vec $id: kept=${r.getAs[Long]("kept")} but maxLowerSim=$maxSim")
        maxSim match {
          case Some(ms) =>
            val got = r.getAs[Double]("max_lower_sim4")
            assert(math.abs(got - ms) < 1e-3,
              s"vec $id: max_lower_sim4=$got vs brute $ms")
          case None => assert(r.isNullAt(r.fieldIndex("max_lower_sim4")))
        }
      }
    }
  }
}
