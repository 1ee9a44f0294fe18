package graft

import graft.functions.TextOps
import graft.functions.expressions.{Bpe, TextExprs}
import org.apache.spark.sql.functions._

/** Seeded-random adversarial inputs for the newest kernels — the
  * fixtures a human writes are the cases a human thought of; these
  * sweep the space around them (empty/short arrays, repeated tokens,
  * unicode incl. astral, pathological repetition) with a FIXED seed so
  * a failure reproduces exactly.
  */
class FuzzSpec extends SparkSpec {

  private val alphabets = Seq(
    Seq("a", "b"),                       // tiny: maximal collisions/ties
    Seq("x", "yy", "zzz", "w"),          // varied widths
    Seq("tok", "été", "中文",
      new String(Character.toChars(0x1F600)), "mix")) // unicode + astral

  private def randTokens(rnd: scala.util.Random, maxLen: Int): Seq[String] = {
    val ab = alphabets(rnd.nextInt(alphabets.length))
    Seq.fill(rnd.nextInt(maxLen + 1))(ab(rnd.nextInt(ab.length)))
  }

  test("WindowMd5Hashes == composed slice/concat_ws on 300 random arrays x {w, minOne}") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val arrays = Seq.fill(300)(randTokens(rnd, 24))
    val df = arrays.map(a => Tuple1(a)).toDF("arr")
    for (w <- Seq(2, 3, 5, 16); minOne <- Seq(false, true)) {
      // sequence(1, 0) is DESCENDING in Spark, so guard the empty case
      val lenExpr =
        if (minOne) s"greatest(size(arr) - ${w - 1}, 1)"
        else s"size(arr) - ${w - 1}"
      val paired = df.select(
        TextExprs.windowMd5Hashes(col("arr"), w, minOne).as("native"),
        expr(s"if($lenExpr < 1, array(), transform(sequence(1, $lenExpr), " +
          s"p -> concat_ws(' ', slice(arr, p, $w))))").as("sw"))
      assert(paired.filter(size(col("native")) =!= size(col("sw")))
        .count() == 0, s"length mismatch at w=$w minOne=$minOne")
      val bad = paired
        .filter(size(col("native")) > 0)
        .withColumn("z", explode(arrays_zip(col("native"), col("sw"))))
        .select(col("z.native").as("nh"),
          TextExprs.md5Lower64(col("z.sw")).as("ch"))
        .filter(col("nh") =!= col("ch"))
      assert(bad.count() == 0, s"hash mismatch at w=$w minOne=$minOne")
    }
  }

  test("trainIndexed == train on 60 random corpora (small alphabets force dense ties)") {
    val rnd = new scala.util.Random(7)
    (1 to 60).foreach { i =>
      val nDocs = 1 + rnd.nextInt(8)
      val texts = Seq.fill(nDocs)(randTokens(rnd, 12).mkString(" "))
      val merges = 1 + rnd.nextInt(24)
      val local = Bpe.train(texts, merges)
      // rebuild the word table exactly as the local trainer does
      val wf = scala.collection.mutable.Map.empty[String, Long]
      texts.foreach(t => Option(t).map(_.trim).filter(_.nonEmpty).foreach(
        _.split("\\s+").filter(_.nonEmpty).foreach(w =>
          wf(w) = wf.getOrElse(w, 0L) + 1)))
      def symsOf(w: String): Vector[String] =
        (w.codePoints().toArray.toVector.map(cp =>
          new String(Character.toChars(cp))) :+ Bpe.EndOfWord)
      val indexed = Bpe.trainIndexed(
        wf.toSeq.map { case (w, f) => (symsOf(w), f) }, merges)
      assert(indexed == local,
        s"corpus #$i diverged: indexed=${indexed.merges} local=${local.merges} texts=$texts")
    }
  }

  test("substring strip invariants hold on a random corpus with planted shared runs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val w = 4
    val run = Seq.fill(6)(s"run${rnd.nextInt(3)}").mkString(" ")
    val docs = (1 to 40).map { id =>
      val own = Seq.fill(3 + rnd.nextInt(10))(s"d${id}t${rnd.nextInt(6)}")
      val text =
        if (id % 3 == 0) (own.take(2) ++ Seq(run) ++ own.drop(2)).mkString(" ")
        else own.mkString(" ")
      (id.toLong, text)
    }.toDF("doc_id", "text")
    val spans = graft.operators.SubstrDedup.spans(docs, w).collect()
    val strip = graft.operators.SubstrDedup.strip(docs, w).collect()
    val spanMass = spans.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(3)).sum).toMap
    strip.foreach { r =>
      val (id, nTok, nKept, kept) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      // dropped mass equals the span mass, never negative
      assert(nTok - nKept == spanMass.getOrElse(id, 0L), s"doc $id mass")
      // rebuilt text has exactly n_kept tokens
      val keptToks = if (kept.isEmpty) 0 else kept.split(" ").length
      assert(keptToks.toLong == nKept, s"doc $id rebuild")
    }
    // spans lie inside their doc and meet the window threshold
    val nToks = strip.map(r => r.getLong(0) -> r.getLong(1)).toMap
    spans.foreach { r =>
      val (id, s, e, n) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(s >= 1 && e <= nToks(id) && n == e - s + 1 && n >= w,
        s"span ($id,$s,$e,$n)")
    }
    // keep-lowest: the minimal doc holding the planted run is untouched
    val planted = (1 to 40).filter(_ % 3 == 0).map(_.toLong)
    val keeper = planted.min
    assert(!spans.exists(_.getLong(0) == keeper), "keeper got a span")
    assert(planted.tail.forall(id => spans.exists(_.getLong(0) == id)),
      "every non-keeper with the planted run must have a span")
  }
}
