package graft

import graft.queries.{PrepQ, TextQ}
import org.apache.spark.sql.functions._

class PrepQSpec extends SparkSpec {

  test("q52: injected PII is counted and fully scrubbed") {
    val rows = PrepQ.q52(spark, sf).collect()
    assert(rows.nonEmpty)
    // every doc got at least the injected email/phone/IP
    assert(rows.forall(_.getAs[Long]("n_emails") >= 1))
    assert(rows.forall(_.getAs[Long]("n_phones") >= 1))
    assert(rows.forall(_.getAs[Long]("n_ips") >= 1))
    // and the scrub column itself leaves no residue: rebuild one doc's
    // dirty text through the same scrub Column and regex-check it
    import spark.implicits._
    val sample = Seq("reach me at jane.doe+x@corp.example.org or 555-0199 " +
      "from 10.0.0.7 thanks").toDF("t")
      .select(PrepQ.scrub(col("t")).as("s")).as[String].head()
    assert(sample == "reach me at [EMAIL] or [PHONE] from [IP] thanks", sample)
  }

  test("q53: components agree with q31 pairs; one canonical (min id) per component") {
    val comp = PrepQ.q53(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("component"), r.getAs[Long]("is_canonical"))).toMap
    val pairs = TextQ.q31(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.nonEmpty && comp.nonEmpty)
    // every paired doc is labeled, and both ends share a component
    pairs.foreach { case (a, b) =>
      assert(comp.contains(a) && comp.contains(b), s"pair ($a,$b) unlabeled")
      assert(comp(a)._1 == comp(b)._1, s"pair ($a,$b) split across components")
    }
    // component label IS the minimum member id; exactly one canonical each
    comp.groupBy(_._2._1).foreach { case (label, members) =>
      assert(members.keys.min == label,
        s"component $label label is not its min member")
      assert(members.values.count(_._2 == 1L) == 1,
        s"component $label canonical count != 1")
      assert(members(label)._2 == 1L, s"component $label min not canonical")
    }
  }

  test("q53: loop caches are fully released (no per-round cache leak)") {
    // the round label frame is a projection over the cached frame —
    // retiring must unpersist the PINNED frame, or every round leaks
    // (the Hierarchy.closure lesson); assert via the persistent-RDD
    // registry, which both caches and localCheckpoints register in
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val out = PrepQ.q53(spark, sf)
    assert(out.count() > 0)
    val held = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    // only the result's own localCheckpoint may remain pinned
    assert(held.size <= 1,
      s"q53 left ${held.size} persisted RDDs behind (want <= 1: the result)")
  }

  test("q53: reliable-checkpoint path writes the dir and returns identical components") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-q53-ckpt").toString
    val reliable = PrepQ.q53(spark, sf, checkpointDir = Some(ckpt))
      .collect().map(_.toString).sorted.toSeq
    val local = PrepQ.q53(spark, sf).collect().map(_.toString).sorted.toSeq
    assert(reliable == local, "checkpoint path changed the result")
    // the converged labels actually went to reliable storage (a lost
    // executor can no longer lose them)
    def files(d: java.io.File): Seq[java.io.File] = {
      val k = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
      k.filter(_.isFile) ++ k.filter(_.isDirectory).flatMap(files)
    }
    assert(files(new java.io.File(ckpt)).nonEmpty,
      s"no checkpoint files written under $ckpt")
  }

  test("q54: benchmark docs excluded, flag consistent, overlap matches a brute-force recount") {
    val rows = PrepQ.q54(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("doc_id") % 100 != 0))
    assert(rows.forall(r =>
      (r.getAs[Long]("n_overlap") > 0) == (r.getAs[Long]("contaminated") == 1L)))
    // brute-force recount on the driver for the flagged docs (cap 20):
    // distinct word 8-grams shared with the benchmark docs' gram set
    def grams(t: String): Set[String] = {
      val toks = t.trim.toLowerCase.replaceAll("\\s+", " ").trim
        .split("\\s+").toSeq
      val n = math.max(toks.length - 7, 1)
      (0 until n).map(i => toks.slice(i, i + 8).mkString(" ")).toSet
    }
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val benchGrams = docs.filter(_._1 % 100 == 0).values.flatMap(grams).toSet
    rows.filter(_.getAs[Long]("contaminated") == 1L).take(20).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expect = grams(docs(id)).count(benchGrams.contains)
      assert(r.getAs[Long]("n_overlap") == expect,
        s"doc $id overlap ${r.getAs[Long]("n_overlap")} != brute-force $expect")
    }
  }

  test("q76: injected markup is fully stripped, entities decoded, original text preserved") {
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = PrepQ.q76(spark, sf).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val clean = r.getAs[String]("text_clean")
      // no residual tags or entities in the cleaned text; the literal
      // '<info>' is DECODED output (from &lt;info&gt;), so check for
      // tag-shaped residue via the raw markers the injection used
      assert(!clean.contains("</") && !clean.contains("<p") &&
        !clean.contains("<html") && !clean.contains("&amp;") &&
        !clean.contains("&#39;"), s"doc $id residue in: $clean")
      // script/style content must die whole, not just its tags
      assert(!clean.contains("track(id)") && !clean.contains("margin:0"),
        s"doc $id kept script/style content: $clean")
      // the document's own words survive verbatim (normalized spacing)
      val body = docs(id).trim.replaceAll("\\s+", " ")
      assert(clean.contains(body), s"doc $id lost body text")
      // decoded footer with all six entities resolved
      assert(clean.endsWith("corp & co <info> \"quoted\" 'q' end"),
        s"doc $id footer mis-decoded: $clean")
      // footer entities: &amp; &lt; &gt; 2×&quot; 2×&#39; &nbsp; = 8
      assert(r.getAs[Long]("n_tags") >= 14 && r.getAs[Long]("n_entities") == 8L)
    }
  }

  test("q77: exactly one kept member per component, and it is the quality argmax") {
    val rows = PrepQ.q77(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component"),
        r.getAs[Long]("quality9"), r.getAs[Long]("is_kept")))
    assert(rows.nonEmpty)
    // same membership as q53
    val q53ids = PrepQ.q53(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(rows.map(_._1).toSet == q53ids, "q77 membership diverged from q53")
    rows.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.count(_._4 == 1L) == 1,
        s"component $comp kept count != 1")
      val kept = members.find(_._4 == 1L).get
      // argmax by (quality DESC, doc_id ASC)
      val best = members.minBy(m => (-m._3, m._1))
      assert(kept._1 == best._1,
        s"component $comp kept ${kept._1}, argmax is ${best._1}")
    }
  }
}
