package graft

import graft.operators.{NearDup, SnapshotBands}
import graft.pipeline.CorpusPrep
import org.apache.spark.sql.functions._

/** Cross-snapshot NEAR-dup membership (the band-key sidecar): a
  * paraphrase of LAST run's kept doc — fresh digest, invisible to the
  * exact sidecar and to the in-run near-dup stage — is dropped by a
  * pure filter, without joining or re-reading the prior corpus.
  */
class SnapshotBandsSpec extends SparkSpec {
  import spark.implicits._

  // prior corpus: two real paragraphs, enough shingles for stable bands
  private val priorA =
    "the merge pipeline reads every shard of the corpus and rewrites " +
      "each document into the canonical training layout with stable ids"
  private val priorB =
    "stream processing jobs maintain bounded state under the watermark " +
      "and emit one finalized verdict per incoming document batch"
  // light paraphrase of priorA: a few tokens changed/added — fresh
  // canonical digest (exact gate blind), ~0.85 shingle jaccard (any
  // band collides with probability 1 - (1-0.85^4)^16 ~ 0.9999)
  private val paraphraseA =
    "the merge pipeline reads every shard of the corpus and rewrites " +
      "each document into the new canonical training layout with stable ids"
  private val fresh =
    "completely unrelated subject matter about alpine botany and the " +
      "seasonal migration patterns of high altitude pollinators"

  test("gate: a paraphrased prior doc drops, a fresh doc survives, the plan has no join") {
    val prior = Seq((1L, priorA), (2L, priorB)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bands").toString
    val path = s"$dir/bands.bloom"
    SnapshotBands.save(spark, SnapshotBands.build(prior, expectedDocs = 10), path)
    val bf = SnapshotBands.load(spark, path)

    val next = Seq(
      (10L, paraphraseA),   // paraphrase of a kept doc -> must drop
      (11L, priorB),        // verbatim re-crawl -> also collides (all bands)
      (12L, fresh))         // genuinely new -> must survive
      .toDF("doc_id", "text")
    val survivors = SnapshotBands.gate(next, bf)
    val plan = survivors.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"near gate must be a pure filter:\n$plan")
    val out = survivors.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(out == Set(12L), s"survivors: $out")
  }

  test("the gate IS q31's candidate test against history: any pair the in-run stage would bucket is caught") {
    // sanity-pin the coupling: the paraphrase pair is an in-run q31
    // candidate (shares >= 1 band bucket), and the same collision is
    // what the sidecar stores — same signatures, same band fold
    val both = Seq((1L, priorA), (10L, paraphraseA)).toDF("doc_id", "text")
    val cand = NearDup.scoredCandidates(NearDup.signatures(both), minEst = 0.0)
      .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.contains((1L, 10L)),
      "fixture drifted: the paraphrase is no longer an in-run candidate")
  }

  test("undersized build refuses loudly (doc units, like the exact sidecar)") {
    val docs = (1L to 50L).map(i =>
      (i, s"document number $i with some body words $i and more")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      SnapshotBands.build(docs, expectedDocs = 10)
    }
    assert(ex.getMessage.contains("drop fresh docs"))
    assert(SnapshotBands.build(docs, expectedDocs = 25) != null)
  }

  test("CorpusPrep refresh: run 1 publishes the band sidecar, run 2 drops the paraphrase as a filter, stats bill the near gate") {
    def doc(id: Long, t: String) = (id, t, "en", "a", t.length.toLong)
    val run1Docs = Seq(doc(1L, priorA), doc(2L, priorB))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out1 = java.nio.file.Files.createTempDirectory("graft-nsnap1").toString
    CorpusPrep.run(run1Docs, out1,
      CorpusPrep.Config(langRates = Map.empty, defaultRate = 1.0,
        nShards = 2, publishNearSnapshot = Some(100L)))
    val sidecar = CorpusPrep.nearMembershipPath(out1)
    assert(new java.io.File(sidecar).exists, "band sidecar not published")

    // next refresh: a paraphrase (fresh digest — the EXACT gate could
    // not catch it) and a fresh doc
    val run2Docs = Seq(doc(10L, paraphraseA), doc(12L, fresh))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val cfg2 = CorpusPrep.Config(langRates = Map.empty, defaultRate = 1.0,
      nShards = 2, priorNearSnapshot = Some(sidecar))
    val plan = CorpusPrep.plan(run2Docs, cfg2).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"near-membership gate must not join:\n$plan")
    val out2 = java.nio.file.Files.createTempDirectory("graft-nsnap2").toString
    val stats2 = CorpusPrep.run(run2Docs, out2, cfg2)
    val kept = spark.read.parquet(out2)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(kept == Seq(12L), s"paraphrase leaked through the refresh: $kept")
    assert(stats2.nearSnapshotDropped == 1L, s"stats: $stats2")
    assert(stats2.snapshotDropped == 0L, s"billed to the wrong gate: $stats2")
  }

  test("streaming == batch: the stateless streaming gate keeps exactly the batch survivors") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s = spark
    val prior = Seq((1L, priorA), (2L, priorB)).toDF("doc_id", "text")
    val bf = SnapshotBands.build(prior, expectedDocs = 10)
    val rows = Seq((10L, paraphraseA), (11L, priorB), (12L, fresh))
    val input = MemoryStream[(Long, String)](spark)
    val out = graft.streaming.Streams.nearSnapshotGate(
      input.toDF().toDF("doc_id", "text"), bf)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("nearsnapgate")
      .outputMode("append").start()
    try {
      input.addData(rows.take(1): _*)
      input.addData(rows.drop(1): _*)
      q.processAllAvailable()
      val got = spark.table("nearsnapgate").select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
      val want = SnapshotBands.gate(rows.toDF("doc_id", "text"), bf)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(got == want && got == Set(12L), s"streaming $got != batch $want")
    } finally q.stop()
  }

  test("sidecar chaining: OR-merged band filters gate against every constituent run") {
    val m1 = Seq((1L, priorA)).toDF("doc_id", "text")
    val m2 = Seq((2L, priorB)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bandschain").toString
    SnapshotBands.save(spark, SnapshotBands.build(m1, 100), s"$dir/m1.bloom")
    SnapshotBands.save(spark, SnapshotBands.build(m2, 100), s"$dir/m2.bloom")
    val chained = SnapshotBands.loadMerged(spark,
      Seq(s"$dir/m1.bloom", s"$dir/m2.bloom"))
    val probe = Seq((10L, paraphraseA), (11L, priorB), (12L, fresh))
      .toDF("doc_id", "text")
    val out = SnapshotBands.gate(probe, chained).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(12L), s"chained gate: $out")
  }
}
