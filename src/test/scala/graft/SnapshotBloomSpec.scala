package graft

import graft.operators.SnapshotBloom
import org.apache.spark.sql.functions._

/** Cross-snapshot membership dedup: sidecar build → publish → gate. */
class SnapshotBloomSpec extends SparkSpec {

  test("round-2 corpus against the round-1 sidecar drops exactly the re-seen docs; the plan has no join") {
    val docs = Tables(spark, sf).documents.select(col("doc_id"), col("text"))
    val run1 = docs.filter(col("doc_id") % 5 =!= 0) // "last month's" snapshot
    val seenIds = run1.select(col("doc_id")).collect().map(_.getLong(0)).toSet

    // build + crash-safe publish + load back (the real lifecycle)
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    val path = s"$dir/snapshot.bloom"
    SnapshotBloom.save(spark, SnapshotBloom.build(run1, expectedItems = 1000), path)
    val bf = SnapshotBloom.load(spark, path)

    val survivors = SnapshotBloom.gate(docs, bf)
    // no join against the prior corpus anywhere in the plan — the
    // whole point of the sidecar
    val plan = survivors.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"gate must be a pure filter:\n$plan")

    val out = survivors.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // Bloom guarantee: NO false negatives — every re-seen doc drops.
    // (Distinct doc_ids can share normalized text; anything whose text
    // digest matches a run-1 doc is by definition "seen".)
    assert(out.intersect(seenIds).isEmpty, "a re-seen doc leaked through the gate")
    // false positives only lose unseen docs, at ~fpp rate: with
    // fpp=1e-3 over ~100 unseen docs, demand at least 90% survive
    val unseen = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet -- seenIds
    assert(out.subsetOf(unseen))
    assert(out.size >= (unseen.size * 9) / 10,
      s"too many false positives: ${unseen.size - out.size} of ${unseen.size}")
  }

  test("the digest is q30's canonical family: whitespace/case variants of a seen doc also drop") {
    import spark.implicits._
    val run1 = Seq((1L, "Hello   World"), (2L, "unrelated text here")).toDF("doc_id", "text")
    val bf = SnapshotBloom.build(run1, expectedItems = 10)
    val next = Seq(
      (10L, "  hello world "), // normText-equal to doc 1 -> must drop
      (11L, "hello worlds")    // genuinely new
    ).toDF("doc_id", "text")
    val out = SnapshotBloom.gate(next, bf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!out.contains(10L), "normalized variant of a seen doc must drop")
    assert(out.contains(11L), "unseen doc dropped (fp at n=2 is ~impossible)")
  }

  test("sidecar chaining: merged filters gate against every constituent run; incompatible sizing refuses loudly") {
    import spark.implicits._
    val month1 = Seq((1L, "january corpus doc one"), (2L, "january doc two"))
      .toDF("doc_id", "text")
    val month2 = Seq((3L, "february corpus doc three")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bloomchain").toString
    // one sizing policy across the chain (the documented requirement)
    SnapshotBloom.save(spark, SnapshotBloom.build(month1, 100), s"$dir/m1.bloom")
    SnapshotBloom.save(spark, SnapshotBloom.build(month2, 100), s"$dir/m2.bloom")
    val chained = SnapshotBloom.loadMerged(spark,
      Seq(s"$dir/m1.bloom", s"$dir/m2.bloom"))
    val probe = Seq(
      (10L, "january corpus doc one"),     // seen in m1
      (11L, "february corpus doc three"),  // seen in m2
      (12L, "march novel doc")             // unseen
    ).toDF("doc_id", "text")
    val out = SnapshotBloom.gate(probe, chained).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(12L), s"chained gate must drop both months' docs: $out")
    // mismatched sizing must throw, not silently weaken the guarantee
    SnapshotBloom.save(spark, SnapshotBloom.build(month2, 5000), s"$dir/bad.bloom")
    intercept[Exception] {
      SnapshotBloom.loadMerged(spark, Seq(s"$dir/m1.bloom", s"$dir/bad.bloom"))
    }
  }

  test("undersized build refuses loudly instead of silently degrading the FP rate") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, s"doc number $i body")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      SnapshotBloom.build(docs, expectedItems = 10)
    }
    assert(ex.getMessage.contains("silently drop fresh docs"))
    // at or under 2x the sizing, the build goes through
    assert(SnapshotBloom.build(docs, expectedItems = 25) != null)
  }

  test("publish is atomic: a second save overwrites cleanly and loads back equal") {
    import spark.implicits._
    val d1 = Seq((1L, "a a a")).toDF("doc_id", "text")
    val d2 = Seq((2L, "b b b")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bloom2").toString
    val path = s"$dir/f.bloom"
    SnapshotBloom.save(spark, SnapshotBloom.build(d1, 10), path)
    SnapshotBloom.save(spark, SnapshotBloom.build(d2, 10), path)
    val bf = SnapshotBloom.load(spark, path)
    val probe = Seq((1L, "a a a"), (2L, "b b b")).toDF("doc_id", "text")
    val out = SnapshotBloom.gate(probe, bf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L), s"second publish must fully replace the first: $out")
  }
}
