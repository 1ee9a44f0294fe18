package graft.operators

import graft.functions.TextOps.{normText, tokens}
import graft.functions.expressions.TextExprs
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.util.sketch.BloomFilter

/** Cross-snapshot NEAR-dup membership — the band-key sidecar that
  * closes the paraphrase gap the exact sidecar ([[SnapshotBloom]])
  * leaves open: a re-crawled page whose text changed by a few tokens
  * has a fresh canonical digest and sails through the exact gate, and
  * the in-run near-dup stage only sees the CURRENT batch, so a
  * paraphrase of LAST month's kept doc re-enters on every refresh.
  *
  * The sidecar stores the q31 LSH BAND KEYS of the kept docs (the
  * [[NearDup]] kernel verbatim: MinHash over word 3-gram shingles,
  * K=64 / B=16 / R=4, band index mixed into the stored value so band
  * i only matches band i). A refresh drops any doc sharing ≥ 1 band
  * key with history — exactly the collision event that would have
  * made the pair a candidate had both docs been in one batch. Still a
  * pure broadcast-free FILTER: the bits ride the task binary, the
  * prior corpus is never re-read or joined.
  *
  * Guarantees, stated the LSH-composed-with-Bloom way:
  *  - NO false negatives at the LSH level: any (new, prior-kept) pair
  *    the in-run q31 stage would have bucketed together IS caught
  *    (same signatures, same band fold; Bloom adds none).
  *  - A pair near the threshold can still slip ALL bands (LSH's own
  *    recall curve — identical to the in-run stage's, this adds no
  *    new miss mode); at jaccard ~0.9 the per-doc miss probability is
  *    ~(1−0.9⁴)¹⁶ ≈ 4·10⁻⁸.
  *  - The drop test is the CANDIDATE test, un-rescored: history isn't
  *    readable, so there is no exact verification pass — a doc merely
  *    band-colliding with history drops even if true similarity is
  *    below q31's minEst, plus ordinary Bloom false positives. Both
  *    directions lose a fresh doc, never duplicate one — the cheap
  *    direction for a training corpus, same as the exact sidecar.
  *
  * Sizing: the filter holds B entries per doc — [[build]] takes
  * expected DOCS and sizes B× internally, so the publish-run config
  * stays in doc units like [[SnapshotBloom.build]].
  */
object SnapshotBands {

  /** Band-salted probe values of one doc: band i's key from the q31
    * kernel, with the band index in the high 32 bits so identical key
    * ints in DIFFERENT bands cannot alias (the in-run stage joins on
    * (band, key) pairs; this is that pair packed into one long).
    */
  def bandValues(textCol: Column): Column = {
    val sig = TextExprs.minhashShingleSig(
      tokens(normText(coalesce(textCol, lit("")))), 3, NearDup.K)
    val keys = TextExprs.bandKeys(sig, NearDup.B, NearDup.R)
    transform(keys, (k, i) =>
      shiftleft(i.cast("long"), 32)
        .bitwiseOR(k.cast("long").bitwiseAND(lit(0xFFFFFFFFL))))
  }

  /** Build the band-membership sketch of a finished run's kept docs.
    * `expectedDocs` is in DOC units; the undersize refusal mirrors
    * [[SnapshotBloom.build]] (a degraded FP rate silently drops fresh
    * docs — data loss with no error anywhere).
    *
    * ONE corpus pass: the Bloom fold and the sizing count ride the
    * same treeAggregate (the exact execution shape
    * `df.stat.bloomFilter` uses internally — a separate `count()`
    * would scan and re-shingle the whole kept corpus a second time at
    * publish). The refusal fires after the fold, before anything is
    * returned or saved — same observable contract. (Spark's native
    * BloomFilterAggregate expression is deliberately NOT used: its
    * size is silently capped by the runtime-filter confs, the exact
    * degrade-without-error this refusal exists to prevent.)
    */
  def build(docs: DataFrame, expectedDocs: Long, fpp: Double = 1e-3,
            textCol: Column = col("text")): BloomFilter = {
    require(expectedDocs > 0, s"expectedDocs must be > 0, got $expectedDocs")
    val spark = docs.sparkSession
    import spark.implicits._
    val d = docs.select(explode(bandValues(textCol)).as("d")).as[Long]
    val (bf, items) = d.rdd.treeAggregate(
      (BloomFilter.create(expectedDocs * NearDup.B, fpp), 0L))(
      { case ((b, c), v) => b.putLong(v); (b, c + 1L) },
      { case ((b1, c1), (b2, c2)) => (b1.mergeInPlace(b2), c1 + c2) })
    val n = items / NearDup.B
    require(n <= 2 * expectedDocs,
      s"SnapshotBands sized for $expectedDocs docs but fed $n: the FP " +
        "rate would silently degrade and the next refresh would silently " +
        s"drop fresh docs — rebuild with expectedDocs >= $n")
    bf
  }

  /** Same serialized form as the exact sidecar — publish/load/chain
    * through [[SnapshotBloom]]'s crash-safe save, load and OR-merge.
    */
  def save(spark: SparkSession, bf: BloomFilter, path: String): Unit =
    SnapshotBloom.save(spark, bf, path)
  def load(spark: SparkSession, path: String): BloomFilter =
    SnapshotBloom.load(spark, path)
  def loadMerged(spark: SparkSession, paths: Seq[String]): BloomFilter =
    SnapshotBloom.loadMerged(spark, paths)

  /** Near-membership probe as a boolean column: true iff ANY of the
    * doc's B band keys is (possibly) in the sidecar. Same serialized-
    * bytes-as-expression-state device as [[SnapshotBloom.seen]]; the
    * per-element probe runs inside an `exists` HOF — B=16 probes per
    * row, short-circuiting on the first hit.
    */
  def seen(bf: BloomFilter, textCol: Column = col("text")): Column = {
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    exists(bandValues(textCol), v =>
      Bridge.column(BloomSeen(Bridge.expression(v), bytes)))
  }

  /** Drop docs near-seen by the prior snapshot. Pure filter — the plan
    * gains a predicate, never a join (plan pin in SnapshotBandsSpec).
    */
  def gate(docs: DataFrame, bf: BloomFilter,
           textCol: Column = col("text")): DataFrame =
    docs.filter(!seen(bf, textCol))
}
