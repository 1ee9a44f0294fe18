package graft.operators

import graft.functions.TextOps._
import graft.functions.expressions.TextExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The MinHash-LSH near-dup kernel (Broder '97) — ONE definition
  * shared by the oracle-checked queries (q31 candidates, q33's exact
  * re-score) and the pipeline stages that consume near-dup pairs
  * ([[graft.pipeline.CorpusPrep]]), so a pipeline can never drift from
  * the verified semantics.
  *
  * Scale shape (SURVEY §5): the only exchanges are the signature
  * materialization barrier and the band-key shuffle; candidate pairs
  * are generated strictly inside LSH buckets with a hot-bucket cap,
  * and pair scoring happens in the bucket-join projection so the
  * post-join exchange carries (doc_a, doc_b, est) survivors — never
  * signature arrays, never document payloads.
  */
object NearDup {

  val K = 64   // minhash signature length
  val B = 16   // LSH bands
  val R = 4    // rows per band (K = B*R)

  /** Per-doc MinHash signatures over word 3-gram shingles — native
    * expression (one O(tokens) pass/row; identical values to the
    * composed TextOps.minhashSig(wordShingles(..)) form).
    *
    * The trailing repartition is a deliberate materialization barrier:
    * the LSH pipeline fans this column out into a window, two join
    * branches and a scoring projection, and without the exchange
    * Catalyst's projection collapsing would inline the minhash
    * computation into every consumer (recomputing it per use). The
    * exchange materializes the 64-int signatures once, and both join
    * branches read the SAME shuffle output (ReusedExchange —
    * PlanShapeSpec asserts this on the finalized AQE plan).
    */
  def signatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      TextExprs.minhashShingleSig(tokens(normText(col("text"))), 3, K).as("sig"))
      .repartition(col("doc_id"))

  /** Candidate near-dup pairs from LSH banding, scored in place: docs
    * sharing any band bucket, with the MinHash Jaccard estimate
    * computed natively INSIDE the bucket join projection. Pairs below
    * `minEst` die before any shuffle — the post-join exchange carries
    * only (doc_a, doc_b, est) survivors, never signature arrays.
    * Hot buckets (> cap docs) are dropped — at 100 TB a degenerate
    * shingle (e.g. boilerplate) would otherwise create a quadratic
    * bucket; real dups still collide on their other bands.
    */
  def scoredCandidates(sigs: DataFrame, minEst: Double,
                       cap: Int = 100): DataFrame = {
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(TextExprs.bandKeys(col("sig"), B, R)).as(Seq("band", "bkey")))
    val wB = Window.partitionBy(col("band"), col("bkey"))
    val capped = banded
      .withColumn("bucket_n", count(lit(1)).over(wB))
      .filter(col("bucket_n") <= cap)
    val lhs = capped.select(col("band"), col("bkey"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val rhs = capped.select(col("band"), col("bkey"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    lhs.join(rhs, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        TextExprs.sigAgree(col("sig_a"), col("sig_b"), K).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)
      .dropDuplicates("doc_a", "doc_b")
  }

  /** The doc_ids a greedy keep-lowest near-dup pass drops: every doc
    * appearing as the HIGHER id of any candidate pair (the pairwise
    * mirror of q30's exact keep-lowest) — ONE definition consumed by
    * [[dropHigherOfPairs]] and the CorpusPrep stage (which needs the
    * set separately, for its stats). Deterministic; for full
    * transitive-closure clustering (a chain A~B~C where A and C never
    * share a bucket) see the q53 connected-components operator —
    * greedy keeps A and drops B,C here too, but on sparser chains it
    * can keep more than one representative per cluster, which for a
    * training corpus errs on the safe side (keeps data).
    */
  def dropIds(docs: DataFrame, minEst: Double, cap: Int = 100): DataFrame =
    scoredCandidates(signatures(docs), minEst, cap)
      .select(col("doc_b").as("doc_id")).distinct()

  /** Greedy pairwise near-dup FILTER over [[dropIds]]. */
  def dropHigherOfPairs(docs: DataFrame, minEst: Double,
                        cap: Int = 100): DataFrame =
    docs.join(dropIds(docs, minEst, cap), Seq("doc_id"), "left_anti")
}
