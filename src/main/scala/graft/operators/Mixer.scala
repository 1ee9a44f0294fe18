package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source-mixing rate computation — the planning half of corpus
  * mixing: given how many tokens each source actually has, compute
  * the per-source KEEP RATE that realizes a target token distribution
  * at the maximum feasible corpus size (downsampling only — no source
  * can contribute more than it has, so the tightest source pins the
  * total and every other source downsamples to proportion).
  *
  * The rates feed [[Sample.stratified]] / CorpusPrep's langRates-style
  * knobs: this operator turns "I want 30% code, 60% web, 10% books"
  * into the deterministic per-source probabilities those stages
  * consume.
  *
  * Scale shape: one map-side-combined token aggregation per source
  * (the only corpus pass); everything after operates on the
  * sources-sized aggregate (a global window over tens of rows), so
  * there is nothing to optimize past the first exchange.
  */
object Mixer {

  /** The default token unit: whitespace tokens. */
  def whitespaceTokens: Column = size(TextOps.tokens(col("text")))

  /** Per-source token totals: (source, tokens). `tokenCount` defaults
    * to the whitespace count; pass
    * [[graft.functions.expressions.Bpe.count]] under a vocab for
    * tokenizer-faithful budgets.
    */
  def sourceTokens(docs: DataFrame,
                   tokenCount: Column = whitespaceTokens): DataFrame =
    docs.select(col("source"), tokenCount.cast("bigint").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("tokens"))

  /** Balanced mix: every source contributes the SAME token count —
    * the smallest source participates fully (rate 1.0) and every
    * other source downsamples to match it. (source, tokens, rate),
    * ordered by source.
    */
  def balancedRates(docs: DataFrame,
                    tokenCount: Column = whitespaceTokens): DataFrame = {
    val w = Window.partitionBy() // sources-sized aggregate: tiny by then
    sourceTokens(docs, tokenCount)
      .withColumn("rate",
        min(col("tokens")).over(w).cast("double") / col("tokens"))
      .orderBy(col("source"))
  }

  /** Temperature mix: the standard softening knob between proportional
    * (alpha = 1: every source keeps everything) and balanced (alpha = 0:
    * [[balancedRates]] — equal token contributions). Each source's
    * contribution goes as tokens^alpha, realized as
    * rate_s = (min_tokens / tokens_s)^(1−alpha) with the smallest
    * source at rate 1 — the mC4/XLM-R low-resource-upsampling family
    * (Conneau et al. 2020, arXiv:1911.02116 §3; they use alpha ≈ 0.3).
    *
    * Engine parity, stated precisely: for alpha = 0.5 the power is a
    * SQUARE ROOT — IEEE-754 sqrt and division are correctly rounded,
    * so both engines compute bit-identical rates (the registered q79
    * pins this value). Any other alpha goes through pow(), whose last
    * ulp is libm-dependent — fine for production mixing, but such a
    * rate column is not oracle-exact and a caller wiring it into an
    * oracle-checked path owns that divergence.
    */
  def temperatureRates(docs: DataFrame, tokenCount: Column = whitespaceTokens,
                       alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val w = Window.partitionBy() // sources-sized aggregate: tiny by then
    val ratio = min(col("tokens")).over(w).cast("double") / col("tokens")
    val rate =
      if (alpha == 0.5) sqrt(ratio)
      else if (alpha == 0.0) ratio
      else if (alpha == 1.0) lit(1.0)
      else pow(ratio, 1.0 - alpha)
    sourceTokens(docs, tokenCount)
      .withColumn("rate", rate)
      .orderBy(col("source"))
  }

  /** Weighted mix: `weights` are target token SHARES (need not sum to
    * 1 — they are normalized). The feasible maximum total is pinned by
    * the source whose supply runs out first (min over s of
    * tokens_s / share_s); every source then keeps
    * share_s * total / tokens_s of its tokens. Sources absent from
    * `weights` get share 0 (rate 0 — dropped from the mix).
    *
    * A WEIGHTED source with no tokens in `docs` (missing, or a typo'd
    * name) makes the mix INFEASIBLE: it appears in the output with
    * tokens 0, the feasible total collapses to 0, and every rate is
    * 0.0 — loud emptiness, never a silently reshaped mix that ignores
    * the absent source.
    */
  def targetRates(docs: DataFrame, tokenCount: Column,
                  weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and strictly positive")
    val norm = weights.values.sum
    val spark = docs.sparkSession
    import spark.implicits._
    // weighted sources participate even with zero supply: a full-outer
    // join keeps them (tokens 0) so the feasibility math sees them
    val shares = weights.toSeq.map { case (s, wt) => (s, wt / norm) }
      .toDF("source", "share")
    val w = Window.partitionBy()
    sourceTokens(docs, tokenCount)
      .join(shares, Seq("source"), "full_outer")
      .withColumn("tokens", coalesce(col("tokens"), lit(0L)))
      .withColumn("share", coalesce(col("share"), lit(0.0)))
      .withColumn("feasible_total",
        min(when(col("share") > 0, col("tokens").cast("double") / col("share")))
          .over(w))
      .withColumn("rate",
        when(col("share") > 0 && col("tokens") > 0,
          col("share") * col("feasible_total") / col("tokens"))
          .otherwise(lit(0.0)))
      .select(col("source"), col("tokens"), col("share"), col("rate"))
      .orderBy(col("source"))
  }
}
