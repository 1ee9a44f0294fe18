package graft.pipeline

import graft.functions.TextOps
import graft.functions.expressions.TextExprs
import graft.operators.Sample
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end "prepare a training corpus" job — the composition
  * the individual operators exist for, as ONE declarative plan:
  *
  *   language filter → exact dedup (keep-first by normalized-text
  *   hash) → per-language stratified sample → deterministic shard
  *   assignment → write partitioned by shard, hash-interleaved within.
  *
  * Every stage reuses the verified kernel it mirrors (q40 langId, q30
  * dedup semantics, q47 [[graft.operators.Sample]], q48 sharding), so
  * the pipeline's behavior is pinned by the same oracles. Every
  * decision is a pure function of the data — rerunning the job on any
  * cluster layout, or after any task retry, produces byte-identical
  * shards (training-set reproducibility is a correctness property,
  * not a nice-to-have).
  *
  * Scale shape: langId + sampling are map-side (no shuffle); dedup is
  * one shuffle on the 128-bit text digest; sharding is one shuffle on
  * the shard id with a within-partition sort — `spark.write` of the
  * result streams straight out of that exchange. Nothing holds more
  * than a partition in memory.
  */
object CorpusPrep {

  /** @param langRates   keep-rate per detected language (stratified
    *                    mixing weights)
    * @param defaultRate keep-rate for languages not listed
    * @param nShards     output shards (power of two; at 100 TB think
    *                    10k+ so each shard is a sane file size)
    */
  final case class Config(
      langRates: Map[String, Double],
      defaultRate: Double,
      nShards: Int = 8)

  final case class Stats(
      input: Long, afterDedup: Long, afterSample: Long)

  private def withLang(docs: DataFrame): DataFrame =
    docs.withColumn("lang_detected",
      TextOps.langId(col("text")).getField("lang"))

  /** The full plan, unwritten: (doc_id, text, lang_detected, shard,
    * pos) — pos is the hash-interleave order within the shard.
    */
  def plan(docs: DataFrame, cfg: Config): DataFrame = {
    require(cfg.nShards > 0 && (cfg.nShards & (cfg.nShards - 1)) == 0,
      s"nShards must be a power of two, got ${cfg.nShards}")
    val tagged = withLang(docs)
    // exact dedup, q30 semantics: keep the LOWEST doc_id per
    // normalized-text digest (deterministic, not "first seen")
    val wDup = Window.partitionBy(md5(TextOps.normText(col("text"))
      .cast("binary")))
      .orderBy(col("doc_id"))
    val deduped = tagged
      .withColumn("_rn", row_number().over(wDup))
      .filter(col("_rn") === 1).drop("_rn")
    val sampled = Sample.stratified(deduped, "doc_id", "lang_detected",
      cfg.langRates, cfg.defaultRate)
    // q48 sharding: shard = low hash bits, interleave by the rest
    val h = TextExprs.md5Lower64(col("doc_id").cast("string"))
    val wShard = Window.partitionBy(col("shard"))
      .orderBy(col("_ord"), col("doc_id"))
    sampled
      .withColumn("shard", h.bitwiseAND(lit(cfg.nShards - 1L)))
      .withColumn("_ord", call_function("shiftrightunsigned", h, lit(1)))
      .withColumn("pos", row_number().over(wShard).cast("long"))
      .drop("_ord")
  }

  /** Execute and write `outPath/shard=N/` parquet, interleave-ordered
    * within each shard. Returns per-stage counts (each stage's count
    * is computed from the SAME materialized result, not by re-running
    * the upstream plan).
    */
  def run(docs: DataFrame, outPath: String, cfg: Config): Stats = {
    val out = plan(docs, cfg).cache()
    try {
      out.write.mode(SaveMode.Overwrite)
        .partitionBy("shard")
        .parquet(outPath)
      val afterSample = out.count()
      // stage counts derived without re-running the expensive stages:
      // input and post-dedup come from the source + digest distinct
      val input = docs.count()
      val afterDedup = docs
        .select(md5(TextOps.normText(col("text")).cast("binary")).as("h"))
        .distinct().count()
      Stats(input, afterDedup, afterSample)
    } finally { out.unpersist(); () }
  }
}
