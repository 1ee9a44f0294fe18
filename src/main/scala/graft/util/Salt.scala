package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salting: split hot keys across `factor` synthetic sub-keys so
  * no single task owns a hot key's entire volume.
  *
  * AQE's skew-join splitting handles most skew at runtime, but two
  * shapes still need explicit salt at 100 TB:
  *  - skewed AGGREGATIONS (AQE splits join partitions, not agg groups):
  *    salt → partial agg per (key, salt) → final agg per key turns one
  *    hot reducer into `factor` parallel ones;
  *  - skewed joins against a SMALL side: replicate the small side per
  *    salt value and join on (key, salt) — each hot-key shard meets
  *    its own copy.
  */
object Salt {

  val SaltCol = "_graft_salt"

  /** Random-but-deterministic salt in [0, factor): derived from the
    * row's whole content hash, not an RNG (re-runs and retries must
    * salt identically).
    *
    * Caveat: content salt spreads DISTINCT rows of a hot key; a key
    * whose volume is bit-identical duplicate rows lands on one salt.
    * That shape is an exact-dedup problem (q30) — dedup first, then
    * aggregate.
    */
  def addSalt(df: DataFrame, factor: Int): DataFrame = {
    require(!df.columns.contains(SaltCol),
      s"input already has a $SaltCol column — drop or rename it first " +
        "(withColumn would silently overwrite it and skewJoin would drop it)")
    df.withColumn(SaltCol,
      pmod(hash(df.columns.map(col).toSeq: _*), lit(factor)))
  }

  /** Two-phase skew-safe aggregation: `aggs` must be decomposable
    * (sum/count/min/max — merge of partials == total). Phase 1
    * aggregates per (key, salt) spreading a hot key over `factor`
    * reducers; phase 2 merges the partials per key.
    */
  def skewAgg(df: DataFrame, keys: Seq[String], factor: Int,
              partialAggs: Seq[Column], mergeAggs: Seq[Column]): DataFrame = {
    val salted = addSalt(df, factor)
    val phase1 = salted
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Skew-safe join of a skewed LEFT against a small RIGHT: left gets
    * a content salt, right is replicated `factor` times (explode), and
    * the join key becomes (key, salt). Right must be small enough to
    * replicate — which is exactly the skewed-join case worth salting.
    */
  def skewJoin(left: DataFrame, right: DataFrame, key: String,
               factor: Int): DataFrame = {
    val saltedLeft = addSalt(left, factor)
    val replicatedRight = right.withColumn(SaltCol,
      explode(sequence(lit(0), lit(factor - 1))))
    saltedLeft.join(replicatedRight, Seq(key, SaltCol)).drop(SaltCol)
  }
}
