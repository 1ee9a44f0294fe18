package graft.util

import org.apache.spark.sql.SparkSession

/** Scoped disable of adaptive query execution for ITERATIVE LOOPS —
  * the one shared definition of the save/set/restore discipline
  * ([[graft.operators.Hierarchy.closureScoped]] and q53's label
  * propagation both need it; a third copy would drift).
  *
  * Why: AQE materializes every exchange as its own query stage and
  * re-optimizes between them — a driver round trip per exchange, PER
  * ROUND, bought for nothing when the loop's co-keyed partitioning is
  * static and the per-round frames do not change shape (measured 3.7×
  * on the closure oracle face at sf0.01). The conf is a SESSION conf:
  * a concurrent query STARTED inside the window runs without AQE — a
  * perf wobble, never a correctness one. The restore runs in a
  * finally, so no failure path leaves the session altered (a hard JVM
  * kill inside the window dies with the session — nothing persists).
  *
  * CONCURRENCY CONTRACT, stated for callers: long-scoped users
  * (NearDupIndex.maintain scopes a whole delta cycle) must not share
  * a SparkSession with latency-sensitive concurrent queries — e.g. a
  * streaming micro-batch planned inside the window silently runs
  * without AQE's skew handling for that batch. Isolation recipe: run
  * the maintainer against `spark.newSession()` (shared SparkContext +
  * cache, private conf) and build its input frames FROM that session
  * — a DataFrame plans with the conf of the session that created it,
  * so frames minted outside the clone would not inherit the scope.
  */
object AqeScope {

  private val Key = "spark.sql.adaptive.enabled"

  /** Run `body` with AQE off, restoring the previous setting after —
    * unless `keepAqe` (the caller wants skew-join splitting inside
    * the loop), in which case `body` runs untouched.
    */
  def off[T](spark: SparkSession, keepAqe: Boolean = false)(body: => T): T =
    if (keepAqe) body
    else {
      val prev = spark.conf.get(Key, "true")
      spark.conf.set(Key, "false")
      try body finally spark.conf.set(Key, prev)
    }
}
