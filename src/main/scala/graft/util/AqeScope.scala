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
  * CONCURRENCY CONTRACT: [[off]] mutates the SHARED session's conf
  * for its window — right for the tight driver-side loops above
  * (Hierarchy/q53: milliseconds per round, caller-owned session),
  * wrong for LONG-scoped maintainers, where a concurrent query
  * planned mid-window (a streaming micro-batch, a dashboard read)
  * silently runs without AQE's skew handling for that batch.
  * [[isolatedOff]] is the long-scope form: it clones the session
  * (`spark.newSession()` — shared SparkContext, cached data and
  * catalog tables; PRIVATE conf) and hands the body the clone, so
  * the caller's session is never touched. Frames must be REBUILT
  * from the clone (a DataFrame plans with the conf of the session
  * that created it); the global-temp-view bridge is the public
  * cross-session path — see NearDupIndex.maintain for the pattern.
  */
object AqeScope {

  private val Key = "spark.sql.adaptive.enabled"

  /** Run `body` with AQE off ON THE SHARED SESSION, restoring the
    * previous setting after — unless `keepAqe` (the caller wants
    * skew-join splitting inside the loop), in which case `body` runs
    * untouched. For tight same-thread loops only; long-scoped
    * maintainers use [[isolatedOff]].
    */
  def off[T](spark: SparkSession, keepAqe: Boolean = false)(body: => T): T =
    if (keepAqe) body
    else {
      val prev = spark.conf.get(Key, "true")
      spark.conf.set(Key, "false")
      try body finally spark.conf.set(Key, prev)
    }

  /** Run `body` against a CLONED session whose AQE is off (or whose
    * conf is untouched under `keepAqe`), leaving the caller's
    * session conf invisible to the scope and vice versa — a
    * concurrent query planned on `spark` mid-window still sees
    * `spark.sql.adaptive.enabled=true`. The clone shares the
    * SparkContext, cache and external catalog (writes/reads inside
    * the body hit the same tables); runtime conf set on the CALLER
    * session after startup is NOT inherited (newSession starts from
    * the SparkConf) — acceptable for maintainers, whose tuning lives
    * in builder conf.
    */
  def isolatedOff[T](spark: SparkSession, keepAqe: Boolean = false)
                    (body: SparkSession => T): T = {
    val iso = spark.newSession()
    if (!keepAqe) iso.conf.set(Key, "false")
    body(iso)
  }
}
