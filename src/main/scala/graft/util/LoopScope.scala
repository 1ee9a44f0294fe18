package graft.util

import org.apache.spark.sql.SparkSession

/** Scoped loop-state partitioning for ITERATIVE OPERATORS (r19, guide
  * §2.2 "fewer, larger partitions" applied to the loop floor).
  *
  * The iterative operators (LabelProp, Hierarchy) run O(log diameter)
  * rounds of joins over a loop-state frame whose size is KNOWN before
  * the loop starts (the edge/node frame is materialized — cached or
  * checkpointed — and counted). Leaving the loop's exchanges at the
  * session's static `spark.sql.shuffle.partitions` (the r18 shape)
  * made every micro-round a core-count-wide stage: q103 profiled 31
  * stages × 32 tasks over ≤ 15 k-row frames, ~1 000 tasks of pure
  * dispatch for ~2 s of wall at sf0.1. Leaving AQE on instead
  * (LabelProp's r18 posture) sizes the stages correctly but pays a
  * driver re-planning round trip PER EXCHANGE PER ROUND — the
  * documented reason Hierarchy's loop already scopes AQE off
  * (AqeScope, measured 3.7× there).
  *
  * This scope is the third point in that trade space and strictly
  * size-adaptive: AQE off (no per-stage driver round trips) AND the
  * static partition count derived from the materialized loop-state
  * ROW COUNT — one partition per [[RowsPerPartition]] rows, so the
  * sf0.1 faces run single-task rounds while a 10⁹-edge graph at 100 TB
  * gets thousands of partitions. No local core count is encoded
  * anywhere; the conf is restored in a finally (the AqeScope
  * discipline, same session-scoped concurrency contract).
  */
object LoopScope {

  /** Loop-state rows per shuffle partition. Loop state is a few longs
    * per row (ids + label/depth ≈ 24–48 B serialized), so 4 Mi rows ≈
    * 100–200 MB per partition — the guide §2.2 target range. Chosen by
    * bytes, not by any core count.
    */
  val RowsPerPartition: Long = 1L << 22

  def partitionsFor(rows: Long): Int =
    math.min((rows + RowsPerPartition - 1) / RowsPerPartition, 1L << 20)
      .max(1L).toInt

  /** Run `body` with AQE scoped off and `spark.sql.shuffle.partitions`
    * scoped to [[partitionsFor]] (rows), restoring both after. Under
    * `keepAqe` the AQE conf is untouched (the Hierarchy escape hatch
    * for skew-splitting a celebrity-key graph) but the loop partition
    * sizing still applies — AQE coalesces FROM it.
    */
  def sized[T](spark: SparkSession, rows: Long, keepAqe: Boolean = false)
              (body: => T): T =
    withParts(spark, partitionsFor(rows), keepAqe)(body)

  /** Input-BYTES-sized variant for one-shot (non-loop) operators whose
    * construction AND materialization run inside `body` (the q96
    * entry shape): partitions from the planner's own size estimate of
    * the input frame — file-size-based, no action, no local constant.
    * ~256 MB of input per partition: the guide §2.2 range, applied to
    * the INPUT because every intermediate of these operators
    * (shingle/anchor hashes) is within a small factor of it.
    */
  def sizedForInput[T](df: org.apache.spark.sql.DataFrame,
                       keepAqe: Boolean = false)(body: => T): T = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = (bytes / (256L << 20)).min(1L << 20).max(1L).toLong.toInt
    withParts(df.sparkSession, parts, keepAqe)(body)
  }

  private def withParts[T](spark: SparkSession, parts: Int,
                           keepAqe: Boolean)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, parts.toString)
    try AqeScope.off(spark, keepAqe)(body)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
