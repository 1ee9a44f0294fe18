package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism floor for CPU-heavy per-row kernels (r18,
  * optimization guide §2/§6).
  *
  * The driver's parquet fixtures are single-file, SINGLE-ROW-GROUP
  * tables, and a parquet row group is indivisible: no split-size knob
  * (`maxPartitionBytes`, `openCostInBytes`, `minPartitionNum`) can
  * put its rows in more than one scan task. Every narrow chain rooted
  * at such a scan — in particular the multimodal encode+decode
  * fixtures and the text-kernel maps, which are pure executor CPU —
  * therefore ran on ONE core until its first natural exchange
  * (measured r18 baseline: 33 queries with wall ≈ task-time ≈
  * CPU-time, q148 at 5.2 s on one of 32 cores).
  *
  * `byKey` repartitions a frame to `defaultParallelism` partitions by
  * a DETERMINISTIC key — guarded, so it is strictly scale-adaptive:
  *
  *  - At production scale a scan of real data has at least as many
  *    partitions as the cluster has cores and the guard makes this a
  *    NO-OP — no plan change, no payload shuffle (the guide's §8 rule
  *    about not moving heavy bytes twice stays intact).
  *  - On a narrow scan it inserts one hash exchange of the (tiny)
  *    pre-kernel rows so the expensive kernel downstream runs on
  *    every core.
  *
  * Hash-by-key rather than round-robin: the row→partition map is a
  * pure function of the data (reproducible under task retry /
  * speculation — guide §2.5's SPARK-38388 caveat), and it skips
  * round-robin's sort-before-repartition pass. The explicit partition
  * COUNT pins the exchange against AQE's small-partition coalescing
  * (origin REPARTITION_BY_NUM), which would otherwise immediately
  * re-merge the tiny shuffle back onto one core.
  *
  * Result-identity: callers apply this only below per-row kernels and
  * exact (decimal / integer / hash) aggregations, which are
  * partition-order independent by the repo's own oracle-parity
  * design; a final orderBy restores presentation order.
  */
object Spread {

  /** `df` repartitioned to the session's default parallelism by
    * `key`, when (and only when) its plan currently yields fewer
    * partitions than that.
    *
    * Use ONLY below single-consumer chains: because the output IS
    * hash-partitioned on `key`, a downstream operator clustered on
    * the same key gets its distribution satisfied and EnsureRequirements
    * drops the exchange it would have inserted — which is exactly the
    * exchange a DIAMOND plan reuses (ReusedExchange) to run the
    * kernel once. Measured r18: spreading q74's docs by doc_id
    * removed the doc-keyed island exchange and every consumer
    * recomputed the window-hash kernel (CPU 1.7 s → 11.3 s). Diamond
    * pipelines use [[neutral]].
    *
    * `maxParts` (r19) caps the floor's TARGET, not any natural width:
    * the r18 floor spread every narrow scan to the full
    * defaultParallelism, and the driver's 8-vs-32-core scaling block
    * showed the MID-WEIGHT kernels (office extract family, q137–q144
    * class) running FASTER on 8 cores than 32 (ratios 0.55–0.87) —
    * their per-row work saturates below full width, so the extra
    * tasks pay dispatch + taskBinary deserialization + hyperthread
    * contention for nothing. A call site whose kernel is measured to
    * saturate passes its saturation width; the cap binds ONLY when
    * the floor fires (a narrow scan), so production-wide scans are
    * untouched and even a pathological single-file production input
    * still gets `maxParts`-way parallelism instead of 1.
    *
    * Guard cost, stated plainly (r18 advice): `df.rdd` builds a
    * separate physical plan + RDD lineage at query-CONSTRUCTION time
    * per call site, and reads the pre-AQE partition count. Both are
    * acceptable here — the guarded frames are bare scans (planning is
    * microseconds) and the guard only gates an idempotent repartition,
    * so a divergent runtime count costs at most one redundant-but-
    * harmless exchange.
    */
  def byKey(df: DataFrame, key: Column,
            maxParts: Int = Int.MaxValue): DataFrame = {
    val target =
      math.min(df.sparkSession.sparkContext.defaultParallelism, maxParts)
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, key)
  }

  /** [[byKey]] with a partitioning-NEUTRAL derived key: hash
    * partitioning on `xxhash64(key)` spreads identically but does NOT
    * satisfy a downstream `ClusteredDistribution(key)`, so every
    * exchange the un-spread plan had — including the one a diamond's
    * consumers reuse — stays exactly where it was; the only plan
    * delta is this one guarded exchange directly above the scan.
    * Still deterministic per row (retry/speculation-safe, guide
    * §2.5), still a no-op at production scale via the guard.
    */
  def neutral(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target,
      org.apache.spark.sql.functions.xxhash64(key))
  }
}
