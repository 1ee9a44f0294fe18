package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Bloom semi-join reduction — the classic runtime-filter optimization
  * (sideways information passing): when a large fact joins a SELECTIVE
  * build side, probe-side rows that cannot possibly match are dropped
  * BEFORE the join's shuffle, so the exchange moves only the ~matching
  * fraction of the fact instead of all of it. At 100 TB the join
  * shuffle is usually the dominant cost, and a date+predicate-filtered
  * dim often keeps <1% of keys — a kilobytes-sized Bloom filter then
  * eliminates ~99% of shuffle volume at the price of one extra
  * map-side probe per row.
  *
  * Exactness is unconditional: the Bloom filter has NO false negatives
  * (every real match survives the prefilter) and its false positives
  * are removed by the join itself — the reduced plan returns
  * bit-identical results to the plain join at ANY fp rate, which is
  * why q87's oracle is simply the plain join.
  *
  * Spark itself ships this idea as `spark.sql.optimizer.runtime.
  * bloomFilter.enabled` (injected only when its cost heuristics fire);
  * this operator is the EXPLICIT form a pipeline author applies when
  * they know the build side is selective — the sketch is built by
  * Spark's distributed `stat.bloomFilter` aggregate (driver holds only
  * the filter bits, never keys), sized exactly from a count of the
  * build side, and probed by the same native [[BloomSeen]] expression
  * the snapshot gate uses — the bits ride the task binary, the plan
  * gains a predicate, never a second join.
  *
  * Cost note: building materializes the build side once (count +
  * sketch aggregate — two small jobs before the main query runs),
  * exactly like [[SnapshotBloom.build]]. Worth it when
  * |build| ≪ |probe|; pointless when the join keeps most of the fact.
  */
object RuntimeFilter {

  /** Return `large` with a membership prefilter on `largeKey`: only
    * rows whose key MIGHT appear in `small`'s `smallKey` set survive.
    * Keys must be integral (cast to long — the 64-bit probe family);
    * a NULL build-side key never equi-joins, so it is not added, and a
    * NULL probe-side key is dropped (it cannot match either).
    *
    * An EMPTY build side short-circuits to `large.filter(false)`:
    * the join result is provably empty, and `stat.bloomFilter` cannot
    * size a filter for zero items.
    */
  def bloomReduce(large: DataFrame, largeKey: Column,
                  small: DataFrame, smallKey: Column,
                  fpp: Double = 0.01): DataFrame = {
    val keys = small.select(smallKey.cast("long").as("k"))
      .filter(col("k").isNotNull)
    val n = keys.count()
    if (n == 0) return large.filter(lit(false))
    val bf = keys.stat.bloomFilter("k", n, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    large.filter(largeKey.isNotNull && Bridge.column(
      BloomSeen(Bridge.expression(largeKey.cast("long")), bytes)))
  }
}
