package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot corpus delta — the operator that FEEDS the
  * maintainer family: [[NearDupIndex.maintain]],
  * [[Search.maintainIndex]], [[graft.pipeline.StatsMaintain]] and the
  * streaming sinks all consume "the new docs since the last refresh",
  * and this computes exactly that set (plus removals and in-place
  * edits) from two corpus snapshots without trusting an upstream
  * change feed.
  *
  * Shape: both sides project to (id, 128-bit content digest) MAP-SIDE
  * — document text never crosses the exchange — then one full-outer
  * equi-join on the id classifies every row: present only on the new
  * side = `added`, only on the old = `removed`, digests differing =
  * `changed`; unchanged rows are FILTERED OUT, so the output is
  * delta-sized even when the inputs are 100 TB. The join shuffles
  * both digest sets once on the id; snapshots bucketed by the id
  * ([[graft.sources.Bucketed]]) diff with no exchange at all.
  */
object CorpusDiff {

  /** Per-doc change rows (idCol, change ∈ added|removed|changed),
    * unchanged docs absent. `digest` must be a deterministic pure
    * function of the row's content columns (default: md5 of the
    * null-coalesced text — the portable hash family convention).
    */
  def delta(oldSnap: DataFrame, newSnap: DataFrame,
            idCol: String = "doc_id",
            digest: Column = md5(coalesce(col("text"), lit("")))): DataFrame = {
    val o = oldSnap.select(col(idCol), digest.as("_dig_old"))
    val n = newSnap.select(col(idCol), digest.as("_dig_new"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("change",
        when(col("_dig_old").isNull, lit("added"))
          .when(col("_dig_new").isNull, lit("removed"))
          .when(col("_dig_old") =!= col("_dig_new"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(col(idCol), col("change"))
  }
}
