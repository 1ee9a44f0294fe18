package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a MATERIALIZED JOIN VIEW — the join
  * analogue of [[StatsMaintain]] (which maintains aggregate views).
  * The reference's hosted pipelines re-run a load end-to-end per job;
  * at 100 TB a standing `facts ⋈ dim` view cannot be re-joined for
  * every delta batch — the view must be repaired from the deltas.
  *
  * Contract: the view is the INNER equi-join
  * `left ⋈ right ON left(leftJoinCol) = right(rightJoinCol)` where
  *  - `leftKey` uniquely identifies left rows (the view inherits it), and
  *  - `rightJoinCol` uniquely identifies right rows (a dimension).
  * Both base tables are snapshot-maintained by the caller (e.g.
  * [[Merge.upsert]]); [[maintain]] is called AFTER the bases are
  * updated, with the same delta batches, and repairs only the
  * affected slice:
  *
  *   affected = leftKey ∈ keys(ΔL)  ∪  joinCol ∈ keys(ΔR)
  *   view' = view − affected  ∪  (left' restricted to affected) ⋈ right'
  *
  * Because the recompute reads the CURRENT base snapshots, every
  * delta shape is handled by the same equation: inserts and updates
  * land in the recomputed slice; a left row whose join key MOVED
  * leaves its old view row (dropped by the leftKey filter) and joins
  * its new dimension; tombstones on either base (Merge `deleteCol`)
  * need no special casing — a deleted left row is absent from
  * `left'`, a deleted dimension key inner-joins to nothing — provided
  * the delta batch still CARRIES the tombstoned keys (Merge batches
  * do). Replaying the same maintain is idempotent (the recompute is a
  * pure function of the current bases), so no applied-batch ledger is
  * needed — unlike additive stats.
  *
  * Scale shape: the three delta-key probes are expressed as semi/anti
  * joins against the distinct delta keys, so Catalyst broadcasts them
  * when small (the common case: the old view and `left'` are each ONE
  * scan + broadcast anti/semi probe, no shuffle of either), and falls
  * back to a key-partitioned join for a giant batch. The recompute
  * join shuffles only delta-sized data when the slice broadcasts;
  * `right'` is never materialized beyond its matching keys. Publish
  * is the shared atomic [[Snapshot]] swap under the single-writer
  * lock, held over the whole read-repair-publish cycle.
  */
object ViewMaintain {

  final case class Spec(
      leftKey: String, leftJoinCol: String, rightJoinCol: String)

  private def joined(left: DataFrame, right: DataFrame, spec: Spec) = {
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty,
      s"view sides share column name(s) ${overlap.mkString(", ")}: " +
        "the materialized view would be ambiguous — rename one side")
    left.join(right, left(spec.leftJoinCol) === right(spec.rightJoinCol))
  }

  /** Initial full materialization (also the bootstrap path
    * [[maintain]] takes when the view does not exist yet).
    */
  def build(spark: SparkSession, viewPath: String,
            left: DataFrame, right: DataFrame, spec: Spec): Unit = {
    val fs = new Path(viewPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Snapshot.withMaintainerLock(fs, viewPath) { lease =>
      val exists = Snapshot.recoverAndExists(fs, viewPath, lease)
      Snapshot.publish(fs, viewPath, exists, joined(left, right, spec), lease)
    }
    // the swap replaced the directory contents: drop any cached file
    // listing so the next read (often this maintainer's own) sees the
    // new snapshot, not a retired listing
    spark.catalog.refreshByPath(viewPath)
  }

  /** Repair the view after `leftDelta`/`rightDelta` were applied to
    * the base snapshots. Either delta may be empty. The deltas only
    * contribute their KEY columns here — payloads are read from the
    * current bases, which is what makes replay idempotent.
    */
  def maintain(spark: SparkSession, viewPath: String,
               left: DataFrame, right: DataFrame,
               leftDelta: DataFrame, rightDelta: DataFrame,
               spec: Spec, lockWaitMs: Long = 0L): Unit = {
    val fs = new Path(viewPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Snapshot.withMaintainerLock(fs, viewPath, lockWaitMs) { lease =>
      val exists = Snapshot.recoverAndExists(fs, viewPath, lease)
      if (!exists) {
        // bootstrap: the deltas are already IN the bases
        Snapshot.publish(fs, viewPath, exists = false,
          joined(left, right, spec), lease)
      } else {
        // distinct delta keys, renamed so probes are unambiguous
        val dl = leftDelta.select(col(spec.leftKey).as("_vm_lk")).distinct()
        val dr =
          rightDelta.select(col(spec.rightJoinCol).as("_vm_jk")).distinct()
        val old = spark.read.parquet(viewPath)
        val kept = old
          .join(dl, old(spec.leftKey) === col("_vm_lk"), "left_anti")
          .join(dr, old(spec.leftJoinCol) === col("_vm_jk"), "left_anti")
        // left' slice: rows whose own key OR whose dimension changed.
        // Two semi probes + union, deduped on the unique leftKey (a
        // row can qualify both ways).
        val byOwnKey = left.join(dl, left(spec.leftKey) === col("_vm_lk"),
          "left_semi")
        val byDim = left.join(dr, left(spec.leftJoinCol) === col("_vm_jk"),
          "left_semi")
        val slice = byOwnKey.unionByName(byDim).dropDuplicates(spec.leftKey)
        val repaired = joined(slice, right, spec).select(
          old.columns.map(col).toIndexedSeq: _*)
        Snapshot.publish(fs, viewPath, exists = true,
          kept.unionByName(repaired), lease)
      }
    }
    spark.catalog.refreshByPath(viewPath)
  }

  /** Shared partition plumbing for the partitioned layout
    * `viewPath/partCol=value/…` (the [[Merge.upsertPartitioned]]
    * shape): validates the spec, escapes values the way Spark's
    * partitioned writer does, and loops the per-partition body over
    * the touched values. A null partition value has no directory to
    * live in — reject loudly instead of losing rows.
    */
  private def forEachPartition(spark: SparkSession, viewPath: String,
                               partCol: String, spec: Spec,
                               touchedRightCols: Seq[String],
                               touched: DataFrame)
                              (body: (Any, String) => Unit): Unit = {
    require(partCol != spec.leftKey && partCol != spec.leftJoinCol,
      s"partition column $partCol must not be the left key or join column " +
        "(it is stored as the directory name, not in the data files)")
    require(!touchedRightCols.contains(partCol),
      s"partition column $partCol collides with a right-side column: " +
        "partition discovery over the view would see it twice")
    val values = touched.distinct().collect().map(_.get(0))
    require(!values.contains(null),
      s"partitioned view maintenance: rows with null $partCol")
    val fs = new Path(viewPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(viewPath))
    values.foreach { v =>
      val dirName = org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.escapePathName(v.toString)
      body(v, s"$viewPath/$partCol=$dirName")
    }
  }

  /** Initial full materialization in the PARTITIONED layout: one
    * [[build]] per distinct `partCol` value of `left`, each an
    * independently swapped snapshot directory. `partCol` must be a
    * LEFT column; it is encoded as the directory name (partition
    * discovery restores it on a whole-view read) and dropped from the
    * data files.
    *
    * Type caveat (the standard Spark partition-discovery drift, which
    * this layout inherits): a whole-view `spark.read.parquet(viewPath)`
    * RE-INFERS partCol's type from the directory names — an int64
    * partCol reads back int32, and a numeric-LOOKING string value
    * ('00123') comes back as the integer 123, silently changed.
    * Consumers that need the exact build-time type must read with an
    * explicit schema or set
    * `spark.sql.sources.partitionColumnTypeInference.enabled=false`
    * (partCol then reads as string); per-partition reads inside
    * [[maintainPartitioned]] are unaffected (the value never
    * round-trips through inference there — each repair uses the
    * caller's typed value directly).
    */
  def buildPartitioned(spark: SparkSession, viewPath: String,
                       left: DataFrame, right: DataFrame, spec: Spec,
                       partCol: String): Unit = {
    val l = left.cache()
    try forEachPartition(spark, viewPath, partCol, spec,
      right.columns.toSeq, l.select(col(partCol))) { (v, partPath) =>
      build(spark, partPath,
        l.filter(col(partCol) === lit(v)).drop(partCol), right, spec)
    } finally { l.unpersist(); () }
  }

  /** Partition-pruned repair — the 100 TB form of [[maintain]]: only
    * the partitions holding AFFECTED keys are read, repaired and
    * atomically swapped; every untouched `partCol=` directory's files
    * are left byte-identical (never opened, never rewritten). The
    * single-view [[maintain]] rewrites O(|view|) per delta batch —
    * correct, but at a 100 TB standing view with kilobyte deltas the
    * publish I/O alone is the bottleneck; this variant's cost is
    * O(touched partitions), the [[Merge.upsertPartitioned]] +
    * CorpusPrep.forget shard-swap discipline applied to the view.
    *
    * Touched partitions:
    *  - every partition value carried by `leftDelta` rows (like
    *    upsertPartitioned, delta rows must carry `partCol`, and a left
    *    key's partition value must be STABLE — moving a row between
    *    partitions is a tombstone in one plus an insert in the other);
    *  - every partition holding a CURRENT left row whose join key is
    *    in `rightDelta` (one column-pruned scan of `left` + a semi
    *    probe — a deployment with a dimension-to-partition index can
    *    skip even that, but correctness only needs the probe).
    * A dimension key deleted while its old left matches were ALSO
    * deleted needs no partition at all: those view rows were repaired
    * by the leftDelta that removed them.
    *
    * Per touched partition the repair equation is exactly
    * [[maintain]]'s, against that partition's slice of the bases; the
    * full `rightDelta` key set probes every touched partition (only
    * rows actually matching repair). Replay is idempotent per
    * partition for the same reason maintain is.
    */
  def maintainPartitioned(spark: SparkSession, viewPath: String,
                          left: DataFrame, right: DataFrame,
                          leftDelta: DataFrame, rightDelta: DataFrame,
                          spec: Spec, partCol: String,
                          lockWaitMs: Long = 0L): Unit = {
    val l = left.cache()
    try {
      val drKeys = rightDelta.select(col(spec.rightJoinCol)).distinct()
      val fromLeft = leftDelta.select(col(partCol))
      val fromRight = l
        .join(drKeys, l(spec.leftJoinCol) === drKeys(spec.rightJoinCol),
          "left_semi")
        .select(col(partCol))
      forEachPartition(spark, viewPath, partCol, spec,
        right.columns.toSeq, fromLeft.unionByName(fromRight)) { (v, partPath) =>
        maintain(spark, partPath,
          l.filter(col(partCol) === lit(v)).drop(partCol), right,
          leftDelta.filter(col(partCol) === lit(v)), rightDelta, spec,
          lockWaitMs)
      }
    } finally { l.unpersist(); () }
  }
}
