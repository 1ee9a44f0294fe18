package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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

  private def joined(left: DataFrame, right: DataFrame, spec: Spec,
                     ignore: Set[String] = Set.empty) = {
    val overlap =
      (left.columns.toSet -- ignore) intersect right.columns.toSet
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

  // ---- partitioned layout (`viewPath/partCol=value/…`) ----

  /** Resolve `partCol` to the left frame's OWN attribute case and
    * validate the partitioned spec (the [[Merge.upsertPartitioned]]
    * rationale: the partitioned writer names directories after the
    * ATTRIBUTE, so a caller-cased mismatch would probe directories
    * the writer never writes and swap fabricated empties over data).
    */
  private def resolvePartCol(spark: SparkSession, left: DataFrame,
                             right: DataFrame, partCol: String,
                             spec: Spec): String = {
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def norm(n: String): String =
      if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    val r = left.columns.find(c => norm(c) == norm(partCol))
      .getOrElse(throw new IllegalArgumentException(
        s"partitioned view: partition column $partCol not found in " +
          s"left columns ${left.columns.mkString(", ")}"))
    require(norm(r) != norm(spec.leftKey) && norm(r) != norm(spec.leftJoinCol),
      s"partition column $r must not be the left key or join column " +
        "(it is stored as the directory name, not in the data files)")
    require(!right.columns.exists(c => norm(c) == norm(r)),
      s"partition column $r collides with a right-side column: " +
        "partition discovery over the view would see it twice")
    r
  }

  /** Distinct touched partition values, collected as (typed value,
    * Spark's own `cast(string)` form). The cast string — exactly what
    * the partitioned writer stringifies before escaping — is what
    * names the directory; a JVM `toString` would diverge for types
    * like java.sql.Timestamp and silently swap empty dirs over data
    * (the Merge lesson). Null partition values have no directory to
    * live in — reject loudly instead of losing rows.
    */
  private def collectTouched(touched: DataFrame,
                             partCol: String): Array[(Any, String)] = {
    val vals = touched
      .select(col(partCol), col(partCol).cast("string").as("_str"))
      .distinct().collect().map(r => (r.get(0), r.getString(1)))
    require(!vals.exists(_._1 == null),
      s"partitioned view maintenance: rows with null $partCol")
    vals
  }

  /** Acquire every touched partition's maintainer lock in sorted path
    * order (two concurrent fused maintainers with overlapping sets
    * contend in a consistent order — the second fails fast at the
    * first contended lock, never deadlocks), recover each, then run
    * `body` with all leases in hand — the iterative
    * [[Snapshot.withMaintainerLocks]], so stack depth never tracks
    * the touched-partition count.
    */
  private def withAllLocks[T](fs: org.apache.hadoop.fs.FileSystem,
                              parts: List[(Any, String, String)],
                              lockWaitMs: Long)
      (body: List[(Any, String, String, Snapshot.Lease, Boolean)] => T): T =
    Snapshot.withMaintainerLocks(fs, parts.map(_._3), lockWaitMs) { ls =>
      body(parts.zip(ls).map { case ((v, dn, p), (lease, exists)) =>
        (v, dn, p, lease, exists)
      })
    }

  /** The fused publish ([[Merge]]'s `fusedCycle` write-and-swap half):
    * ONE partitioned write job produces every touched partition's new
    * contents under a sibling tmp tree; a touched partition whose rows
    * were ALL repaired away gets a ZERO-ROW parquet snapshot (with
    * schema — a bare dir would crash the next read; written once and
    * FS-copied, never one write job per empty partition); then each
    * partition swaps in with pure METADATA renames under its own
    * lease. Job count is O(1) in touched partitions.
    *
    * Deliberately NO repartition-by-partCol before the write (unlike
    * the append-mode index stores, which would otherwise accumulate
    * tasks×partitions files per maintain): each swap REPLACES its
    * directory wholesale, so file counts never accumulate across
    * cycles, and forcing one task per partition value would serialize
    * a large partition's rewrite through a single task.
    */
  private def writeAndSwap(spark: SparkSession,
                           fs: org.apache.hadoop.fs.FileSystem,
                           viewPath: String, partCol: String,
                           result: DataFrame,
                           parts: List[(Any, String, String, Snapshot.Lease, Boolean)])
      : Unit = {
    val tmpRoot = new Path(viewPath + "._graft_ptmp")
    if (fs.exists(tmpRoot)) fs.delete(tmpRoot, true)
    result.write.partitionBy(partCol)
      .mode(SaveMode.Overwrite).parquet(tmpRoot.toString)
    val missing = parts.filterNot { case (_, dirName, _, _, _) =>
      fs.exists(new Path(s"$tmpRoot/$partCol=$dirName")) }
    if (missing.nonEmpty) {
      val emptySchema = org.apache.spark.sql.types.StructType(
        result.schema.fields.filterNot(_.name == partCol))
      val emptyDir = new Path(s"$tmpRoot/_graft_empty")
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema)
        .write.mode(SaveMode.Overwrite).parquet(emptyDir.toString)
      missing.foreach { case (_, dirName, _, _, _) =>
        org.apache.hadoop.fs.FileUtil.copy(fs, emptyDir, fs,
          new Path(s"$tmpRoot/$partCol=$dirName"), false,
          spark.sparkContext.hadoopConfiguration)
        ()
      }
    }
    parts.foreach { case (_, dirName, partPath, lease, exists) =>
      Snapshot.publishWritten(fs, partPath, exists,
        new Path(s"$tmpRoot/$partCol=$dirName"), lease)
    }
    fs.delete(tmpRoot, true)
    ()
  }

  /** Initial full materialization in the PARTITIONED layout, FUSED:
    * ONE join + partitioned write job produces every partition's
    * contents, then each `partCol=` directory swaps in atomically
    * under its own maintainer lock — never one build cycle per value
    * (the driver-serial loop is the wall clock at 1000 partitions of
    * a real table; see [[maintainPartitioned]]). `partCol` must be a
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
    val pc = resolvePartCol(spark, left, right, partCol, spec)
    val l = left.cache()
    try {
      val touched = collectTouched(l.select(col(pc)), pc)
      if (touched.isEmpty) return
      val fs = new Path(viewPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new Path(viewPath))
      val parts = touched.map { case (v, str) =>
        val dirName = org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils.escapePathName(str)
        (v, dirName, s"$viewPath/$pc=$dirName")
      }.sortBy(_._2).toList
      withAllLocks(fs, parts, 0L) { locked =>
        val viewCols =
          (left.columns.filterNot(_ == pc) ++ right.columns).toSeq
        val result = joined(l, right, spec, ignore = Set(pc))
          .select((viewCols :+ pc).map(col): _*)
        writeAndSwap(spark, fs, viewPath, pc, result, locked)
      }
    } finally { l.unpersist(); () }
    spark.catalog.refreshByPath(viewPath)
  }

  /** Partition-pruned repair — the 100 TB form of [[maintain]]: only
    * the partitions holding AFFECTED keys are read, repaired and
    * atomically swapped; every untouched `partCol=` directory's files
    * are left byte-identical (never opened, never rewritten). The
    * single-view [[maintain]] rewrites O(|view|) per delta batch —
    * correct, but at a 100 TB standing view with kilobyte deltas the
    * publish I/O alone is the bottleneck; this variant's cost is
    * O(touched partitions) I/O with an O(1) JOB COUNT — the
    * [[Merge.upsertPartitioned]] fused cycle applied to the view.
    *
    * FUSED, not serial (r12): all touched partitions repair in ONE
    * Spark job set — one union of the touched partitions' old slices,
    * one delta-probed recompute against the bases, one partitioned
    * write to a sibling tmp tree, then per-partition METADATA swaps
    * under per-partition leases. The first cut ran a full lock + read
    * + repair + publish cycle per touched partition serially from the
    * driver (~0.7 s each measured in the NearDupIndex shard work); at
    * 1000 touched partitions the serial loop IS the wall clock. The
    * fusion keeps the pruning (untouched dirs never opened) and the
    * per-partition crash contract (each dir swaps through the same
    * `._graft_old` two-rename protocol, repaired by the next cycle's
    * recovery).
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
    * The repair equation is exactly [[maintain]]'s, evaluated over
    * the UNION of the touched partitions' slices: key stability is
    * what makes the global delta-key probes partition-correct (a
    * leftDelta key lives in exactly one partition, so a global anti/
    * semi probe matches only there — identical to per-partition
    * probes, without one job per partition). A touched partition that
    * does not exist yet bootstraps from its FULL left slice, like
    * [[maintain]]'s bootstrap. Replay is idempotent per partition for
    * the same reason maintain is.
    */
  def maintainPartitioned(spark: SparkSession, viewPath: String,
                          left: DataFrame, right: DataFrame,
                          leftDelta: DataFrame, rightDelta: DataFrame,
                          spec: Spec, partCol: String,
                          lockWaitMs: Long = 0L): Unit = {
    val pc = resolvePartCol(spark, left, right, partCol, spec)
    val l = left.cache()
    try {
      val drKeys = rightDelta.select(col(spec.rightJoinCol)).distinct()
      val fromLeft = leftDelta.select(col(pc))
      val fromRight = l
        .join(drKeys, l(spec.leftJoinCol) === drKeys(spec.rightJoinCol),
          "left_semi")
        .select(col(pc))
      val touched = collectTouched(fromLeft.unionByName(fromRight), pc)
      if (touched.isEmpty) return
      val fs = new Path(viewPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new Path(viewPath))
      val parts = touched.map { case (v, str) =>
        val dirName = org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils.escapePathName(str)
        (v, dirName, s"$viewPath/$pc=$dirName")
      }.sortBy(_._2).toList
      withAllLocks(fs, parts, lockWaitMs) { locked =>
        val dl = leftDelta.select(col(spec.leftKey).as("_vm_lk")).distinct()
        val dr =
          rightDelta.select(col(spec.rightJoinCol).as("_vm_jk")).distinct()
        val viewCols =
          (left.columns.filterNot(_ == pc) ++ right.columns).toSeq
        // old slices: each EXISTING touched partition read directly
        // (no partition discovery — its value re-attaches as a typed
        // literal), united, then globally anti-probed (key stability
        // makes the global probe partition-exact, see above). Refresh
        // each dir first: an earlier maintain's swap may have left a
        // retired file listing cached for it
        // explicit read schema (the bases' own field types): per-dir
        // schema INFERENCE would cost one footer-read job per touched
        // partition — the fused cycle's job count must not scale
        val dataSchema = org.apache.spark.sql.types.StructType(
          viewCols.map(c =>
            left.schema.fields.find(_.name == c)
              .getOrElse(right.schema(c))))
        val oldSlices = locked.collect { case (v, _, p, _, true) =>
          spark.catalog.refreshByPath(p)
          spark.read.schema(dataSchema).parquet(p)
            .select(viewCols.map(col): _*)
            .withColumn(pc, lit(v))
        }
        // ONE anti-probe pair over the UNION of the old slices — one
        // probe per touched SET, never per partition (a per-partition
        // probe would re-grow the job count AQE-stage by AQE-stage,
        // the exact scaling the fusion exists to kill)
        val kept = if (oldSlices.isEmpty) Nil else {
          val old = oldSlices.reduce(_ unionByName _)
          List(old
            .join(dl, old(spec.leftKey) === col("_vm_lk"), "left_anti")
            .join(dr, old(spec.leftJoinCol) === col("_vm_jk"), "left_anti"))
        }
        // left' slice: delta-probed rows of existing touched
        // partitions + the FULL left slice of bootstrap partitions
        val existVals = locked.collect { case (v, _, _, _, true) => v }
        val bootVals = locked.collect { case (v, _, _, _, false) => v }
        val lExist = if (existVals.isEmpty) l.limit(0)
                     else l.filter(col(pc).isin(existVals: _*))
        val byOwnKey = lExist
          .join(dl, lExist(spec.leftKey) === col("_vm_lk"), "left_semi")
        val byDim = lExist
          .join(dr, lExist(spec.leftJoinCol) === col("_vm_jk"), "left_semi")
        val boot = if (bootVals.isEmpty) l.limit(0)
                   else l.filter(col(pc).isin(bootVals: _*))
        val slice = byOwnKey.unionByName(byDim).unionByName(boot)
          .dropDuplicates(spec.leftKey)
        val repaired = joined(slice, right, spec, ignore = Set(pc))
          .select((viewCols :+ pc).map(col): _*)
        val result = kept.foldLeft(repaired)(_ unionByName _)
        writeAndSwap(spark, fs, viewPath, pc, result, locked)
      }
    } finally { l.unpersist(); () }
    spark.catalog.refreshByPath(viewPath)
  }
}
