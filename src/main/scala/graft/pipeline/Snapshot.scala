package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode}

/** The atomic parquet-snapshot publish every snapshot-maintaining
  * operator shares ([[Merge.upsert]], [[Merge.scd2]],
  * [[StatsMaintain.maintain]]): write the new snapshot BESIDE the
  * target, then swap with two renames. Readers see the previous
  * complete snapshot until the publish, then the new one — never a
  * half-written directory. The instant between the renames has no
  * directory at the target: a reader there fails fast with not-found
  * rather than reading partial data, and a crash there is repaired by
  * [[recover]] on the next maintenance run, which reinstates the
  * retired snapshot before merging.
  *
  * SINGLE-WRITER CONTRACT: the protocol tolerates any number of
  * readers but exactly ONE maintainer per target path at a time —
  * readers see atomic swaps, but two concurrent maintainers can
  * delete each other's in-flight `._graft_tmp` (recovery treats a
  * stranger's tmp as crash garbage) and interleave the two-rename
  * swap into a lost update. The contract is ENFORCED best-effort by a
  * `._graft_lock` marker: [[publish]] atomically creates it (create
  * with overwrite=false — an existing lock fails the create) and
  * removes it in a finally, and [[recoverAndExists]] refuses to run
  * while it exists — so a streaming sink plus an ad-hoc batch
  * maintain on the same path fails LOUDLY instead of corrupting. A
  * hard JVM kill mid-publish leaves the lock behind (by design: the
  * tmp state it guards is also still there); after confirming no live
  * maintainer, clear it with [[forceUnlock]] and the next
  * recoverAndExists repairs as usual.
  */
private[pipeline] object Snapshot {

  private def oldPath(targetPath: String) = new Path(targetPath + "._graft_old")
  private def tmpPath(targetPath: String) = new Path(targetPath + "._graft_tmp")
  private def lockPath(targetPath: String) = new Path(targetPath + "._graft_lock")

  private def acquireLock(fs: FileSystem, targetPath: String): Unit = {
    val p = lockPath(targetPath)
    val ok =
      try { fs.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }
    if (!ok) throw new IllegalStateException(
      s"snapshot maintainer lock already held at $p: another maintainer " +
        "is publishing to this target (the protocol is single-writer per " +
        "path), or a previous maintainer was hard-killed mid-publish. " +
        "Verify no live maintainer runs, then Snapshot.forceUnlock the path.")
  }

  /** Clear a stale maintainer lock left by a hard-killed publish. Only
    * safe once no live maintainer targets the path.
    */
  def forceUnlock(fs: FileSystem, targetPath: String): Unit = {
    fs.delete(lockPath(targetPath), false); ()
  }

  /** Repair a crash between the two publish renames (previous
    * snapshot retired at `._graft_old`, nothing at the target) and
    * report whether a snapshot now exists. Run BEFORE reading the
    * target — skipping it would silently treat existing data as a
    * fresh bootstrap.
    */
  def recoverAndExists(fs: FileSystem, targetPath: String): Boolean = {
    // refuse to "repair" while another maintainer holds the lock: its
    // in-flight tmp is NOT crash garbage, and deleting it (below)
    // would corrupt that writer mid-publish
    if (fs.exists(lockPath(targetPath)))
      throw new IllegalStateException(
        s"snapshot at $targetPath is locked by an in-flight maintainer " +
          "(single-writer contract); if that maintainer was hard-killed, " +
          "Snapshot.forceUnlock the path first.")
    val dst = new Path(targetPath)
    if (!fs.exists(dst) && fs.exists(oldPath(targetPath))) {
      if (!fs.rename(oldPath(targetPath), dst))
        throw new java.io.IOException(
          s"snapshot recovery: cannot reinstate ${oldPath(targetPath)}")
    }
    // a stray tmp dir is garbage from a crashed WRITE (before any
    // rename) — clear it so it can't linger (inside a partitioned
    // tree it would otherwise pollute partition discovery forever)
    if (fs.exists(tmpPath(targetPath))) fs.delete(tmpPath(targetPath), true)
    fs.exists(dst)
  }

  /** Materialize `result` and swap it in as the new snapshot.
    *
    * `beforeSwap` runs against the fully-written temp directory
    * BEFORE the renames: anything it adds (sidecar files, applied-
    * batch ledgers) becomes visible in the same atomic swap as the
    * data — the hook that lets a NON-idempotent maintainer (e.g.
    * additive stats) be exactly-once, because "the batch's data" and
    * "the record that the batch applied" cannot be separated by a
    * crash. Spark's own `_SUCCESS`/metadata files live in the same
    * directory already, so an extra `_`-prefixed file is invisible to
    * parquet readers.
    */
  def publish(fs: FileSystem, targetPath: String, exists: Boolean,
              result: DataFrame,
              beforeSwap: Path => Unit = _ => ()): Unit = {
    acquireLock(fs, targetPath)
    try {
      val tmp = tmpPath(targetPath)
      val dst = new Path(targetPath)
      val old = oldPath(targetPath)
      result.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      beforeSwap(tmp)
      if (exists) {
        if (fs.exists(old)) fs.delete(old, true)
        if (!fs.rename(dst, old))
          throw new java.io.IOException(s"snapshot swap: cannot retire $dst")
      }
      if (!fs.rename(tmp, dst))
        throw new java.io.IOException(s"snapshot swap: cannot publish $tmp")
      fs.delete(old, true)
      ()
    } finally forceUnlock(fs, targetPath)
  }
}
