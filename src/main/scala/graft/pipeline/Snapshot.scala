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
  * [[recoverAndExists]] on the next maintenance run, which reinstates
  * the retired snapshot before merging.
  *
  * SINGLE-WRITER CONTRACT: the protocol tolerates any number of
  * readers but exactly ONE maintainer per target path at a time. The
  * hazard is not only the rename swap — every maintainer is a
  * read-merge-write cycle, and two maintainers interleaving
  * read → (other publishes) → publish silently discard the first
  * publish's merge (a lost update) even when the swaps themselves
  * never overlap. So the `._graft_lock` marker is held for the WHOLE
  * cycle, not just the publish: a maintainer calls
  * [[withMaintainerLock]] FIRST (atomic create with overwrite=false —
  * an existing lock fails the create and raises loudly), and the
  * [[Lease]] it receives is the compile-time-required proof of
  * exclusion that [[recoverAndExists]] and [[publish]] demand. A
  * streaming sink plus an ad-hoc batch maintain on the same path, or
  * two interleaved stats folds, fail LOUDLY at lock acquisition
  * instead of corrupting. A hard JVM kill mid-cycle leaves the lock
  * behind (by design: the tmp state it guards may also still be
  * there); after confirming no live maintainer, clear it with
  * [[forceUnlock]] and the next maintain repairs as usual.
  */
private[pipeline] object Snapshot {

  /** Proof that the maintainer lock for [[targetPath]] is held —
    * only mintable by [[withMaintainerLock]], so a read-merge-write
    * cycle cannot compile without the exclusion that makes its read
    * still valid at publish time.
    */
  final class Lease private[Snapshot] (private[pipeline] val targetPath: String)

  private def oldPath(targetPath: String) = new Path(targetPath + "._graft_old")
  private def tmpPath(targetPath: String) = new Path(targetPath + "._graft_tmp")
  private def lockPath(targetPath: String) = new Path(targetPath + "._graft_lock")

  // the one lock algorithm lives in util.PathLock (same suffix, same
  // create-if-absent semantics) — only the failure remedy differs
  private def acquireLock(fs: FileSystem, targetPath: String,
                          waitMs: Long): Unit =
    graft.util.PathLock.acquire(fs, targetPath, waitMs,
      what = "snapshot maintainer",
      remedy = "then Snapshot.forceUnlock the path.")

  /** Run one whole maintain cycle (recover → read → merge → publish)
    * under the target's single-writer lock. The lock spans the FULL
    * critical section: what `body` reads is still the current
    * snapshot when it publishes, so concurrent maintainers cannot
    * interleave into a lost update — the second fails at acquisition
    * (the batch default, waitMs = 0), or polls up to `waitMs` first
    * (the streaming-sink composition, where a concurrent batch
    * maintainer's cycle should be ridden out, not crash the query).
    */
  def withMaintainerLock[T](fs: FileSystem, targetPath: String,
                            waitMs: Long = 0L)
                           (body: Lease => T): T = {
    acquireLock(fs, targetPath, waitMs)
    try body(new Lease(targetPath))
    finally forceUnlock(fs, targetPath)
  }

  /** Acquire MANY targets' locks for one fused cycle (the caller
    * supplies them in its consistent contention order), recover each,
    * and hand the body every (lease, exists) pair; all held locks
    * release in reverse order on unwind. ITERATIVE by design: a fused
    * partitioned maintainer can touch thousands of partitions, and
    * nesting one [[withMaintainerLock]] frame per partition would tie
    * stack depth to the touched count. Acquisition failure part-way
    * releases what was already held before re-raising — the
    * second-of-two-contending-maintainers fail-fast contract.
    */
  def withMaintainerLocks[T](fs: FileSystem, targetPaths: Seq[String],
                             waitMs: Long = 0L)
                            (body: Seq[(Lease, Boolean)] => T): T = {
    val held = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      val leases = targetPaths.map { p =>
        acquireLock(fs, p, waitMs)
        held += p
        val lease = new Lease(p)
        (lease, recoverAndExists(fs, p, lease))
      }
      body(leases)
    } finally held.reverseIterator.foreach(p => forceUnlock(fs, p))
  }

  /** Clear a stale maintainer lock left by a hard-killed cycle. Only
    * safe once no live maintainer targets the path.
    */
  def forceUnlock(fs: FileSystem, targetPath: String): Unit = {
    fs.delete(lockPath(targetPath), false); ()
  }

  private def checkLease(lease: Lease, targetPath: String): Unit =
    require(lease.targetPath == targetPath,
      s"snapshot lease for ${lease.targetPath} used against $targetPath — " +
        "each target needs its own withMaintainerLock")

  /** Repair a crash between the two publish renames (previous
    * snapshot retired at `._graft_old`, nothing at the target) and
    * report whether a snapshot now exists. Run BEFORE reading the
    * target — skipping it would silently treat existing data as a
    * fresh bootstrap. Requires the caller's [[Lease]]: holding the
    * lock is what makes a stray tmp dir provably crash garbage (a
    * LIVE maintainer's tmp can't exist — it would hold the lock).
    */
  def recoverAndExists(fs: FileSystem, targetPath: String,
                       lease: Lease): Boolean = {
    checkLease(lease, targetPath)
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

  /** Materialize `result` and swap it in as the new snapshot. Must run
    * under the same [[Lease]] as the cycle's [[recoverAndExists]] —
    * the lock held since then is what guarantees the `exists` flag and
    * everything read from the target are still true here.
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
  /** Swap a PRE-WRITTEN directory into place as the new snapshot —
    * the fused-partition publish: the caller produced MANY partitions'
    * contents in one write job (outside any single partition's tmp
    * naming) and swaps each into its own target. Identical two-rename
    * protocol and crash repair as [[publish]]; the caller owns the
    * written tree's lifecycle up to this call (after it, the directory
    * has MOVED to the target).
    */
  def publishWritten(fs: FileSystem, targetPath: String, exists: Boolean,
                     written: Path, lease: Lease): Unit = {
    checkLease(lease, targetPath)
    val dst = new Path(targetPath)
    val old = oldPath(targetPath)
    if (exists) {
      if (fs.exists(old)) fs.delete(old, true)
      if (!fs.rename(dst, old))
        throw new java.io.IOException(s"snapshot swap: cannot retire $dst")
    }
    if (!fs.rename(written, dst))
      throw new java.io.IOException(s"snapshot swap: cannot publish $written")
    fs.delete(old, true)
    ()
  }

  def publish(fs: FileSystem, targetPath: String, exists: Boolean,
              result: DataFrame, lease: Lease,
              beforeSwap: Path => Unit = _ => ()): Unit = {
    checkLease(lease, targetPath)
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
  }
}
