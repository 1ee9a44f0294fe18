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
  */
private[pipeline] object Snapshot {

  private def oldPath(targetPath: String) = new Path(targetPath + "._graft_old")
  private def tmpPath(targetPath: String) = new Path(targetPath + "._graft_tmp")

  /** Repair a crash between the two publish renames (previous
    * snapshot retired at `._graft_old`, nothing at the target) and
    * report whether a snapshot now exists. Run BEFORE reading the
    * target — skipping it would silently treat existing data as a
    * fresh bootstrap.
    */
  def recoverAndExists(fs: FileSystem, targetPath: String): Boolean = {
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
