package graft.util

import org.apache.spark.sql.SparkSession

/** Generic whole-cycle single-writer lock on a directory tree — the
  * maintainer-lock device shared by the persisted operator artifacts
  * outside `graft.pipeline` ([[graft.operators.IvfIndex]]'s index
  * tree, the near-dup component index). Semantics match the pipeline
  * Snapshot lock: acquire FIRST, hold for the whole
  * read-modify-publish cycle, release in `finally`; a hard kill
  * leaves the lock behind by design (the partial state it guards may
  * too) — delete `<path>._graft_lock` after confirming no live
  * writer.
  *
  * Atomicity assumption: `fs.create(overwrite = false)` must be an
  * atomic create-if-absent. True on HDFS and conditional-put object
  * stores; RawLocalFileSystem implements it as exists-then-create, so
  * CROSS-PROCESS exclusion on a plain local/NFS filesystem is
  * best-effort. Single-process composition is exact everywhere.
  */
object PathLock {

  def lockFile(path: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(path + "._graft_lock")

  /** Low-level acquire: create-if-absent with a polling deadline —
    * the ONE implementation of the lock algorithm (the pipeline
    * Snapshot lock delegates here too, so fixes land once).
    * `remedy` tailors the last sentence of the failure message.
    */
  def acquire(fs: org.apache.hadoop.fs.FileSystem, path: String,
              waitMs: Long, what: String,
              remedy: String = "then delete the lock file."): Unit = {
    val p = lockFile(path)
    val deadline = System.nanoTime() + waitMs * 1000000L
    var held = false
    while (!held) {
      held = try { fs.create(p, false).close(); true }
             catch { case _: java.io.IOException => false }
      if (!held) {
        if (System.nanoTime() >= deadline) throw new IllegalStateException(
          s"$what lock already held at $p: another maintainer is " +
            "mid-cycle on this path, or a previous one was hard-killed. " +
            s"Verify no live maintainer runs, $remedy")
        Thread.sleep(100)
      }
    }
  }

  def release(fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    fs.delete(lockFile(path), false); ()
  }

  /** Run `body` under the lock. `waitMs` = 0 fails immediately (the
    * batch-maintainer convention); a streaming sink passes a budget
    * to ride out a concurrent batch cycle instead of crashing.
    */
  def withLock[T](spark: SparkSession, path: String, waitMs: Long = 0L,
                  what: String = "maintainer")(body: => T): T = {
    val fs = lockFile(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    acquire(fs, path, waitMs, what)
    try body finally release(fs, path)
  }
}
