package org.apache.spark.graftbench

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-time / GC-time attribution for the benchmark main (the
  * `graftbridge.Bridge` approach: the listener bus drain —
  * `listenerBus.waitUntilEmpty()` — is `private[spark]`, so the one
  * call lives in an `org.apache.spark` subpackage, exactly like
  * public Spark test harnesses do).
  *
  * Why it exists (r15 verdict ask #7): the official bench host swings
  * 66–89 s wall for IDENTICAL code (SURVEY §6's A/B/A proof), and
  * wall time cannot distinguish "the code got slower" from "the host
  * stalled the driver between stages". Executor TASK time (the sum of
  * every task's executorRunTime) is the CPU-work number — host stalls
  * between stages don't inflate it — and jvmGCTime splits memory
  * churn out of that. A drifted round reads: wall up, task flat →
  * host; task up → real.
  */
object BenchBridge {

  private val taskMs = new AtomicLong(0L)
  private val gcMs = new AtomicLong(0L)
  private val cpuNs = new AtomicLong(0L)

  private val listener = new SparkListener {
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        taskMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
        // executorCpuTime (NANOseconds, unlike the two ms fields): the
        // contention-robust number (r17 verdict ask #2) — task WALL
        // time inflates ~uniformly when a noisy host timeslices the
        // executor threads (the driver's r17 run read 1.7x on
        // untouched queries), while CPU time bills only cycles this
        // process actually burned
        cpuNs.addAndGet(m.executorCpuTime)
        ()
      }
    }
  }

  @volatile private var installedAppId: String = null

  /** Install the counters on this context — idempotent FOR REAL: a
    * second call must not register the listener again, or every task
    * double-counts and the drift-attribution numbers this exists to
    * make trustworthy read ~2x. Keyed on the context's applicationId
    * (r16 advice), not a JVM-global boolean: a NEW SparkContext in
    * the same JVM (Spark allows one live at a time, so the old one is
    * stopped and its listener gone with it) re-registers and RESETS
    * the counters, so the fresh context's deltas start from zero
    * instead of silently reading 0 forever.
    */
  def install(sc: SparkContext): Unit = synchronized {
    val app = sc.applicationId
    if (installedAppId != app) {
      if (installedAppId != null) { taskMs.set(0L); gcMs.set(0L); cpuNs.set(0L) }
      sc.addSparkListener(listener)
      installedAppId = app
    }
  }

  /** Cumulative (taskSeconds, gcSeconds, cpuSeconds) across every task
    * ended so far, AFTER draining the async listener bus — without the
    * drain, a snapshot taken right after an action can miss the last
    * stage's events and misattribute them to the NEXT query.
    */
  def snapshot(sc: SparkContext): (Double, Double, Double) = {
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: Throwable => () } // a stuck bus must not kill the run
    (taskMs.get() / 1e3, gcMs.get() / 1e3, cpuNs.get() / 1e9)
  }
}
