package graft.pipeline

import java.util.concurrent.atomic.AtomicLong
import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}

import graft.util.AuditLog
import org.apache.spark.sql.SparkSession

import scala.concurrent.duration.Duration
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** Async ETL job lifecycle over Spark actions — the Spark-native form
  * of the reference's job API (/root/reference/src/api/jobs.js:
  * checkJobStatus, cancelJob). A job is a named thunk (usually
  * template-compile → write); submit returns a handle immediately,
  * status is tracked through a terminal state, and cancel maps to
  * `SparkContext.cancelJobGroup` so ALL of the job's distributed
  * stages stop, not just the driver thread.
  */
object JobRunner {
  sealed trait Status
  case object Pending extends Status
  case object Running extends Status
  case object Succeeded extends Status
  case object Failed extends Status
  case object Cancelled extends Status

  /** Job ids double as Spark job-GROUP ids, and cancellation registers
    * the group for future-job cancellation on the shared SparkContext —
    * so ids must be unique across every runner on that context, not
    * just within one instance (two runners both naming their first job
    * "job-1" would let one runner's cancel pre-cancel the other's).
    */
  private val globalSeq = new AtomicLong(0)
}

final class JobRunner(spark: SparkSession, audit: Option[AuditLog] = None) {
  import JobRunner._

  final case class JobInfo(
      jobId: String,
      name: String,
      status: Status,
      error: Option[String],
      submittedAtMs: Long,
      finishedAtMs: Option[Long])

  private val jobs = new ConcurrentHashMap[String, JobInfo]()
  private val cancelled = ConcurrentHashMap.newKeySet[String]()
  private val pool = Executors.newCachedThreadPool(r => {
    val t = new Thread(r); t.setDaemon(true); t.setName("graft-job"); t
  })

  private def update(id: String)(f: JobInfo => JobInfo): Unit =
    jobs.compute(id, (_, j) => f(j))

  /** Submit a job; returns its id immediately. The body runs on a
    * daemon thread inside a Spark job group keyed by the id.
    */
  def submit(name: String)(body: SparkSession => Unit): String =
    submitWithId(name)((s, _) => body(s))

  /** True once cancel(jobId) has been requested (whether or not the
    * job has observed it yet) — lets job bodies veto retries of
    * deliberately-interrupted work.
    */
  def isCancelled(jobId: String): Boolean = cancelled.contains(jobId)

  /** Like submit, but the body also receives its own job id (for
    * cancellation-aware retry logic).
    */
  def submitWithId(name: String)(body: (SparkSession, String) => Unit): String = {
    val id = s"job-${JobRunner.globalSeq.incrementAndGet()}"
    jobs.put(id, JobInfo(id, name, Pending, None, System.currentTimeMillis(), None))
    audit.foreach(_.logJob("jobId" -> id, "action" -> "submit", "name" -> name))
    pool.submit(new Runnable {
      // every status transition reads the cancel flag INSIDE the
      // jobs.compute entry lock — cancel() sets the flag under the
      // same lock, so a flag can never be added after a job was
      // observed terminal (nor a terminal state decided against a
      // stale flag read)
      def run(): Unit = {
        // cancel() can arrive while still Pending — cancelJobGroup has
        // nothing to interrupt then, so honor the flag before starting
        var aborted = false
        update(id) { j =>
          if (cancelled.contains(id)) {
            aborted = true
            j.copy(status = Cancelled,
              finishedAtMs = Some(System.currentTimeMillis()))
          } else j.copy(status = Running)
        }
        if (aborted) {
          audit.foreach(_.logJob("jobId" -> id, "action" -> "finish",
            "status" -> Cancelled.toString))
          return
        }
        spark.sparkContext.setJobGroup(id, name, interruptOnCancel = true)
        try {
          body(spark, id)
          var fin: Status = Succeeded
          update(id) { j =>
            fin = if (cancelled.contains(id)) Cancelled else Succeeded
            j.copy(status = fin,
              finishedAtMs = Some(System.currentTimeMillis()))
          }
          audit.foreach(_.logJob("jobId" -> id, "action" -> "finish",
            "status" -> fin.toString))
        } catch {
          case NonFatal(e) =>
            var fin: Status = Failed
            update(id) { j =>
              fin = if (cancelled.contains(id)) Cancelled else Failed
              j.copy(status = fin, error = Some(e.getMessage),
                finishedAtMs = Some(System.currentTimeMillis()))
            }
            audit.foreach(_.logError("jobId" -> id, "action" -> "run",
              "status" -> fin.toString,
              "error" -> String.valueOf(e.getMessage)))
        } finally spark.sparkContext.clearJobGroup()
      }
    })
    id
  }

  /** Current status (reference: checkJobStatus). */
  def status(jobId: String): Status =
    Option(jobs.get(jobId))
      .getOrElse(throw new NoSuchElementException(s"unknown job $jobId"))
      .status

  def info(jobId: String): JobInfo =
    Option(jobs.get(jobId))
      .getOrElse(throw new NoSuchElementException(s"unknown job $jobId"))

  /** Cancel: interrupts every Spark stage in the job's group
    * (reference: cancelJob). A no-op for unknown or already-terminal
    * jobs — in a long-lived service a stray cancel must not leave a
    * flag behind that would pre-cancel a future job reusing the id.
    */
  def cancel(jobId: String): Unit = {
    // the status check and flag add happen atomically under the job's
    // compute entry lock — the worker's terminal transition holds the
    // same lock and reads the flag inside it, so a Succeeded/Failed
    // job can never end up flagged cancelled (and vice versa)
    var requested = false
    jobs.computeIfPresent(jobId, (_, j) => {
      if (j.status == Pending || j.status == Running) {
        cancelled.add(jobId)
        requested = true
      }
      j
    })
    if (requested) {
      audit.foreach(_.logJob("jobId" -> jobId, "action" -> "cancel"))
      // AndFutureJobs closes the submit/cancel race: a cancel landing
      // after the worker flipped to Running but BEFORE its first Spark
      // job reached the DAGScheduler used to find "no active jobs" and
      // do nothing — the body then ran to completion uninterrupted.
      // Registering the group for future-job cancellation makes the
      // body's first submission fail immediately instead (job ids are
      // context-unique, so the registration can never hit a bystander).
      spark.sparkContext.cancelJobGroupAndFutureJobs(jobId)
    }
  }

  /** Drop terminal-state jobs older than `retainMs` from the registry
    * (and their cancel flags). A long-lived service calls this
    * periodically — otherwise `jobs`/`cancelled` grow without bound.
    * Returns the number of entries pruned.
    */
  def prune(retainMs: Long = 24L * 60 * 60 * 1000): Int = {
    val cutoff = System.currentTimeMillis() - retainMs
    var n = 0
    jobs.values.asScala.toSeq.foreach { j =>
      val terminal = j.status == Succeeded || j.status == Failed ||
        j.status == Cancelled
      if (terminal && j.finishedAtMs.exists(_ < cutoff)) {
        jobs.remove(j.jobId)
        cancelled.remove(j.jobId)
        n += 1
      }
    }
    n
  }

  /** Block until the job reaches a terminal state (or timeout). */
  def await(jobId: String, timeout: Duration = Duration.Inf): Status = {
    val deadline = if (timeout.isFinite)
      System.nanoTime() + timeout.toNanos else Long.MaxValue
    var s = status(jobId)
    while ((s == Pending || s == Running) && System.nanoTime() < deadline) {
      TimeUnit.MILLISECONDS.sleep(25)
      s = status(jobId)
    }
    s
  }

  /** All jobs, newest first. */
  def list(): Seq[JobInfo] =
    jobs.values.asScala.toSeq.sortBy(-_.submittedAtMs)
}
