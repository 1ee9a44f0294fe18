package graft.util

import scala.concurrent.duration._
import scala.util.control.NonFatal

/** Exponential-backoff retry, mirroring the reference's `fetchWithRetry`
  * (/root/reference/src/api/templates.js:19-40: N attempts, backoff
  * doubling each time). Used by graft sinks for transient IO; Spark
  * *tasks* already retry internally, so this wraps only driver-side
  * actions (writes, external calls), never per-row logic.
  */
object Retry {

  final case class Policy(
      attempts: Int = 3,
      firstBackoff: FiniteDuration = 500.millis,
      multiplier: Double = 2.0,
      maxBackoff: FiniteDuration = 30.seconds)

  /** Run `body`, retrying on non-fatal failure with exponential backoff.
    * `onRetry(attempt, error)` fires before each sleep (audit hook);
    * `retryIf` can veto a retry (e.g. don't re-run a write whose job
    * was deliberately cancelled).
    */
  def apply[A](policy: Policy = Policy(),
               onRetry: (Int, Throwable) => Unit = (_, _) => (),
               retryIf: Throwable => Boolean = _ => true)(body: => A): A = {
    var backoffMs = policy.firstBackoff.toMillis
    var attempt = 1
    while (true) {
      try return body
      catch {
        case NonFatal(e) if attempt < policy.attempts && retryIf(e) =>
          onRetry(attempt, e)
          Thread.sleep(backoffMs)
          backoffMs = math.min((backoffMs * policy.multiplier).toLong,
            policy.maxBackoff.toMillis)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
