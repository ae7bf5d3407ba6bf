package graft.util

/** Driver-level retry with backoff (E2, reference src/etl_utils.py:58-81
  * read: 2 attempts / 300 s; :211-253 write: 3 × 180 s). Wraps job
  * actions (read/write), NOT per-row work — per-row retry lives inside
  * EnrichOperator where it belongs.
  */
object Retry {

  final class RetriesExhausted(val attempts: Int, cause: Throwable)
    extends RuntimeException(s"action failed after $attempts attempts", cause)

  def withRetry[T](attempts: Int, delayMs: Long, backoffFactor: Double = 1.0,
                   sleep: Long => Unit = Thread.sleep)(action: => T): T = {
    var delay = delayMs
    var lastError: Throwable = null
    var i = 0
    while (i < attempts) {
      // NonFatal only: retrying an OutOfMemoryError/LinkageError hides
      // a dying JVM behind minutes of backoff. And a cancellation
      // (InterruptedException) must propagate immediately with the
      // interrupt flag RE-ASSERTED — the old catch-all consumed it and
      // put the "cancelled" driver thread to sleep for 5 minutes.
      try return action
      catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw e
        case scala.util.control.NonFatal(e) =>
          lastError = e
          i += 1
          if (i < attempts) { sleep(delay); delay = (delay * backoffFactor).toLong }
      }
    }
    throw new RetriesExhausted(attempts, lastError)
  }

  /** The reference's two policies, named. */
  def dbRead[T](sleep: Long => Unit = Thread.sleep)(action: => T): T =
    withRetry(attempts = 2, delayMs = 300000L, sleep = sleep)(action)
  def dbWrite[T](sleep: Long => Unit = Thread.sleep)(action: => T): T =
    withRetry(attempts = 3, delayMs = 180000L, sleep = sleep)(action)
}
