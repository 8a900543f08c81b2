package graft.feed

/** ST6 — retry with capped exponential backoff, the engine-side mirror
  * of the reference worker's read loop (cmd/worker/worker.go:75-91:
  * backoff = min(1000, 2^retry) ms, counter reset on success).
  *
  * Where it applies in the Spark pipeline: TRANSIENT faults inside a
  * foreachBatch body (a flaky object-store append, a throttled sink).
  * The streaming engine's own recovery (checkpoint replay of the whole
  * batch) is the backstop for everything else — so the right policy is
  * a handful of cheap in-place attempts before surrendering the batch
  * to that heavier mechanism, exactly the reference's split between
  * its read-loop backoff and its consumer-group rebalance.
  *
  * Deterministic (no jitter) so specs can assert the schedule; the
  * single-writer deployment has no thundering-herd concern.
  */
object Retry {

  /** Reference schedule: min(maxDelayMs, 2^attempt) ms for attempt =
    * 0, 1, 2, … */
  def backoffMs(attempt: Int, maxDelayMs: Long = 1000L): Long =
    math.min(maxDelayMs, math.pow(2.0, attempt.toDouble).toLong)

  /** Run `f`, retrying transient failures up to `maxRetries` times
    * with the reference backoff schedule. Non-transient failures (per
    * `retryOn`) propagate immediately; exhausting the budget rethrows
    * the last failure. `sleep` is injectable for specs. */
  def withBackoff[A](maxRetries: Int = 5, maxDelayMs: Long = 1000L,
      retryOn: Throwable => Boolean = defaultTransient,
      sleep: Long => Unit = Thread.sleep)(f: => A): A = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case t: Throwable if attempt < maxRetries && retryOn(t) =>
          sleep(backoffMs(attempt, maxDelayMs))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Transient by default: IO faults and Spark task/stage failures
    * (which wrap executor-side IO); analysis/planning errors are
    * deterministic and never retried. */
  def defaultTransient(t: Throwable): Boolean = t match {
    case _: org.apache.spark.sql.AnalysisException => false
    case _ => true
  }
}
