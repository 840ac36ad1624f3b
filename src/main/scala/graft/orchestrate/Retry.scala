package graft.orchestrate

/** Transient-vs-hard failure routing for driver-side operations — the
  * Spark-native descendant of the reference worker's error handler
  * (/root/reference/lib/worker.rb:28-48): a transient failure (AWS
  * `ServiceUnavailable` there; IO-ish flakiness here) RELEASES the job
  * for another attempt after a delay, anything else records an error
  * row and BURIES the job (no retry). The backoff doubles per
  * reiteration, per the legacy policy (db.rb.old:46-47, surfaced as
  * `--reiteration_time`, cli.rb:127-130).
  *
  * Scope note: Spark's own `spark.task.maxFailures` already retries
  * task-level flakiness inside a job; this wrapper covers what that
  * can't — driver-side catalog/FS calls and whole-job submission, where
  * one hiccup would otherwise fail a table a retry would have saved.
  */
object Retry {

  /** Is this failure worth another attempt? IO-shaped exceptions
    * anywhere in the cause chain (FS hiccups, socket resets, timeouts)
    * and anything named like a service-unavailability condition.
    * Semantic failures (schema mismatch, missing table, analysis
    * errors) are hard: retrying cannot fix them.
    */
  def isTransient(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).exists {
      case _: java.io.IOException => true
      case _: java.util.concurrent.TimeoutException => true
      case t =>
        val n = t.getClass.getSimpleName
        n.contains("ServiceUnavailable") || n.contains("Throttl")
    }

  /** Run `op`; on a transient failure retry up to `maxAttempts` total
    * attempts with exponentially-doubling delay, on a hard failure (or
    * attempt exhaustion) rethrow so the caller can bury. `sleep` is
    * injectable for deterministic specs.
    */
  def withRetry[A](maxAttempts: Int, baseDelayMs: Long,
                   sleep: Long => Unit = Thread.sleep)(op: => A): A = {
    var attempt = 1
    var delay = baseDelayMs
    while (true) {
      try return op
      catch {
        case e: Throwable if attempt < maxAttempts && isTransient(e) =>
          sleep(delay)
          delay *= 2
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
