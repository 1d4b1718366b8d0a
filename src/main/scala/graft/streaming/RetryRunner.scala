package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Bounded-retry supervisor for a streaming query — the R6 operational
  * policy the reference consumer hardcodes around its broker connection
  * (ez-cdc `python/cdc_test/main.py:17-35`: 5 attempts × 1 s sleep, then
  * abort). Here the retry wraps the WHOLE query lifecycle: a failed start
  * OR a mid-run failure consumes one attempt, the query restarts from its
  * checkpoint (so a retried micro-batch replays exactly-once into a
  * transactional/idempotent sink), and exhausting the budget rethrows the
  * last error — fail fast and loud, like the reference's sys.exit.
  */
object RetryRunner {

  /** Outcome of a supervised run: how many starts it took, and the errors
    * swallowed along the way (empty on a first-try clean stop).
    */
  final case class RetryOutcome(attempts: Int, errors: Seq[Throwable])

  /** Run `start` until the query terminates cleanly, restarting on failure
    * up to `maxAttempts` total starts with a fixed `backoffMs` pause
    * (mirroring the reference's loop). `start` must build a query with a
    * checkpointLocation for restarts to resume rather than reprocess.
    */
  def runWithRetry(start: () => StreamingQuery, maxAttempts: Int = 5,
      backoffMs: Long = 1000): RetryOutcome = {
    // zero attempts would skip the loop and return a SUCCESS-shaped
    // outcome (attempts=0, no errors) for a query that never ran
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var errors = Vector.empty[Throwable]
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      // NonFatal only: a fatal JVM error (OOM, LinkageError) must
      // propagate, not be retried; InterruptedException means the
      // SUPERVISOR is being cancelled — restarting would make it
      // uncancellable, so stop the query and let the interrupt escape
      val outcome: Either[Throwable, Unit] =
        try {
          val q = start()
          try { q.awaitTermination(); Right(()) }
          catch {
            case e: Throwable =>
              // stop() can itself throw (e.g. a stop timeout) — that
              // must not REPLACE the query's root-cause failure
              try q.stop()
              catch { case s if scala.util.control.NonFatal(s) =>
                e.addSuppressed(s) }
              throw e
          }
        } catch {
          case e: InterruptedException => throw e
          case e if scala.util.control.NonFatal(e) => Left(e)
        }
      outcome match {
        case Right(()) => return RetryOutcome(attempt, errors)
        case Left(e) =>
          errors :+= e
          if (attempt >= maxAttempts) throw e
          Thread.sleep(backoffMs)
      }
    }
    RetryOutcome(attempt, errors) // unreachable; loop exits via return/throw
  }
}
