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
    var errors = Vector.empty[Throwable]
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val outcome: Either[Throwable, Unit] =
        try {
          val q = start()
          try { q.awaitTermination(); Right(()) }
          catch { case e: Throwable => q.stop(); Left(e) }
        } catch { case e: Throwable => Left(e) }
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
