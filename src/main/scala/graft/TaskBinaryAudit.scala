package graft

import scala.collection.concurrent.TrieMap

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Task-binary budget guard (r11 verdict Next-round #4, the WindowAudit
  * discipline applied to serialized-closure size): Spark WARNs
  * "Broadcasting large task binary with size N" when a stage's
  * serialized task closure exceeds 1000 KiB — on a 1000-executor
  * cluster that binary is re-broadcast per stage retry and its size
  * tracks unrolled plan lineage, exactly the failure mode that grows
  * silently as queries accrete rounds. The scheduler does not expose
  * the size through any listener event, so this audit captures the
  * DAGScheduler's own WARN via a log4j2 appender, attributes each hit
  * to the query the bench is currently timing (the bench loop is
  * single-threaded), and FAILS the bench when any query exceeds the
  * budget without a justification — turning the former tail noise into
  * a loud, named gate.
  */
object TaskBinaryAudit {

  /** Hard per-query ceiling, KiB. Spark's own warn threshold is
    * 1000 KiB; the budget sits above it so the known, justified
    * lineage-heavy iterative queries pass while anything that DOUBLES
    * past them fails the bench.
    */
  val budgetKiB: Double = 4096.0

  /** Queries allowed to exceed Spark's 1000 KiB warn threshold (but
    * never [[budgetKiB]]) — each entry names the structural reason, so
    * a NEW warning query must either shrink its closure or justify
    * itself here (the WindowAudit convention).
    */
  val justified: Map[String, String] = Map(
    // the single observed over-threshold closure (sf0.1 sweep after the
    // r13 fold staging truncated the former x3r/x7q/x4x lineage, and
    // the late-r13 x9c fix carried lang through bpeEncode instead of
    // re-joining the kept subtree — which removed x9c's ~2.2 MiB
    // closure, the repo's former largest, from the warnings entirely):
    "x6i_curation_diff" -> ("~2.1 MiB: the one-scan diff composes BOTH " +
      "runs' full curation predicates (dedup drop set probes, language/" +
      "length bands, reason attribution) in a single plan — two " +
      "pipelines' worth of expression tree rides one closure by design"),
    // r17 optimization: the packed-key MMR pipeline unions the ANN and
    // exact heads BEFORE the shared shortlist→greedy tail, so one stage
    // now carries both heads' full expression trees (probe + fusion ×2)
    // — the same two-pipelines-one-closure shape as x6i, and the price
    // of halving the tail's job barriers; plan metadata only, does not
    // grow with data
    "x4y_diverse_ann" -> ("~2.1 MiB: the packed-key single MMR tail " +
      "fuses the ANN and exact-reference heads into one unioned stage " +
      "— two retrieval pipelines' expression trees in one closure by " +
      "design (the x6i class)"))

  private val Pat =
    """Broadcasting large task binary with size ([0-9.]+) (B|KiB|MiB|GiB|TiB|PiB)""".r

  @volatile private var current: String = "(untracked)"
  private val maxKiB = TrieMap[String, Double]()
  @volatile private var installed = false

  /** Name the query whose stages run next (bench loop is serial). */
  def setQuery(name: String): Unit = current = name

  /** Attribute every stage `f` runs to `name`, restoring the previous
    * attribution afterwards (save/restore, so nested frames compose —
    * the Staged-producer case: a lazily-built staged table materializes
    * inside whichever registered query first consumes it, and without
    * this its large-closure WARN would be charged to that consumer,
    * pointing a gate failure at the wrong culprit).
    */
  def withQuery[T](name: String)(f: => T): T = {
    val prev = current
    current = name
    try f finally current = prev
  }

  /** Per-query max observed task-binary size in KiB. */
  def observed: Map[String, Double] = maxKiB.toMap

  /** Violations against the budget + allowlist: every observed query
    * over Spark's warn threshold must be justified, and NOTHING may
    * exceed [[budgetKiB]].
    */
  def violations: Seq[String] =
    maxKiB.toSeq.sortBy(_._1).flatMap { case (q, kib) =>
      if (kib > budgetKiB)
        Some(f"$q: task binary $kib%.0f KiB exceeds the ${budgetKiB}%.0f " +
          "KiB budget — shrink the closure (stage the fold, checkpoint " +
          "the lineage) or raise the budget with a reason")
      else if (!justified.contains(q))
        Some(f"$q: task binary $kib%.0f KiB over Spark's 1000 KiB warn " +
          "threshold and not in TaskBinaryAudit.justified — justify or " +
          "shrink")
      else None
    }

  private def toKiB(v: Double, unit: String): Double = unit match {
    case "B" => v / 1024.0
    case "KiB" => v
    case "MiB" => v * 1024.0
    case "GiB" => v * 1024.0 * 1024.0
    case "TiB" => v * 1024.0 * 1024.0 * 1024.0
    case "PiB" => v * 1024.0 * 1024.0 * 1024.0 * 1024.0
  }

  /** Attach the capturing appender to the DAGScheduler's logger (and
    * keep its WARNs flowing to the normal sinks). Idempotent.
    */
  def install(): Unit = synchronized {
    if (installed) return
    val appender = new AbstractAppender("graft-task-binary", null, null,
        true, Property.EMPTY_ARRAY) {
      override def append(event: LogEvent): Unit = {
        val msg = event.getMessage.getFormattedMessage
        Pat.findFirstMatchIn(msg).foreach { m =>
          val kib = toKiB(m.group(1).toDouble, m.group(2))
          val q = current
          maxKiB.updateWith(q) {
            case Some(prev) => Some(math.max(prev, kib))
            case None => Some(kib)
          }
        }
      }
    }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val loggerName = "org.apache.spark.scheduler.DAGScheduler"
    val lc = cfg.getLoggerConfig(loggerName)
    // a dedicated LoggerConfig so the appender sees WARNs even if the
    // root level is above WARN, without touching other loggers
    if (lc.getName != loggerName) {
      val fresh = new org.apache.logging.log4j.core.config.LoggerConfig(
        loggerName, Level.WARN, true)
      cfg.addLogger(loggerName, fresh)
      fresh.addAppender(appender, Level.WARN, null)
    } else {
      // an existing dedicated config may sit ABOVE warn (a user log4j2
      // file quieting Spark): events are filtered at the logger before
      // any appender, so the gate would observe nothing and pass
      // VACUOUSLY. Widen the config to WARN — the audit must measure or
      // fail loudly, never silently measure nothing. (Side effect: the
      // config's other appenders see DAGScheduler WARNs again; that is
      // the lesser evil vs an unenforced budget.)
      if (lc.getLevel == null ||
          (lc.getLevel.isMoreSpecificThan(Level.WARN) &&
            lc.getLevel != Level.WARN))
        lc.setLevel(Level.WARN)
      lc.addAppender(appender, Level.WARN, null)
    }
    ctx.updateLoggers()
    installed = true
  }
}
