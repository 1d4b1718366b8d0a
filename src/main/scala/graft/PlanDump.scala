package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for a set of registered queries to files —
  * the per-query evidence artifacts for optimization rounds
  * (`plans/<round>/<query>_{before,after}.txt`).
  *
  *   sbt "runMain graft.PlanDump plans/r17 before q34_pagerank,x4y_diverse_ann"
  *   sbt "runMain graft.PlanDump plans/r17 after all"
  *
  * Each query is EXECUTED first (count) so AQE finalizes join strategies
  * and partition counts, then two sections are written: the formatted
  * pre-execution plan (scan pushdown / codegen spans / exchange placement
  * — what `.explain("formatted")` prints) and the finalized adaptive plan
  * (what actually ran).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <q1,q2|all> [sfDir]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names =
      if (args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.001")
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      df.collect() // finalize AQE (count() would execute a different QueryExecution)
      val formatted = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val finalPlan = df.queryExecution.executedPlan.toString
      // post-execution operator metrics: walk the adaptive plan (final
      // stages included) and print the interesting counters per node
      val buf = new StringBuilder
      def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
        val m = p.metrics.collect {
          case (k, v) if v.value > 0 &&
            (k.contains("time") || k.contains("duration") ||
              k == "numOutputRows" || k.contains("Bytes") ||
              k.contains("spill")) =>
            s"$k=${v.value}"
        }
        if (m.nonEmpty)
          buf.append("  " * depth).append(p.nodeName).append(": ")
            .append(m.mkString(" ")).append("\n")
        val kids = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(q.plan)
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
            Nil
          case _ => p.children
        }
        kids.foreach(walk(_, depth + 1))
      }
      walk(df.queryExecution.executedPlan, 0)
      val metrics = buf.toString
      val body =
        s"== explain(formatted) — $name @ $sfDir ==\n" + formatted +
          "\n\n== finalized adaptive plan (post-execution) ==\n" + finalPlan +
          "\n\n== operator metrics (post-execution) ==\n" + metrics
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), body)
      System.err.println(s"[plandump] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
