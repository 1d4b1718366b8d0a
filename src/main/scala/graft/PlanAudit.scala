package graft

import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md's operator-count table: one row per registered
  * query, counting physical-plan nodes from `executedPlan` (AQE initial
  * plan — shapes, not runtime partition counts). Run:
  *
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.001" > /tmp/plans.md
  *
  * Node counts are substring occurrences, so `Exchange` includes
  * `BroadcastExchange` (same methodology as the round-1 audit).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("| query | Exchange | Cartesian | BNLJ | SMJ | BHJ | HashAgg | notes |")
    println("|---|---|---|---|---|---|---|---|")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p = fn(spark, sfDir).queryExecution.executedPlan.toString
      def c(pat: String) = pat.r.findAllIn(p).size
      val notes = Seq(
        if (p.contains("TakeOrderedAndProject")) "top-k" else "",
        if (p.contains("WindowGroupLimit")) "rank-pushdown" else "",
        if (p.contains("AsOfJoinExec")) "custom-exec" else "",
        if ("PushedFilters: \\[[^\\]]".r.findFirstIn(p).isDefined) "scan-pushdown" else "")
        .filter(_.nonEmpty).mkString(" ")
      println(s"| $name | ${c("Exchange")} | ${c("CartesianProduct")} | " +
        s"${c("BroadcastNestedLoopJoin")} | ${c("SortMergeJoin")} | " +
        s"${c("BroadcastHashJoin")} | ${c("HashAggregate")} | $notes |")
    }
    spark.stop()
  }
}
