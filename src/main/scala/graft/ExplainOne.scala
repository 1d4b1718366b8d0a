package graft

import org.apache.spark.sql.SparkSession

/** Print one registered query's FINALIZED physical plan (post-AQE) — the
  * per-query drill-down companion to [[PlanAudit]] (counts) and
  * [[CollapseAudit]] (collapse sweep):
  *
  *   sbt "runMain graft.ExplainOne q7_asof_join /root/testdata/sf0.001"
  *
  * Executes the query (AQE's initial plan lies about join strategies and
  * partition counts), then prints the final executed plan.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, s"usage: ExplainOne <query> [sfDir]; " +
      s"queries: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = fn(spark, sfDir)
    df.collect() // finalize AQE
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
