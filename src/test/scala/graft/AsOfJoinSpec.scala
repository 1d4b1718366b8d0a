package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.AsOf

/** The custom as-of join operator must agree exactly with the
  * oracle-verified window rewrite (q7) on the real fixture events, and its
  * physical plan must be the claimed one-shuffle merge scan.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def purchases = Tables.events(spark, TestSpark.sf)
    .filter(col("event_type") === "purchase")
    .select(col("user_id"), col("event_id").as("p_event_id"), col("ts_ms"))
  def errors = Tables.events(spark, TestSpark.sf)
    .filter(col("event_type") === "error")
    .select(col("user_id"), col("event_id").as("asof_event_id"), col("ts_ms"))

  test("custom AsOfJoinExec equals the oracle-verified window rewrite") {
    val custom = AsOf.asofJoin(purchases, errors, "user_id", "ts_ms")
      .select(col("p_event_id"), col("asof_event_id"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val rewrite = SparkEntry.queries("q7_asof_join")(spark, TestSpark.sf)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(custom.size === rewrite.size)
    assert(custom === rewrite)
    assert(custom.values.exists(_.isDefined) && custom.values.exists(_.isEmpty))
  }

  test("physical plan is AsOfJoinExec fed by one hash shuffle + sort per side") {
    val df = AsOf.asofJoin(purchases, errors, "user_id", "ts_ms")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p) // AsOfJoinExec prints as "AsOfJoin"
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Window"), p) // the whole point: no window machinery
  }
}
