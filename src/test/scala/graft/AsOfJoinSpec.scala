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

  test("NULL keys and timestamps never match (SQL semantics), on either side") {
    import spark.implicits._
    val l = Seq(
      (Option(1L), Option(100L), "l1"),
      (Option.empty[Long], Option(100L), "l-nullkey"),
      (Option(1L), Option.empty[Long], "l-nullts"),
      (Option(2L), Option(50L), "l2"))
      .toDF("user_id", "ts_ms", "ltag")
    val r = Seq(
      (Option(1L), Option(90L), "r1"),
      (Option.empty[Long], Option(10L), "r-nullkey"), // must never match
      (Option(1L), Option.empty[Long], "r-nullts"),   // must never match
      (Option(2L), Option(60L), "r-later"))           // after l2: no match
      .toDF("user_id", "ts_ms", "rtag")
    val out = graft.plans.AsOf.asofJoin(l, r, "user_id", "ts_ms")
      .select(col("ltag"), col("rtag")).collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(out("l1") === Some("r1"))
    assert(out("l-nullkey") === None)
    assert(out("l-nullts") === None)
    assert(out("l2") === None)
  }

  test("equal-(key, ts) right rows resolve deterministically via tieBreak") {
    import spark.implicits._
    val l = Seq((1L, 100L, "probe")).toDF("user_id", "ts_ms", "ltag")
    val r = Seq((1L, 90L, 7L), (1L, 90L, 3L), (1L, 90L, 9L))
      .toDF("user_id", "ts_ms", "rid")
    val out = graft.plans.AsOf.asofJoin(l, r, "user_id", "ts_ms",
        tieBreak = Some("rid")).select(col("rid")).collect()
    assert(out.length === 1 && out(0).getLong(0) === 9L) // greatest tie-break wins
  }

  test("custom optimizer rule pushes left-only filters through the as-of join to the scan") {
    val df = AsOf.asofJoin(purchases, errors, "user_id", "ts_ms")
      .filter(col("p_event_id") < 100)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the predicate must reach the LEFT side's parquet scan...
    assert(p.contains("LessThan(event_id,100)"), p)
    // ...and no Filter may remain above the join
    assert(!p.replaceAll("(?s)\\+- AsOfJoin.*", "").contains("Filter"), p)
    // correctness unchanged by the rewrite
    val expected = AsOf.asofJoin(purchases, errors, "user_id", "ts_ms").collect()
      .filter(_.getLong(1) < 100).length
    assert(df.count() === expected)
  }

  test("nondeterministic predicates are NOT pushed below the as-of join; non-Long key/ts rejected at plan time") {
    // rand() has empty references so a references-only partition would
    // call it pushable; below the join it evaluates against a different
    // row stream and selects different rows — it must stay above
    val df = AsOf.asofJoin(purchases, errors, "user_id", "ts_ms")
      .filter(org.apache.spark.sql.functions.rand(42) < 0.5)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("rand(42)"), opt)
    // the rand Filter sits ABOVE the AsOfJoin node — never inside a child
    assert(opt.indexOf("rand(42)") < opt.indexOf("AsOfJoin"), opt)
    // key/ts must be LongType — a cryptic executor-side ClassCastException
    // becomes a clean plan-time failure
    val intKeyed = purchases.withColumn("user_id", col("user_id").cast("int"))
    val e = intercept[IllegalArgumentException](
      AsOf.asofJoin(intKeyed, errors, "user_id", "ts_ms"))
    assert(e.getMessage.contains("LongType"))
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
