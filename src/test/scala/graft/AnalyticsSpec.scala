package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Hand-computed checks for the event-analytics composites (funnel,
  * cohort retention) — the oracle covers the fixture tables; these pin
  * the ordering semantics on adversarial mini-inputs.
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("funnel: stages only count at-or-after the previous stage; highest stage wins") {
    val e = Seq(
      // u1: clean signup -> view -> purchase
      (1L, "signup", 10L), (1L, "view", 20L), (1L, "purchase", 30L),
      // u2: views exist ONLY BEFORE signup -> stuck at stage 1
      (2L, "view", 5L), (2L, "view", 8L), (2L, "signup", 10L),
      // u3: noise before signup is ignored; later full sequence counts
      (3L, "purchase", 1L), (3L, "view", 2L), (3L, "signup", 3L),
      (3L, "view", 4L), (3L, "purchase", 5L),
      // u4: never enters the funnel
      (4L, "click", 7L),
      // u5: purchase without an in-order view does not advance past 1
      (5L, "signup", 10L), (5L, "purchase", 15L))
      .toDF("user_id", "event_type", "ts_ms")
    val got = Relational.funnel(e, Seq("signup", "view", "purchase"))
      .select("user_id", "t1", "t2", "t3", "stage")
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, Some(10L), Some(20L), Some(30L), 3),
      (2L, Some(10L), None, None, 1),
      (3L, Some(3L), Some(4L), Some(5L), 3),
      (4L, None, None, None, 0),
      (5L, Some(10L), None, None, 1)))
  }

  test("funnel: a same-timestamp event satisfies the at-or-after rule") {
    val e = Seq((1L, "signup", 10L), (1L, "view", 10L), (1L, "purchase", 10L))
      .toDF("user_id", "event_type", "ts_ms")
    val got = Relational.funnel(e, Seq("signup", "view", "purchase"))
      .select("stage").as[Int].head()
    assert(got === 3)
  }

  test("cohort retention: offsets measured from each user's own first week") {
    val wk = Relational.weekMs
    val e = Seq(
      (1L, 0L), (1L, wk + 1L),          // u1: cohort wk0, active wk0 + wk1
      (2L, wk), (2L, wk + 5L),          // u2: cohort wk1, active wk1 only
      (3L, 1L), (3L, 2 * wk + 1L))      // u3: cohort wk0, active wk0 + wk2
      .toDF("user_id", "ts_ms")
    val got = Relational.cohortRetention(e)
      .select("cohort_wk", "week_offset", "n_users")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got === Seq((0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)))
  }

  test("pipeline observability: Observation metrics ride the action itself, no extra jobs") {
    // the production monitoring idiom for batch pipelines: per-stage row
    // counts and quality tallies collected DURING the write/collect action
    // via the Observation API — no second pass, no .count() side jobs
    import org.apache.spark.sql.Observation
    val docs = Tables.documents(spark, TestSpark.sf)
    val obs = Observation("gate")
    val gated = docs
      .observe(obs,
        count(lit(1)).as("n_in"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
      .filter(col("lang").isin("en", "de"))
    val kept = gated.count()
    val m = obs.get
    assert(m("n_in").asInstanceOf[Long] === docs.count())
    assert(m("n_en").asInstanceOf[Long] ===
      docs.filter(col("lang") === "en").count())
    assert(kept === docs.filter(col("lang").isin("en", "de")).count())
  }

  test("outliers: integer z-test matches a sequential double reference; degenerate users flag nothing") {
    // user 1: 12 baseline values + one spike (z > 3 at n = 13);
    // user 2: constant values (variance 0 — nothing flags);
    // user 3: a single event (n = 1 — both test sides are 0)
    val rows = (1L to 12L).map(i => (i, 1L, 1000L)) ++
      Seq((13L, 1L, 30000L), (21L, 2L, 500L), (22L, 2L, 500L), (31L, 3L, 7L))
    val got = operators.Relational.outliersByKey(
        rows.toDF("event_id", "user_id", "v_c"))
      .as[(Long, Long, Long)].collect().toSeq
    // sequential reference in plain doubles: |v - mean| > 3 * population sd
    val ref = rows.groupBy(_._2).toSeq.flatMap { case (_, es) =>
      val vs = es.map(_._3.toDouble)
      val mean = vs.sum / vs.size
      val sd = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / vs.size)
      es.filter(e => math.abs(e._3 - mean) > 3 * sd)
    }.map(e => (e._1, e._2, e._3)).sortBy(_._1)
    assert(got === ref)
    assert(got === Seq((13L, 1L, 30000L))) // only the spike flags
  }

  test("windowed outliers (q36b): events are judged against the SAME-DAY baseline only") {
    // user 1, day 0: baseline + spike (flags); day 1: the SPIKE VALUE is
    // that day's constant norm — a same-day baseline stays silent where
    // an all-time baseline would blur the two regimes together
    val rows = (1L to 12L).map(i => (i, 1L, 0L, 1000L)) ++
      Seq((13L, 1L, 0L, 30000L)) ++
      (21L to 25L).map(i => (i, 1L, 1L, 30000L))
    val ev = rows.toDF("event_id", "user_id", "day", "v_c")
    val got = operators.Relational.flagAgainstBy(ev,
        operators.Relational.momentsBy(ev, Seq("user_id", "day")),
        Seq("user_id", "day"), Seq("day"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((13L, 1L, 0L, 30000L)))
  }

  test("q36 overflow guard: adversarial magnitudes THROW instead of wrapping; boundary cases stay exact") {
    val bound = operators.Relational.q36Headroom
    // n=2, m=2e9 → n·m = 4e9 > bound: the old code wrapped s*s silently
    val hot = Seq((1L, 9L, 2000000000L), (2L, 9L, 2000000001L))
      .toDF("event_id", "user_id", "v_c")
    val e = intercept[Exception](
      operators.Relational.outliersByKey(hot).collect())
    assert(e.getMessage != null)
    // exactly AT the bound is safe (n=1, m=bound) and flags nothing
    val atBound = Seq((1L, 9L, bound)).toDF("event_id", "user_id", "v_c")
    assert(operators.Relational.outliersByKey(atBound).collect().isEmpty)
  }
}
