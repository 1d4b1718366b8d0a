package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Tables, Portable}

/** Relational / dataflow catalog (SURVEY.md §2.2 Q1–Q21) over the TPC-H-ish
  * fixtures. Every query is written for determinism against the DuckDB
  * oracle: total ORDER BY on the output, aggregates over doubles rounded at
  * the input's fixed-decimal precision (so float jitter from differing
  * summation order is absorbed), integer sums kept integral, timestamps
  * compared as epoch milliseconds (events.ts is ns parquet — SURVEY.md §7.4).
  * Float literals that MULTIPLY a column in oracle SQL must be cast
  * `CAST(x AS DOUBLE)` — DuckDB parses bare `2.2` as DECIMAL and computes
  * the product in exact decimal before converting, a last-ulp divergence
  * from Spark's IEEE multiply (r10 review finding on the BM25 oracle).
  *
  * Scale notes (100 TB): all queries are pure declarative plans — predicate
  * pushdown and column pruning reach the parquet scan; dimension joins are
  * explicitly broadcast; window operators partition by high-cardinality keys
  * (customer / user), never a global unpartitioned window except the
  * explicitly bounded top-k (planned as TakeOrderedAndProject, no full sort
  * materialization).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  // Q1 — hash aggregation with map-side partial agg (TPC-H Q1 shape).
  // sum_disc_price has 4 true decimals (2-dec price × 2-dec discount) →
  // round(4); plain sums of 2-dec doubles → round(2).
  val q1Agg: Q = (spark, dir) => {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
      | round(avg(l_quantity), 2) AS avg_qty,
      | round(avg(l_discount), 4) AS avg_disc,
      | CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // Q2 — equi inner join (orders ⋈ customer), shuffle join on o_custkey;
  // at scale both sides shuffle-partition on the key, AQE handles skew.
  val q2JoinInner: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"), col("o_orderstatus"))
  }
  val q2Sql: String =
    """SELECT c_mktsegment, o_orderstatus,
      | round(sum(o_totalprice), 2) AS revenue,
      | CAST(count(*) AS BIGINT) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // Q3 — star join with explicitly broadcast dims (nation: 25, region: 5
  // rows at every SF — broadcast is the correct plan at 100 TB too).
  val q3JoinBroadcast: Q = (spark, dir) => {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_cust"), round(avg(col("c_acctbal")), 2).as("avg_bal"))
      .orderBy(col("r_name"))
  }
  val q3Sql: String =
    """SELECT r_name, CAST(count(*) AS BIGINT) AS n_cust,
      | round(avg(c_acctbal), 2) AS avg_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // Q4 — left outer join keeping customers with zero orders.
  val q4JoinLeft: Q = (spark, dir) => {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))
  }
  val q4Sql: String =
    """SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // Q4b — full outer join of two pre-aggregated sides (nation population of
  // customers vs suppliers; nulls where one side is missing a key).
  val q4bJoinFull: Q = (spark, dir) => {
    val c = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_sup"))
    c.join(s, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        col("n_cust"), col("n_sup"))
      .orderBy(col("nationkey"))
  }
  val q4bSql: String =
    """SELECT coalesce(c.k, s.k) AS nationkey, n_cust, n_sup
      |FROM (SELECT c_nationkey AS k, CAST(count(*) AS BIGINT) AS n_cust FROM customer GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey AS k, CAST(count(*) AS BIGINT) AS n_sup FROM supplier GROUP BY 1) s
      |ON c.k = s.k ORDER BY nationkey""".stripMargin

  // Q5 — semi + anti join (EXISTS / NOT EXISTS shapes).
  val q5SemiAnti: Q = (spark, dir) => {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val semi = c.join(o.filter(col("o_orderstatus") === "P"),
        c("c_custkey") === o("o_custkey"), "left_semi")
      .select(lit("has_P_order").as("tag"), col("c_custkey").as("custkey"))
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(lit("no_orders").as("tag"), col("c_custkey").as("custkey"))
    semi.unionByName(anti).orderBy(col("tag"), col("custkey"))
  }
  val q5Sql: String =
    """SELECT * FROM (
      | SELECT 'has_P_order' AS tag, c_custkey AS custkey FROM customer
      |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      | UNION ALL
      | SELECT 'no_orders' AS tag, c_custkey AS custkey FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |) ORDER BY tag, custkey""".stripMargin

  // Q6 — range (theta) join: signup → purchase by the same user within one
  // hour. The user_id equi-key keeps this a shuffle/sort-merge join with a
  // residual range predicate — never a cartesian product, so it shards.
  val q6RangeJoin: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    val a = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("a_id"), col("ts_ms").as("a_ms"))
    val b = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("event_id").as("b_id"), col("ts_ms").as("b_ms"))
    a.join(b, col("user_id") === col("b_user") &&
        col("b_ms") >= col("a_ms") && col("b_ms") <= col("a_ms") + lit(3600000L))
      .select(col("user_id"), col("a_id"), col("b_id"), (col("b_ms") - col("a_ms")).as("delta_ms"))
      .orderBy(col("a_id"), col("b_id"))
  }
  val q6Sql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type FROM events)
      |SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id, b.ts_ms - a.ts_ms AS delta_ms
      |FROM e a JOIN e b ON a.user_id = b.user_id
      | AND b.ts_ms >= a.ts_ms AND b.ts_ms <= a.ts_ms + 3600000
      |WHERE a.event_type = 'signup' AND b.event_type = 'purchase'
      |ORDER BY a_id, b_id""".stripMargin

  // Q7 — as-of join: for each purchase, the most recent error by the same
  // user at-or-before it. Spark has no native as-of join; the classic
  // distributed rewrite is union + last(ignoreNulls) over a key-partitioned
  // window — one shuffle on user_id, streams at any scale. Tie-break at
  // equal ms: the error sorts first so `<=` semantics match DuckDB ASOF.
  val q7AsofJoin: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    val p = e.filter(col("event_type") === "purchase").select(
      col("user_id"), col("ts_ms"), col("event_id"), lit(0).as("is_right"),
      lit(null).cast("long").as("r_event_id"), lit(null).cast("long").as("r_ts_ms"))
    val r = e.filter(col("event_type") === "error").select(
      col("user_id"), col("ts_ms"), col("event_id"), lit(1).as("is_right"),
      col("event_id").as("r_event_id"), col("ts_ms").as("r_ts_ms"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms").asc, col("is_right").desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(r)
      .withColumn("asof_event_id", last(col("r_event_id"), ignoreNulls = true).over(w))
      .withColumn("asof_ts_ms", last(col("r_ts_ms"), ignoreNulls = true).over(w))
      .filter(col("is_right") === 0)
      .select(col("event_id").as("p_event_id"), col("user_id"),
        col("ts_ms").as("p_ts_ms"), col("asof_event_id"), col("asof_ts_ms"))
      .orderBy(col("p_event_id"))
  }
  val q7Sql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type FROM events),
      | p AS (SELECT * FROM e WHERE event_type = 'purchase'),
      | r AS (SELECT * FROM e WHERE event_type = 'error')
      |SELECT p.event_id AS p_event_id, p.user_id, p.ts_ms AS p_ts_ms,
      | r.event_id AS asof_event_id, r.ts_ms AS asof_ts_ms
      |FROM p ASOF LEFT JOIN r ON p.user_id = r.user_id AND p.ts_ms >= r.ts_ms
      |ORDER BY p_event_id""".stripMargin

  // Q7b — the same as-of semantics through the custom Catalyst operator
  // (graft.plans.AsOfJoinExec: one hash shuffle + per-partition merge scan)
  // instead of the window rewrite; checked against the same DuckDB ASOF
  // oracle, so the two execution strategies are mutually verified.
  val q7bAsofCustom: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"), col("ts_ms"))
    val r = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("asof_event_id"), col("ts_ms"))
    graft.plans.AsOf.asofJoin(p, r, "user_id", "ts_ms", tieBreak = Some("asof_event_id"))
      .toDF("user_id", "p_event_id", "p_ts_ms", "r_user_id", "asof_event_id", "asof_ts_ms")
      .select(col("p_event_id"), col("user_id"), col("p_ts_ms"),
        col("asof_event_id"), col("asof_ts_ms"))
      .orderBy(col("p_event_id"))
  }

  // Q8 — multi-aggregate stats incl. exact distinct count (shuffle expand).
  val q8AggStats: Q = (spark, dir) => {
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value"),
        round(avg(col("value")), 4).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }
  val q8Sql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      | round(sum(value), 2) AS sum_value, round(avg(value), 4) AS avg_value,
      | min(value) AS min_value, max(value) AS max_value,
      | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // Q8b — exact percentiles (interpolated): Spark `percentile` and DuckDB
  // `quantile_cont` share the linear-interpolation definition; rounding at
  // 4 absorbs last-bit interpolation differences.
  val q8bPercentile: Q = (spark, dir) => {
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))
      .orderBy(col("event_type"))
  }
  val q8bSql: String =
    """SELECT event_type,
      | round(quantile_cont(value, 0.5), 4) AS p50,
      | round(quantile_cont(value, 0.9), 4) AS p90,
      | round(quantile_cont(value, 0.99), 4) AS p99
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // Q8c — statistical aggregates (sample stddev/variance, correlation,
  // covariance); both engines use numerically stable one-pass updates,
  // round(6) absorbs the last-bit differences.
  val q8cStats: Q = (spark, dir) => {
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(stddev_samp(col("value")), 6).as("sd"),
        round(var_samp(col("value")), 6).as("vr"),
        round(corr(col("value"), col("user_id").cast("double")), 6).as("cr"),
        round(covar_samp(col("value"), col("user_id").cast("double")), 6).as("cv"))
      .orderBy(col("event_type"))
  }
  val q8cSql: String =
    """SELECT event_type,
      | round(stddev_samp(value), 6) AS sd,
      | round(var_samp(value), 6) AS vr,
      | round(corr(value, CAST(user_id AS DOUBLE)), 6) AS cr,
      | round(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS cv
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // Q8d — string aggregation. collect_list order is partition-dependent,
  // so the deterministic form is collect_set → sort_array → array_join,
  // mirrored by DuckDB's string_agg(DISTINCT ... ORDER BY).
  val q8dStringAgg: Q = (spark, dir) => {
    Tables.events(spark, dir)
      .filter(col("user_id") < 10)
      .groupBy(col("user_id"))
      .agg(array_join(sort_array(collect_set(col("event_type"))), ",").as("types_seen"),
        count(lit(1)).as("n"))
      .orderBy(col("user_id"))
  }
  val q8dSql: String =
    """SELECT user_id,
      | string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_seen,
      | CAST(count(*) AS BIGINT) AS n
      |FROM events WHERE user_id < 10 GROUP BY 1 ORDER BY 1""".stripMargin

  // Q_unpivot — melt wide columns to (key, metric, value) rows.
  val qUnpivot: Q = (spark, dir) => {
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 50)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
  }
  val qUnpivotSql: String =
    """SELECT l_orderkey, l_linenumber, metric, value
      |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      |      FROM lineitem WHERE l_orderkey < 50)
      |UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount))
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin

  // Q9 — DISTINCT projection (dedup of a key pair).
  val q9Distinct: Q = (spark, dir) => {
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
      .orderBy(col("user_id"), col("event_type"))
  }
  val q9Sql: String =
    "SELECT DISTINCT user_id, event_type FROM events ORDER BY 1, 2"

  // Q9b — approximate distinct via HLL++ (no DuckDB oracle: different
  // sketch; driver records the weaker rows-only check; exactness covered by
  // the scalatest bound vs the true count).
  val q9bApproxDistinct: Q = (spark, dir) => {
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy(col("event_type"))
  }

  // Q9c — the oracle-checkable form of the sketch: each engine computes
  // ITS OWN approx_count_distinct and ITS OWN exact count and emits the
  // boolean |approx − exact| ≤ 5%·exact. The sketches differ; the bound
  // must hold in both, so the booleans hash-match — turning the sketch's
  // accuracy contract into an exact cross-engine check.
  val q9cApproxBound: Q = (spark, dir) => {
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.01).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .select(col("event_type"),
        (abs(col("approx") - col("exact")) * 100 <= col("exact") * 5).as("within_5pct"))
      .orderBy(col("event_type"))
  }
  val q9cSql: String =
    """SELECT event_type,
      | abs(approx_count_distinct(user_id) - count(DISTINCT user_id)) * 100
      |   <= count(DISTINCT user_id) * 5 AS within_5pct
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q9d — the DataSketches HLL surface (`hll_sketch_agg` /
    * `hll_union_agg` / `hll_sketch_estimate`), distinct from q9b/q9c's
    * HyperLogLog++ `approx_count_distinct`: here the SKETCH is a
    * first-class mergeable value. Eight shard-level sketches union to
    * the corpus estimate without touching a row again — the
    * mergeable-summaries property the durable streaming distinct count
    * (T21) commits through the versioned store. Exact distinct + the 5%
    * accuracy bound checked cross-engine (the q9c boolean pattern; at
    * lgK=12 the expected error is ~1.6%).
    */
  val q9dHllUnionBound: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    val approx = e
      .withColumn("shard", pmod(col("event_id"), lit(8)))
      .groupBy(col("shard"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .agg(expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)")
        .as("approx"))
    e.agg(countDistinct(col("user_id")).as("n_exact"))
      .crossJoin(approx)
      .select(col("n_exact"),
        (abs(col("approx") - col("n_exact")) * 100 <= col("n_exact") * 5)
          .as("within_5pct"))
  }
  val q9dSql: String =
    """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
      | true AS within_5pct
      |FROM events""".stripMargin

  /** Approximate percentile (Spark: KLL-style quantile summaries; DuckDB:
    * t-digest) with the accuracy contract checked as a cross-engine
    * boolean, like q9c/x3f: each engine's own sketch must land within 5%
    * of its own exact median. The sketches differ; the bound must hold in
    * both.
    */
  val q8eApproxPercentileBound: Q = (spark, dir) => {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx"),
        expr("percentile(l_extendedprice, 0.5)").as("exact"))
      .select(col("l_returnflag"),
        (abs(col("approx") - col("exact")) * 100 <= col("exact") * 5).as("within_5pct"))
      .orderBy(col("l_returnflag"))
  }
  val q8eSql: String =
    """SELECT l_returnflag,
      | abs(approx_quantile(l_extendedprice, 0.5) - quantile_cont(l_extendedprice, 0.5)) * 100
      |   <= quantile_cont(l_extendedprice, 0.5) * 5 AS within_5pct
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q8f — the GK quantile sketch's RANK-error contract (the theorem
    * itself, unlike q8e's data-dependent value-space bound): for each
    * group and each φ ∈ {0.25, 0.5, 0.75}, `approx_percentile(value, φ,
    * accuracy)` must return an element whose exact rank interval
    * intersects `[φ·N − 2εN, φ·N + 2εN]` with ε = 1/accuracy. The factor
    * 2 is the x4m slack discipline: Spark documents ε as the target; the
    * merge of per-partition summaries is where implementations spend
    * their margin, and the oracle hardcodes TRUE — at 2ε the boolean is
    * robust to any conforming implementation while still ~25× tighter
    * than q8e's 5%-of-value check at these group sizes. The estimate
    * itself stays OUT of the compared output (which element the sketch
    * returns is partition-order-dependent; its rank CONTRACT is not).
    * Rank interval via two counts (< and ≤) so duplicated values get
    * their full valid rank range.
    *
    * This completes the sketch-bounds family as one cross-engine-checked
    * tier: MG undercount (x4l), CMS overcount (x4m), HLL cardinality
    * (q9c), GK rank error (q8f).
    *
    * Scale: the estimates table is (groups × 3) rows — broadcast to the
    * exact-rank pass, which is one map-side-combined aggregation over the
    * events scan. Two passes total, both full-scan-shaped, no window.
    */
  val q8fQuantileRankBound: Q = (spark, dir) => {
    val accuracy = 100 // ε = 0.01
    val phis = Seq(0.25, 0.5, 0.75)
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val est = ev.groupBy(col("event_type"))
      .agg(expr(s"approx_percentile(value, array(${phis.mkString("D,")}D), $accuracy)")
        .as("qs"), count(lit(1)).as("n"))
      .select(col("event_type"), col("n"),
        posexplode(col("qs")).as(Seq("i", "qhat")))
      .select(col("event_type"), col("n"),
        element_at(typedlit(phis), col("i") + 1).as("phi"), col("qhat"))
    ev.join(broadcast(est), Seq("event_type"))
      .groupBy(col("event_type"), col("phi"), col("n"))
      .agg(
        sum(when(col("value") < col("qhat"), 1L).otherwise(0L)).as("rank_lt"),
        sum(when(col("value") <= col("qhat"), 1L).otherwise(0L)).as("rank_le"))
      .select(col("event_type"), col("phi"), col("n"),
        // rank interval [rank_lt+1, rank_le] vs target band phi*n ± 2*n/accuracy
        ((col("rank_lt") + 1) * lit(accuracy) <=
            (col("phi") * col("n") * accuracy + lit(2) * col("n")) &&
          col("rank_le") * lit(accuracy) >=
            (col("phi") * col("n") * accuracy - lit(2) * col("n")))
          .as("rank_ok"))
      .orderBy(col("event_type"), col("phi"))
  }
  val q8fSql: String =
    """SELECT event_type, phi, CAST(count(*) AS BIGINT) AS n, TRUE AS rank_ok
      |FROM events
      |CROSS JOIN (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
      |                           CAST(0.75 AS DOUBLE)]) AS phi) p
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q8g — the LIBRARY'S OWN mergeable quantile digest's rank contract
    * (q8e/q8f bound Spark's built-in GK sketch; this bounds
    * [[graft.functions.QDigest]], the deterministic Q-digest the durable
    * streaming quantile tier T26 commits through the versioned store).
    * Orders' totalprice maps into the digest's 2^16 universe (floor
    * dollars ÷ 10 — order-preserving, no clamp reached at TPC-H price
    * ranges), the digest builds from the ≤U-row per-leaf count table
    * (constant-bounded collect — the T26 shape exactly), and for each
    * φ ∈ {1,5,25,50,75,95,99}% the returned value's exact rank interval
    * must intersect `target ± 2·log2(U)·(n/k)` — the Q-digest theorem
    * with the x4m 2× slack discipline (the bound is deterministic here,
    * the slack guards fixture regeneration). The digest VALUE stays out
    * of the compared output (SQL cannot replay the digest); the rank
    * contract and the ceil-rank target are cross-engine-exact.
    *
    * Scale: one map-side-combined leaf-count aggregation (≤65536 rows by
    * construction) is the ONLY corpus pass; the digest compresses over
    * ≤3k nodes and the seven exact ranks read off the same collected
    * leaf table driver-side — no window, no sort, no second scan.
    */
  val q8gQdigestBound: Q = (spark, dir) => {
    import spark.implicits._
    val Q = graft.functions.QDigest
    val k = 512
    // the leaf clamp runs IN-PLAN, before the groupBy, so the driver
    // materialization is ≤ 2^16 rows BY CONSTRUCTION for any input —
    // a pre-clamp value groupBy would be bounded only by the data's
    // value domain, and out-of-domain values fold onto the edge leaves
    // map-side instead of colliding after collect
    val leafCol = lit(Q.U) + least(
      greatest(expr("CAST(floor(o_totalprice / 10) AS BIGINT)"), lit(0L)),
      lit(Q.U - 1))
    val leafCounts = Tables.orders(spark, dir)
      .select(leafCol.as("leaf"))
      .groupBy(col("leaf")).agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    val n = leafCounts.valuesIterator.sum
    val digest = Q.compress(leafCounts, n, k)
    val bound = 2L * Q.logU * math.max(1L, n / k)
    // exact ranks straight from the already-collected leaf table (the
    // leaf ↔ value map is order-preserving over the clamped domain, and
    // the table IS the complete per-value count) — the corpus is scanned
    // exactly once, by the leaf-count aggregation above
    val sortedLeaves = leafCounts.toSeq.sorted
    def rankUpTo(leafId: Long, inclusive: Boolean): Long =
      sortedLeaves.iterator
        .takeWhile { case (id, _) => if (inclusive) id <= leafId else id < leafId }
        .map(_._2).sum
    Seq(1L, 5L, 25L, 50L, 75L, 95L, 99L).map { p =>
      val dv = Q.quantile(digest, n, p, 100L)
      val target = (p * n + 99L) / 100L
      val rLo = rankUpTo(Q.leaf(dv), inclusive = false)
      val rHi = rankUpTo(Q.leaf(dv), inclusive = true)
      (p, target, rHi >= target - bound && rLo <= target + bound)
    }.toDF("q_pct", "target", "rank_ok")
      .orderBy(col("q_pct"))
  }
  val q8gSql: String =
    """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
      |q(q_pct) AS (VALUES (1), (5), (25), (50), (75), (95), (99))
      |SELECT CAST(q_pct AS BIGINT) AS q_pct,
      | (q_pct * n + 99) // 100 AS target, TRUE AS rank_ok
      |FROM q, nn ORDER BY q_pct""".stripMargin

  // Q10 — ROLLUP hierarchy (group keys COALESCEd so the subtotal rows have
  // non-null sort keys in both engines).
  val q10Rollup: Q = (spark, dir) => {
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy(col("rf"), col("ls"))
  }
  val q10Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      | round(sum(l_quantity), 2) AS sum_qty, CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  // Q10b — CUBE over orders.
  val q10bCube: Q = (spark, dir) => {
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"), count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
        col("revenue"), col("n"))
      .orderBy(col("st"), col("pri"))
  }
  val q10bSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS st, coalesce(o_orderpriority, 'ALL') AS pri,
      | round(sum(o_totalprice), 2) AS revenue, CAST(count(*) AS BIGINT) AS n
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY st, pri""".stripMargin

  // Q11 — ranking window: top-3 orders per customer. Key-partitioned window
  // (shards by customer); deterministic tie-break on orderkey.
  val q11WindowRank: Q = (spark, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }
  val q11Sql: String =
    """SELECT o_custkey, CAST(row_number() OVER w AS INT) AS rn, o_orderkey, o_totalprice
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |QUALIFY rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // Q11b — distribution window functions: ntile / percent_rank / cume_dist.
  // percent_rank=(rank-1)/(n-1) and cume_dist=peers/n are exact rationals
  // evaluated identically in both engines — no rounding needed.
  val q11bWindowDist: Q = (spark, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
  }
  val q11bSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      | CAST(ntile(4) OVER w AS INT) AS quartile,
      | percent_rank() OVER w AS pct_rank,
      | cume_dist() OVER w AS cume
      |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_custkey, o_totalprice, o_orderkey""".stripMargin

  // Q12b — positional window values: first/last/nth over an explicit ROWS
  // frame (default RANGE frames differ subtly; ROWS is unambiguous).
  val q12bWindowPos: Q = (spark, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ms"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"),
        nth_value(col("event_type"), 2).over(w).as("second_type"))
      .orderBy(col("user_id"), col("ts_ms"), col("event_id"))
  }
  val q12bSql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type FROM events)
      |SELECT user_id, event_id, ts_ms,
      | first_value(event_type) OVER w AS first_type,
      | last_value(event_type) OVER w AS last_type,
      | nth_value(event_type, 2) OVER w AS second_type
      |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY user_id, ts_ms, event_id""".stripMargin

  // Q12 — analytic window: lag/lead over each user's event timeline.
  val q12WindowLag: Q = (spark, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ms"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy(col("user_id"), col("ts_ms"), col("event_id"))
  }
  val q12Sql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type, value FROM events)
      |SELECT user_id, event_id, ts_ms,
      | lag(value, 1) OVER w AS prev_value,
      | lead(event_type, 1) OVER w AS next_type
      |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
      |ORDER BY user_id, ts_ms, event_id""".stripMargin

  // Q13 — explicit ROWS frame: running revenue per customer.
  val q13WindowFrame: Q = (spark, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("od_ms"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_revenue"))
      .orderBy(col("o_custkey"), col("od_ms"), col("o_orderkey"))
  }
  val q13Sql: String =
    """SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS od_ms,
      | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |   ORDER BY o_orderdate, o_orderkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_revenue
      |FROM orders ORDER BY o_custkey, od_ms, o_orderkey""".stripMargin

  /** Q13b — VALUE-range frame (`RANGE BETWEEN 29 PRECEDING AND CURRENT
    * ROW` over epoch-day), the complement of q13's positional ROWS
    * frame: the trailing-30-day revenue per customer, the canonical
    * sliding-window-by-time aggregate. RANGE frames include ALL peers
    * of the current order value, so same-day orders see each other's
    * revenue symmetrically — deterministic without a tiebreak column,
    * where a ROWS frame over a tied sort would be partition-order
    * dependent. Revenue sums in integer CENTS: the frame's float
    * accumulation order is engine-internal, but 64-bit integer addition
    * commutes, so the totals compare hash-exact.
    */
  val q13bRangeFrame: Q = (spark, dir) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
      .rangeBetween(-29, 0)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        (unix_millis(col("o_orderdate").cast("timestamp")) /
          lit(86400000L)).cast("long").as("d"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .withColumn("trail30_cents", sum(col("cents")).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("d"),
        col("trail30_cents"))
      .orderBy(col("o_custkey"), col("d"), col("o_orderkey"))
  }
  val q13bSql: String =
    """WITH o AS (SELECT o_custkey, o_orderkey,
      |  epoch_ms(o_orderdate) // 86400000 AS d,
      |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      | FROM orders)
      |SELECT o_custkey, o_orderkey, d,
      | CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY d
      |   RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT)
      |   AS trail30_cents
      |FROM o ORDER BY o_custkey, d, o_orderkey""".stripMargin

  // Q14 — global top-k: Spark plans orderBy+limit as TakeOrderedAndProject
  // (per-partition heaps + driver merge of k rows — no global sort), which
  // is exactly the 100 TB-safe plan.
  val q14TopK: Q = (spark, dir) => {
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }
  val q14Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // Q15 — set operations (UNION/INTERSECT/EXCEPT, all distinct semantics).
  val q15SetOps: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val withP = o.filter(col("o_orderstatus") === "P").select(col("o_custkey").as("custkey"))
    val withF = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
    val both = withP.intersect(withF).select(lit("P_and_F").as("tag"), col("custkey"))
    val either = withP.union(withF).distinct().select(lit("P_or_F").as("tag"), col("custkey"))
    val noOrders = c.select(col("c_custkey").as("custkey"))
      .except(o.select(col("o_custkey").as("custkey")))
      .select(lit("no_orders").as("tag"), col("custkey"))
    both.unionByName(either).unionByName(noOrders).orderBy(col("tag"), col("custkey"))
  }
  val q15Sql: String =
    """SELECT * FROM (
      | SELECT 'P_and_F' AS tag, custkey FROM (
      |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
      |  INTERSECT
      |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
      | UNION ALL
      | SELECT 'P_or_F' AS tag, custkey FROM (
      |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
      |  UNION
      |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
      | UNION ALL
      | SELECT 'no_orders' AS tag, custkey FROM (
      |  SELECT c_custkey AS custkey FROM customer
      |  EXCEPT
      |  SELECT o_custkey AS custkey FROM orders)
      |) ORDER BY tag, custkey""".stripMargin

  // Q16 — string function battery (all codegen'd built-ins).
  val q16String: Q = (spark, dir) => {
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        lower(col("c_name")).as("name_lc"),
        upper(col("c_mktsegment")).as("seg_uc"),
        substring(col("c_name"), 1, 8).as("name8"),
        element_at(split(col("c_name"), "#"), 2).as("num_part"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        length(col("c_name")).as("name_len"),
        concat_ws("@", lower(col("c_mktsegment")), lit("example.com")).as("fake_email"))
      .orderBy(col("c_custkey"))
  }
  val q16Sql: String =
    """SELECT c_custkey, lower(c_name) AS name_lc, upper(c_mktsegment) AS seg_uc,
      | substring(c_name, 1, 8) AS name8,
      | string_split(c_name, '#')[2] AS num_part,
      | regexp_extract(c_name, '([0-9]+)', 1) AS digits,
      | CAST(length(c_name) AS INT) AS name_len,
      | concat_ws('@', lower(c_mktsegment), 'example.com') AS fake_email
      |FROM customer ORDER BY c_custkey""".stripMargin

  // Q16b — conditional expressions: greatest/least/nullif/coalesce/CASE.
  val q16bConditional: Q = (spark, dir) => {
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 200)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        greatest(col("l_discount"), col("l_tax")).as("max_rate"),
        least(col("l_discount"), col("l_tax")).as("min_rate"),
        nullif(col("l_discount"), lit(0.0)).as("disc_or_null"),
        coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("disc_dflt"),
        when(col("l_quantity") >= 25, "bulk")
          .when(col("l_quantity") >= 10, "mid").otherwise("small").as("qty_class"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }
  val q16bSql: String =
    """SELECT l_orderkey, l_linenumber,
      | greatest(l_discount, l_tax) AS max_rate,
      | least(l_discount, l_tax) AS min_rate,
      | nullif(l_discount, 0.0) AS disc_or_null,
      | coalesce(nullif(l_discount, 0.0), -1.0) AS disc_dflt,
      | CASE WHEN l_quantity >= 25 THEN 'bulk'
      |      WHEN l_quantity >= 10 THEN 'mid' ELSE 'small' END AS qty_class
      |FROM lineitem WHERE l_orderkey < 200
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // Q17c — date arithmetic: offsets, truncation, component differences on
  // ms-precision timestamps (compared as epoch-ms longs / exact ints).
  val q17cDateArith: Q = (spark, dir) => {
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") < 500)
      .select(
        col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("od_ms"),
        // interval arithmetic (not add_months/date_add, which coerce to
        // DateType and drop time-of-day — the oracle keeps it)
        unix_millis((col("o_orderdate") + expr("INTERVAL 3 MONTHS")).cast("timestamp")).as("plus3m_ms"),
        unix_millis((col("o_orderdate") + expr("INTERVAL 30 DAYS")).cast("timestamp")).as("plus30d_ms"),
        unix_millis(date_trunc("month", col("o_orderdate")).cast("timestamp")).as("month_ms"),
        datediff(lit("2000-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_y2k"))
      .orderBy(col("o_orderkey"))
  }
  val q17cSql: String =
    """SELECT o_orderkey,
      | epoch_ms(o_orderdate) AS od_ms,
      | epoch_ms(o_orderdate + INTERVAL 3 MONTH) AS plus3m_ms,
      | epoch_ms(o_orderdate + INTERVAL 30 DAY) AS plus30d_ms,
      | epoch_ms(date_trunc('month', o_orderdate)) AS month_ms,
      | CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k
      |FROM orders WHERE o_orderkey < 500
      |ORDER BY o_orderkey""".stripMargin

  // Q17 — time bucketing (the batch twin of the streaming tumbling window
  // T1; same window() primitive drives the streaming form in tests).
  val q17DateTime: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    e.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        unix_millis(col("window.start")).as("hour_ms"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("hour_ms"), col("event_type"))
  }
  val q17Sql: String =
    """SELECT epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)) AS hour_ms, event_type,
      | CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // Q17b — calendar field extraction on ms-precision order dates.
  val q17bExtract: Q = (spark, dir) => {
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("y"), col("m"))
  }
  val q17bSql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
      | CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS revenue
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // Q18 — scalar math battery. Per-row expressions mirror the oracle's
  // association order exactly → bit-identical IEEE doubles, no rounding
  // tolerance needed.
  val q18Math: Q = (spark, dir) => {
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 100)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("disc_price"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("charge"),
        abs(col("l_discount") - lit(0.05)).as("disc_dev"),
        sqrt(col("l_extendedprice")).as("price_sqrt"),
        floor(col("l_quantity") / lit(5.0)).as("qty_bucket"),
        round(col("l_quantity") / lit(7.0), 3).as("qty_sevenths"),
        pmod(col("l_orderkey"), lit(7L)).as("key_mod"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }
  val q18Sql: String =
    """SELECT l_orderkey, l_linenumber,
      | l_extendedprice * (1.0 - l_discount) AS disc_price,
      | l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge,
      | abs(l_discount - 0.05) AS disc_dev,
      | sqrt(l_extendedprice) AS price_sqrt,
      | CAST(floor(l_quantity / 5.0) AS BIGINT) AS qty_bucket,
      | round(l_quantity / 7.0, 3) AS qty_sevenths,
      | l_orderkey % 7 AS key_mod
      |FROM lineitem WHERE l_orderkey < 100
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // Q19 — array functions over 64-d embeddings; dot products via the
  // generated left-associative chain (Portable.dot) — codegen'd and
  // bit-identical with the oracle.
  val q19Array: Q = (spark, dir) => {
    val dim = 64
    val e = Tables.embeddings(spark, dir)
    val headSum = (1 to 8).map(i => element_at(col("embedding"), i).cast("double")).reduceLeft(_ + _)
    e.select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("e1"),
        sqrt(Portable.dot(col("embedding"), col("embedding"), dim)).as("l2_norm"),
        headSum.as("head8_sum"),
        // higher-order lambdas in order-independent exact forms: count via
        // filter, max over exact float abs via transform
        expr("size(filter(embedding, x -> x > 0F))").cast("long").as("n_pos"),
        expr("array_max(transform(embedding, x -> abs(x)))").cast("double").as("max_abs"),
        // zip_with + slice: pairwise min of the vector with its reverse,
        // first element (element-wise, exact)
        expr("CAST(element_at(zip_with(embedding, reverse(embedding), (a, b) -> least(a, b)), 1) AS DOUBLE)").as("sym_min1"))
      .orderBy(col("vec_id"))
  }
  val q19Sql: String = {
    val headSum = (1 to 8).map(i => s"CAST(embedding[$i] AS DOUBLE)").mkString(" + ")
    s"""SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
       | CAST(embedding[1] AS DOUBLE) AS e1,
       | sqrt(${Portable.dotSql("embedding", "embedding", 64)}) AS l2_norm,
       | $headSum AS head8_sum,
       | CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
       | CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS max_abs,
       | CAST(least(embedding[1], embedding[64]) AS DOUBLE) AS sym_min1
       |FROM embeddings ORDER BY vec_id""".stripMargin
  }

  // Q20 — JSON extraction from the events.props payload.
  val q20Json: Q = (spark, dir) => {
    Tables.events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"), col("value"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("k"))
  }
  val q20Sql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
      | CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // Q21 — JSON parsed as a MapType column, element_at access.
  val q21Map: Q = (spark, dir) => {
    import org.apache.spark.sql.types.{MapType, StringType, IntegerType}
    Tables.events(spark, dir)
      .select(from_json(col("props"), MapType(StringType, IntegerType)).as("m"), col("event_type"))
      .select(element_at(col("m"), "k").as("k"), col("event_type"))
      .groupBy(col("event_type"))
      .agg(round(avg(col("k")), 4).as("avg_k"), count(col("k")).as("n_k"))
      .orderBy(col("event_type"))
  }
  val q21Sql: String =
    """SELECT event_type, round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
      | CAST(count(json_extract_string(props, '$.k')) AS BIGINT) AS n_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // Q_sessionize — batch sessionization via gaps-and-islands (lag + running
  // sum of gap flags), the oracle-checkable twin of the streaming
  // session_window (T3). A spec asserts this formulation produces the same
  // sessions as session_window itself.
  val qSessionize: Q = (spark, dir) => {
    val gapMs = 30 * 60 * 1000L
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ms"))
      .withColumn("new_session",
        when(col("ts_ms") - lag(col("ts_ms"), 1).over(byUser) > gapMs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_ms")).as("start_ms"), max(col("ts_ms")).as("end_ms"))
      .orderBy(col("user_id"), col("session_id"))
  }
  val qSessionizeSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
      |flagged AS (
      | SELECT user_id, event_id, ts_ms,
      |  CASE WHEN ts_ms - lag(ts_ms, 1) OVER w > 1800000 THEN 1 ELSE 0 END AS new_session
      | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
      |sessions AS (
      | SELECT user_id, event_id, ts_ms,
      |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      | FROM flagged)
      |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
      | min(ts_ms) AS start_ms, max(ts_ms) AS end_ms
      |FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // Q10c — GROUPING SETS via the SQL authoring path (spark.sql over a temp
  // view — exercises the parser/analyzer entry instead of the DSL).
  val q10cGroupingSets: Q = (spark, dir) => {
    Tables.lineitem(spark, dir).createOrReplaceTempView("v_li_gs")
    spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM v_li_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin)
  }
  val q10cSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      | round(sum(l_quantity), 2) AS sum_qty, CAST(count(*) AS BIGINT) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin

  // Q_pivot — pivot events per user into one column per event type.
  val qPivot: Q = (spark, dir) => {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy(col("user_id"))
  }
  val qPivotSql: String =
    """SELECT user_id,
      | CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
      | CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
      | CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
      | CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
      | CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // Q22 — correlated scalar subquery (Catalyst decorrelates it into a
  // left outer aggregate join — SURVEY.md §4.2).
  val q22Subquery: Q = (spark, dir) => {
    Tables.customer(spark, dir).createOrReplaceTempView("v_cust_sq")
    Tables.orders(spark, dir).createOrReplaceTempView("v_ord_sq")
    spark.sql(
      """SELECT c_custkey,
        | (SELECT count(*) FROM v_ord_sq o WHERE o.o_custkey = c.c_custkey) AS n_ord
        |FROM v_cust_sq c ORDER BY c_custkey""".stripMargin)
  }
  val q22Sql: String =
    """SELECT c_custkey,
      | (SELECT CAST(count(*) AS BIGINT) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_ord
      |FROM customer c ORDER BY c_custkey""".stripMargin

  // Q23 — z-order layout audit: bucket events by the Morton z-value of
  // (user, hour) and emit each bucket's span in BOTH dimensions. The point
  // of the curve is the invariant this query exposes: every z-bucket covers
  // a bounded user range AND a bounded hour range simultaneously, so files
  // written in z-order are prunable by min/max stats under predicates on
  // either or both columns — a single-column sort gives unbounded span in
  // the other column. At 100 TB the layout step is
  // `repartitionByRange(col("z"))` + sorted write; this query is the audit
  // that the interleave actually clusters (see Partitioning.zValue).
  val q23Zorder: Q = (spark, dir) => {
    val e = Tables.events(spark, dir).select(
      pmod(col("user_id"), lit(65536L)).as("ux"),
      pmod(expr("ts_ms DIV 3600000"), lit(65536L)).as("hy"))
    e.withColumn("z", Partitioning.zValue(col("ux"), col("hy")))
      .withColumn("zbkt", expr("z DIV 4096"))
      .groupBy(col("zbkt"))
      .agg(count(lit(1)).as("n"),
        min(col("ux")).as("u_min"), max(col("ux")).as("u_max"),
        min(col("hy")).as("h_min"), max(col("hy")).as("h_max"))
      .orderBy(col("zbkt"))
  }
  val q23Sql: String = {
    val z = (0 until 16).map(i =>
      s"(((ux >> $i) & 1) << ${2 * i}) + (((hy >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")
    s"""WITH e AS (SELECT user_id % 65536 AS ux,
       |  (epoch_ms(ts) // 3600000) % 65536 AS hy FROM events),
       |z AS (SELECT ux, hy, ($z) // 4096 AS zbkt FROM e)
       |SELECT zbkt, CAST(count(*) AS BIGINT) AS n,
       | min(ux) AS u_min, max(ux) AS u_max, min(hy) AS h_min, max(hy) AS h_max
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // Q24 — skew-salted join, oracle-checked: the big/skewed side (lineitem)
  // is scattered across `salts` replicas of the small side (supplier), so a
  // hot supplier key spreads over `salts` tasks instead of one straggler —
  // the manual complement to AQE's runtime skew splitting (it also covers
  // the cases AQE can't: skewed hash AGGREGATIONS, and plans whose stats
  // arrive too late to re-split). The salt is internal: every probe row
  // still meets its key's build rows exactly once, so the result — and the
  // oracle — is the PLAIN join, which is the point: the technique changes
  // the schedule, never the answer (see Partitioning.saltedEquiJoin and the
  // no-Exchange/identity specs in PartitioningSpec).
  val q24SaltedJoin: Q = (spark, dir) => {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("disc_price"))
    val supp = Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    Partitioning.saltedEquiJoin(li, supp, "suppkey", salts = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"), round(sum(col("disc_price")), 2).as("revenue"))
      .orderBy(col("s_nationkey"))
  }
  val q24Sql: String =
    """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_items,
      | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // Q25 — ordered funnel (signup → view → purchase): each stage's earliest
  // event AT OR AFTER the previous stage's time, per user. Single-pass:
  // ONE groupBy(user_id) collects the user's stage events, sorts them by
  // (ts, stage rank), and folds them chronologically with an N-slot
  // accumulator — the first stage-1 event sets t1, the first stage-k event
  // at-or-after t_{k-1} sets t_k, which IS the chained conditional min
  // (min of stage-k events ≥ t_{k-1} = the first one met in time order).
  // One keyed exchange total, vs the previous per-stage join-fold's 15
  // Exchanges / 7 joins for 3 stages. The trade: the fold buffers a
  // user's own stage events in ONE aggregation buffer (the join-fold kept
  // constant state) — per-user funnel-event counts are human-scale, and a
  // pathological flood degrades to that user's events in a partial agg,
  // never a task hot-spot for OTHER users.
  def funnel(e: DataFrame, stages: Seq[String]): DataFrame = {
    val n = stages.length
    // stage rank 1..n inside the sort key so equal-ts events process in
    // stage order — a purchase at exactly the qualifying view's ts must
    // fold AFTER that view (>= is inclusive); null for non-stage events,
    // which when() drops so collect_list never sees them
    val rk = stages.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (s, i)) => when(col("event_type") === s, lit(i + 1)).otherwise(acc)
    }
    val ev = when(rk.isNotNull, struct(col("ts_ms").as("ts"), rk.as("rk")))
    val init = struct((1 to n).map(i => lit(null).cast("long").as(s"t$i")): _*)
    def step(acc: org.apache.spark.sql.Column,
        x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val ts = x.getField("ts")
      val r = x.getField("rk")
      struct((1 to n).map { i =>
        val prevOk =
          if (i == 1) lit(true)
          else acc.getField(s"t${i - 1}").isNotNull &&
            ts >= acc.getField(s"t${i - 1}")
        when(acc.getField(s"t$i").isNull && r === i && prevOk, ts)
          .otherwise(acc.getField(s"t$i")).as(s"t$i")
      }: _*)
    }
    // groupBy over ALL events (not pre-filtered) so stage-0 users — whose
    // events are all non-stage types — still get a row
    val folded = e.groupBy(col("user_id"))
      .agg(aggregate(array_sort(collect_list(ev)), init, step).as("f"))
    val stageExpr = (1 to n).foldLeft(lit(0)) {
      (acc, i) => when(col(s"t$i").isNotNull, i).otherwise(acc)
    }
    folded
      .select(col("user_id") +:
        (1 to n).map(i => col("f").getField(s"t$i").as(s"t$i")): _*)
      .withColumn("stage", stageExpr)
  }

  val q25Funnel: Q = (spark, dir) =>
    funnel(Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"), col("ts_ms")),
      Seq("signup", "view", "purchase"))
      .orderBy(col("user_id"))
  val q25Sql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
      |s1 AS (SELECT user_id, min(ts_ms) AS t1 FROM e
      |       WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(ts_ms) AS t2 FROM e JOIN s1 USING (user_id)
      |       WHERE event_type = 'view' AND ts_ms >= t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(ts_ms) AS t3 FROM e JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND ts_ms >= t2 GROUP BY 1)
      |SELECT u.user_id, t1, t2, t3,
      | CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
      |           WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage
      |FROM (SELECT DISTINCT user_id FROM e) u
      | LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
      | LEFT JOIN s3 USING (user_id)
      |ORDER BY user_id""".stripMargin

  // Q26 — cohort retention: users grouped by first-seen week, activity
  // counted per (cohort week, weeks since). Two keyed aggregations: first
  // seen per user (map-side-combined min), then distinct active users per
  // (cohort, offset) — Spark's two-phase distinct aggregate. The first-seen
  // join is keyed by user_id; nothing global, nothing windowed.
  val weekMs = 7L * 86400000L
  def cohortRetention(e: DataFrame): DataFrame = {
    val first = e.groupBy(col("user_id")).agg(min(col("ts_ms")).as("t0"))
      .select(col("user_id"), expr(s"t0 DIV $weekMs").as("cohort_wk"))
    e.join(first, "user_id")
      .select(col("cohort_wk"),
        (expr(s"ts_ms DIV $weekMs") - col("cohort_wk")).as("week_offset"),
        col("user_id"))
      .groupBy(col("cohort_wk"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  val q26Cohort: Q = (spark, dir) =>
    cohortRetention(Tables.events(spark, dir).select(col("user_id"), col("ts_ms")))
      .orderBy(col("cohort_wk"), col("week_offset"))

  /** Q33 — rolling active users: DAU plus the trailing-7-day distinct
    * count per day (the DAU/WAU pair every product dashboard runs).
    * Rolling DISTINCT does not decompose into window-frame aggregation
    * (sets don't subtract), and the naive form is a per-day self-join
    * over the activity table. The scale shape used here: dedup to
    * (user, day) once, then EXPLODE each row to the 7 window-ends it
    * contributes to — a map-side 7× multiplier, no join — and run one
    * two-phase distinct per window_end. Cost: one dedup shuffle + one
    * 7×-amplified distinct shuffle, both map-side combined; no window,
    * no range join, nothing per-day-quadratic. (The streaming analogue
    * at unbounded scale swaps the exact distinct for T21's HLL union
    * per window — the documented trade.)
    */
  /** Width-w rolling distinct actives over a (user_id, day)-DISTINCT
    * frame — q33's explode-to-window-ends shape parameterized by window
    * width: each activity row contributes to the w window-ends it is
    * visible from (a map-side w× multiplier, no self-join), then one
    * two-phase distinct per window_end. Output (day, dau, <outCol>) for
    * every OBSERVED day. Cost scales linearly in w — the documented
    * trade vs the T29 per-day-sketch store, whose range-union read is
    * O(w × sketch bytes) per window regardless of data volume (q33b
    * checks that twin's bound in-plan). */
  def rollingActive(ud: DataFrame, w: Int, outCol: String): DataFrame = {
    val dau = ud.groupBy(col("day"))
      .agg(count(lit(1)).as("dau")) // rows already (user, day)-distinct
    val roll = ud
      .select(col("user_id"),
        explode(expr(s"sequence(day, day + ${w - 1})")).as("window_end"))
      .distinct()
      .groupBy(col("window_end")).agg(count(lit(1)).as(outCol))
    dau.join(roll, dau("day") === roll("window_end"))
      .select(col("day"), col("dau"), col(outCol))
  }

  /** The (user_id, day)-distinct activity frame both rolling queries
    * start from. */
  private def userDays(spark: SparkSession, dir: String): DataFrame = {
    val dayMs = 86400000L
    Tables.events(spark, dir)
      .select(col("user_id"), expr(s"ts_ms DIV $dayMs").as("day"))
      .distinct()
  }

  val q33RollingActive: Q = (spark, dir) =>
    rollingActive(userDays(spark, dir), 7, "wau").orderBy(col("day"))

  /** Q33b — the PARAMETERIZED rolling window at monthly width (w = 28)
    * plus the scale-path twin checked in-plan: per-day HLL sketches
    * union over each trailing-28 range (the batch analogue of T29's
    * [[graft.streaming.Streams.readRangeDistinct]] — same lgK, same
    * union rule) and the estimate must land within 5% of the exact
    * count (the q9c boolean pattern: each engine runs ITS OWN sketch,
    * the bound holds in both, the booleans hash-match). At unbounded
    * scale the exact half is the one you retire: the sketch path reads
    * w sketch rows per window instead of re-shuffling w days of
    * activity, and this query is the standing proof the swap stays
    * inside its error budget. */
  val q33bRollingActive28: Q = (spark, dir) => {
    val ud = userDays(spark, dir).localCheckpoint() // feeds both halves
    val exact = rollingActive(ud, 28, "rolling_28")
    val daySk = ud.groupBy(col("day"))
      .agg(expr("hll_sketch_agg(CAST(user_id AS STRING), 12)").as("sk"))
    val approx = daySk
      .select(explode(expr("sequence(day, day + 27)")).as("window_end"),
        col("sk"))
      .groupBy(col("window_end"))
      .agg(expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)")
        .as("approx"))
    exact.join(approx, exact("day") === approx("window_end"))
      .select(col("day"), col("dau"), col("rolling_28"),
        (abs(col("approx") - col("rolling_28")) * 100
          <= col("rolling_28") * 5).as("within_5pct"))
      .orderBy(col("day"))
  }
  val q33bSql: String =
    """WITH ud AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
      |           FROM events),
      |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
      |w AS (SELECT DISTINCT user_id, day + u AS window_end
      |      FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 27)) AS u)),
      |r AS (SELECT window_end, CAST(count(*) AS BIGINT) AS rolling_28,
      |       approx_count_distinct(user_id) AS approx
      |      FROM w GROUP BY 1)
      |SELECT day, dau, rolling_28,
      | abs(approx - rolling_28) * 100 <= rolling_28 * 5 AS within_5pct
      |FROM dau JOIN r ON day = window_end
      |ORDER BY day""".stripMargin
  // Q36 — per-user anomaly detection via exact integer moment arithmetic.
  /** Q36 — per-entity outlier flagging (|z| > 3 against the user's own
    * value distribution), the ops/fraud anomaly workload — computed
    * WITHOUT a single floating-point operation: values quantize to
    * cents (the fixture's true precision), per-user (n, Σv, Σv²) are
    * exact BIGINT map-side-combined sums, and the z-test clears its
    * denominators — `z² > 9` becomes `(v·n − Σv)² > 9·(n·Σv² − (Σv)²)`
    * — so the flag is partition-invariant and engine-portable
    * (population variance; single-point degenerate users flag nothing
    * since both sides are 0). One groupBy(user) plus one user-keyed
    * join back — the x4d fingerprint discipline, never a per-user
    * window. BIGINT headroom: the binding term is the RHS
    * `9·(n·Σv² − (Σv)²) = 9·n²·σ²` — safe while a user's n·max_cents
    * ≤ 10⁹ ([[q36Headroom]]: then s² ≤ 10¹⁸, n·q ≤ 10¹⁸,
    * 9·(n·q − s²) ≤ 9·10¹⁸ and the LHS square ≤ 4·10¹⁸, all inside
    * BIGINT). Past that Spark would wrap silently while DuckDB throws —
    * an engine ASYMMETRY, not just a wrong answer — so [[momentsBy]]
    * ENFORCES the bound in-plan and THROWS (the hierarchyPaths
    * discipline: loud, never silently wrong); the unbounded-history fix
    * is the per-day windowed baseline [[q36bWindowedOutliers]], which
    * is also the semantically right baseline at unbounded history.
    */
  val q36Outliers: Q = (spark, dir) =>
    outliersByKey(Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v_c")))

  /** The cleared-denominator integer z-test (z² > 9 with population
    * variance) — the ONE predicate shared by batch q36 and the T31
    * streaming flagger, so the twins cannot drift. */
  val outlierTest: String =
    "(v_c * n - s) * (v_c * n - s) > 9 * (n * q - s * s)"

  /** BIGINT headroom bound for the cleared-denominator z-test — see the
    * q36 scaladoc for the derivation. */
  val q36Headroom = 1000000000L

  /** Per-user exact integer moments (n, Σv, Σv², max|v|) — the
    * sufficient statistics of the z-test plus the overflow witness;
    * additively mergeable (n/s/q by sum, m by max), which is what makes
    * the T31 streaming maintenance exact. */
  def momentsByKey(ev: DataFrame): DataFrame = momentsBy(ev, Seq("user_id"))

  /** [[momentsByKey]] grouped by arbitrary key columns — the q36b
    * windowed baseline groups by (user_id, day), bounding n per key. */
  def momentsBy(ev: DataFrame, keys: Seq[String]): DataFrame =
    guardMoments(ev.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("v_c")).as("s"),
        sum(col("v_c") * col("v_c")).as("q"),
        max(abs(col("v_c"))).as("m")))

  /** The in-plan overflow guard: THROW when any key's n·m approaches
    * the BIGINT headroom, instead of letting the z-test wrap silently.
    * The compare runs in DOUBLE — exact below 2^53 and immune to the
    * very wrap it guards against (n·m as BIGINT could itself wrap past
    * the bound). Applied by [[momentsBy]] (batch) and re-applied by the
    * T31 store on its MERGED state, so an unbounded stream walks into a
    * loud failure at the merge that crosses the bound, never a wrong
    * flag. */
  def guardMoments(moments: DataFrame): DataFrame =
    // Guards.assertFilter's null-arm matters here: a NULL m would make a
    // bare assert_true(NULL) silently PASS the guard (fail-open); the
    // shared helper fails it closed
    moments.filter(graft.functions.Guards.assertFilter(
      col("n").cast("double") * col("m").cast("double")
        <= lit(q36Headroom.toDouble),
      concat(lit("q36 overflow guard: a key's n*max|v_c| exceeds the " +
          s"BIGINT headroom ($q36Headroom) — window the baseline " +
          "(q36b) or rescale units; n="), col("n"), lit(" m="), col("m"))))

  /** The WHOLE serving tail — join, predicate, projection, ordering —
    * shared by batch q36 and T31's [[graft.streaming.Streams
    * .flagOutliers]], so the twins cannot drift anywhere, not just at
    * the predicate. `moments` carries (user_id, n, s, q, m). */
  def flagAgainst(ev: DataFrame, moments: DataFrame): DataFrame =
    flagAgainstBy(ev, moments, Seq("user_id"))

  /** [[flagAgainst]] on arbitrary keys; `extraCols` ride into the
    * output between user_id and v_c (q36b emits its window day). */
  def flagAgainstBy(ev: DataFrame, moments: DataFrame, keys: Seq[String],
      extraCols: Seq[String] = Nil): DataFrame =
    ev.join(moments, keys)
      .filter(expr(outlierTest))
      .select((Seq("event_id", "user_id") ++ extraCols :+ "v_c").map(col): _*)
      .orderBy(col("event_id"))

  /** Integer z-test core of [[q36Outliers]]: input (event_id, user_id,
    * v_c) with v_c already quantized to exact integer units. */
  def outliersByKey(ev: DataFrame): DataFrame =
    flagAgainst(ev, momentsByKey(ev))

  /** Q36b — the WINDOWED anomaly baseline (per-user-per-WEEK moments):
    * an event is flagged against its user's SAME-WEEK distribution, the
    * semantically right baseline at unbounded history (last month's
    * regime shift should not dilute this week's z-test) and the
    * overflow fix the q36 scaladoc prescribes — n per key is bounded by
    * one week's events, so n·max|v_c| stays far inside [[q36Headroom]]
    * for any stream lifetime. Window width is a calibration choice: a
    * |z| > 3 flag needs n ≥ 11 in the window (max attainable z² is
    * n−1+…), and the fixture runs ~2.5 events/user/day vs ~13/user/week
    * — daily windows would never flag here; weekly windows keep the
    * operator exercised at every SF. Identical shape to q36: one
    * groupBy + one keyed join-back, both now keyed (user, wk) — still
    * never a per-user window; the week column prunes both sides of the
    * join at scale (partition-by-time storage joins co-located). */
  val q36bWindowedOutliers: Q = (spark, dir) => {
    val weekMs = 604800000L
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr(s"ts_ms DIV $weekMs").as("wk"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v_c"))
    flagAgainstBy(ev, momentsBy(ev, Seq("user_id", "wk")),
      Seq("user_id", "wk"), Seq("wk"))
  }
  val q36bSql: String =
    """WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) // 604800000 AS wk,
      |        CAST(round(value * 100) AS BIGINT) AS v_c FROM events),
      |st AS (SELECT user_id, wk, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(v_c) AS BIGINT) AS s,
      |        CAST(sum(v_c * v_c) AS BIGINT) AS q
      |       FROM ev GROUP BY 1, 2)
      |SELECT event_id, ev.user_id, ev.wk, v_c
      |FROM ev JOIN st ON ev.user_id = st.user_id AND ev.wk = st.wk
      |WHERE (v_c * n - s) * (v_c * n - s) > 9 * (n * q - s * s)
      |ORDER BY event_id""".stripMargin
  val q36Sql: String =
    """WITH ev AS (SELECT event_id, user_id,
      |        CAST(round(value * 100) AS BIGINT) AS v_c FROM events),
      |st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(v_c) AS BIGINT) AS s,
      |        CAST(sum(v_c * v_c) AS BIGINT) AS q
      |       FROM ev GROUP BY 1)
      |SELECT event_id, ev.user_id, v_c
      |FROM ev JOIN st ON ev.user_id = st.user_id
      |WHERE (v_c * n - s) * (v_c * n - s) > 9 * (n * q - s * s)
      |ORDER BY event_id""".stripMargin

  val q33Sql: String =
    """WITH ud AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
      |           FROM events),
      |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
      |w7 AS (SELECT DISTINCT user_id, day + u AS window_end
      |       FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS u)),
      |wau AS (SELECT window_end, CAST(count(*) AS BIGINT) AS wau
      |        FROM w7 GROUP BY 1)
      |SELECT day, dau, wau FROM dau JOIN wau ON day = window_end
      |ORDER BY day""".stripMargin
  val q26Sql: String =
    s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
       |f AS (SELECT user_id, min(ts_ms) // $weekMs AS cohort_wk
       |      FROM e GROUP BY 1)
       |SELECT cohort_wk, ts_ms // $weekMs - cohort_wk AS week_offset,
       | CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
       |FROM e JOIN f USING (user_id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // Q27 — star-schema join (the TPC-H Q5 shape): two fact tables chained
  // on their keys, two dimensions broadcast. The plan shape that matters
  // at 100 TB: lineitem⋈orders and orders⋈customer shuffle on their join
  // keys (AQE may broadcast whichever side's stats allow), nation/region
  // broadcast unconditionally (bounded dims), and the final groupBy is
  // low-cardinality with map-side combine — so the revenue rollup costs
  // two fact shuffles regardless of data volume.
  val q27StarJoin: Q = (spark, dir) => {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("disc_price"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val r = Tables.region(spark, dir).select(col("r_regionkey"), col("r_name"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("disc_price")), 2).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }
  val q27Sql: String =
    """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_items,
      | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem
      | JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN nation ON c_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // Q28 — column profiling (the Deequ-style data-quality summary): one
  // pass over the table computing per-column null count, exact distinct
  // count, and min/max, emitted long-format. Multiple DISTINCT aggregates
  // make Catalyst plan an Expand (input ×|columns| before the partial
  // agg) — the exact-profile cost; at 100 TB swap countDistinct for
  // approx_count_distinct and the Expand disappears (q9b shows that
  // sketch path). min/max/null-count are plain partial aggregates.
  val profileCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  val q28Profile: Q = (spark, dir) => {
    val li = Tables.lineitem(spark, dir)
    val aggs = profileCols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
      countDistinct(col(c)).as(s"${c}_dist"),
      min(col(c)).cast("double").as(s"${c}_min"),
      max(col(c)).cast("double").as(s"${c}_max")))
    li.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(profileCols.map(c => struct(
        lit(c).as("col_name"),
        col(s"${c}_nulls").as("n_nulls"),
        col(s"${c}_dist").as("n_distinct"),
        col(s"${c}_min").as("min_v"),
        col(s"${c}_max").as("max_v"))): _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }
  val q28Sql: String = profileCols.map(c =>
    s"""SELECT '$c' AS col_name,
       | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       | CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
       | CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v
       |FROM lineitem""".stripMargin)
    .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  val queries: Map[String, Q] = Map(
    "q28_profile" -> q28Profile,
    "q27_star_join" -> q27StarJoin,
    "q25_funnel" -> q25Funnel,
    "q26_cohort" -> q26Cohort,
    "q24_salted_join" -> q24SaltedJoin,
    "q23_zorder" -> q23Zorder,
    "q8b_percentile" -> q8bPercentile,
    "q8c_stats" -> q8cStats,
    "q8d_stringagg" -> q8dStringAgg,
    "q_unpivot" -> qUnpivot,
    "q16b_conditional" -> q16bConditional,
    "q17c_date_arith" -> q17cDateArith,
    "q10c_grouping_sets" -> q10cGroupingSets,
    "q_pivot" -> qPivot,
    "q_sessionize" -> qSessionize,
    "q22_subquery" -> q22Subquery,
    "q1_agg" -> q1Agg,
    "q2_join_inner" -> q2JoinInner,
    "q3_join_broadcast" -> q3JoinBroadcast,
    "q4_join_left" -> q4JoinLeft,
    "q4b_join_full" -> q4bJoinFull,
    "q5_semi_anti" -> q5SemiAnti,
    "q6_range_join" -> q6RangeJoin,
    "q7_asof_join" -> q7AsofJoin,
    "q7b_asof_custom" -> q7bAsofCustom,
    "q8_agg_stats" -> q8AggStats,
    "q9_distinct" -> q9Distinct,
    "q9b_approx_distinct" -> q9bApproxDistinct,
    "q8e_approx_pct_bound" -> q8eApproxPercentileBound,
    "q8f_quantile_rank_bound" -> q8fQuantileRankBound,
    "q8g_qdigest_bound" -> q8gQdigestBound,
    "q33_rolling_active" -> q33RollingActive,
    "q33b_rolling_active_28" -> q33bRollingActive28,
    "q36_outliers" -> q36Outliers,
    "q36b_windowed_outliers" -> q36bWindowedOutliers,
    "q9c_approx_bound" -> q9cApproxBound,
    "q9d_hll_union_bound" -> q9dHllUnionBound,
    "q10_rollup" -> q10Rollup,
    "q10b_cube" -> q10bCube,
    "q11_window_rank" -> q11WindowRank,
    "q11b_window_dist" -> q11bWindowDist,
    "q12_window_lag" -> q12WindowLag,
    "q12b_window_pos" -> q12bWindowPos,
    "q13_window_frame" -> q13WindowFrame,
    "q13b_range_frame" -> q13bRangeFrame,
    "q14_topk" -> q14TopK,
    "q15_setops" -> q15SetOps,
    "q16_string" -> q16String,
    "q17_datetime" -> q17DateTime,
    "q17b_extract" -> q17bExtract,
    "q18_math" -> q18Math,
    "q19_array" -> q19Array,
    "q20_json" -> q20Json,
    "q21_map" -> q21Map)

  val oracle: Map[String, String] = Map(
    "q28_profile" -> q28Sql,
    "q27_star_join" -> q27Sql,
    "q25_funnel" -> q25Sql,
    "q26_cohort" -> q26Sql,
    "q24_salted_join" -> q24Sql,
    "q23_zorder" -> q23Sql,
    "q8e_approx_pct_bound" -> q8eSql,
    "q8f_quantile_rank_bound" -> q8fSql,
    "q8g_qdigest_bound" -> q8gSql,
    "q33_rolling_active" -> q33Sql,
    "q33b_rolling_active_28" -> q33bSql,
    "q36_outliers" -> q36Sql,
    "q36b_windowed_outliers" -> q36bSql,
    "q8b_percentile" -> q8bSql,
    "q8c_stats" -> q8cSql,
    "q8d_stringagg" -> q8dSql,
    "q_unpivot" -> qUnpivotSql,
    "q16b_conditional" -> q16bSql,
    "q17c_date_arith" -> q17cSql,
    "q10c_grouping_sets" -> q10cSql,
    "q_pivot" -> qPivotSql,
    "q_sessionize" -> qSessionizeSql,
    "q22_subquery" -> q22Sql,
    "q1_agg" -> q1Sql,
    "q2_join_inner" -> q2Sql,
    "q3_join_broadcast" -> q3Sql,
    "q4_join_left" -> q4Sql,
    "q4b_join_full" -> q4bSql,
    "q5_semi_anti" -> q5Sql,
    "q6_range_join" -> q6Sql,
    "q7_asof_join" -> q7Sql,
    "q7b_asof_custom" -> q7Sql, // same contract, custom physical operator
    "q8_agg_stats" -> q8Sql,
    "q9_distinct" -> q9Sql,
    "q9c_approx_bound" -> q9cSql,
    "q9d_hll_union_bound" -> q9dSql,
    "q10_rollup" -> q10Sql,
    "q10b_cube" -> q10bSql,
    "q11_window_rank" -> q11Sql,
    "q11b_window_dist" -> q11bSql,
    "q12_window_lag" -> q12Sql,
    "q12b_window_pos" -> q12bSql,
    "q13_window_frame" -> q13Sql,
    "q13b_range_frame" -> q13bSql,
    "q14_topk" -> q14Sql,
    "q15_setops" -> q15Sql,
    "q16_string" -> q16Sql,
    "q17_datetime" -> q17Sql,
    "q17b_extract" -> q17bSql,
    "q18_math" -> q18Sql,
    "q19_array" -> q19Sql,
    "q20_json" -> q20Sql,
    "q21_map" -> q21Sql)
}
