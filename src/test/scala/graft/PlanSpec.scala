package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Physical-plan assertions (SURVEY.md §4.2): the declarative queries must
  * actually get the 100 TB-relevant plans — parquet pushdown/pruning,
  * broadcast joins on dims, TakeOrderedAndProject for top-k, whole-stage
  * codegen — plus the driver smoke contract.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf).queryExecution.executedPlan.toString

  test("driver smoke: entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query (contract integrity)") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("filter + projection push down to the parquet scan") {
    val df = Tables.lineitem(spark, TestSpark.sf)
      .filter(col("l_orderkey") < 100)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,100)]"), scan)
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), scan)
  }

  test("dimension joins broadcast (q3), not shuffle") {
    val p = plan("q3_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("global top-k plans as TakeOrderedAndProject, never a global sort") {
    val p = plan("q14_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1 aggregation runs inside whole-stage codegen with partial aggregation") {
    // AQE only finalizes codegen spans after execution — run, then inspect.
    val df = SparkEntry.queries("q1_agg")(spark, TestSpark.sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // AQE's final-plan string marks whole-stage codegen spans as "*(n)"
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p)
    assert(p.contains("HashAggregate"), p)
    // partial + final pair ⇒ map-side combine before the shuffle
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("x7h's shared per-(doc,bigram) pre-agg executes once (runtime ReusedExchange)") {
    // The static plan shows the perDoc subtree three times (target counts,
    // pool counts, final probe); the single repartition(doc_id) makes the
    // subtrees identical, so AQE must collapse them. Only the finalized
    // post-execution plan shows this — run, then inspect.
    val df = SparkEntry.queries("x7h_dsir_select")(spark, TestSpark.sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("no corpus-proportional broadcast: pinned joins never broadcast an explode stream") {
    // Regression guard for the r6 estimate-collapse audit (PLANS.md):
    // Catalyst's post-explode size estimates collapse, and without the
    // shuffle_hash pins it broadcast the raw gram/segment/pool streams.
    // Executed-plan check: no BroadcastExchange subtree may contain a
    // Generate (explode) that is NOT below an aggregate — aggregated
    // build sides (vocab, tf slice, per-doc arrays) remain legitimate.
    for (name <- Seq("x1b_line_dedup", "x1c_span_dedup", "x1d_span_apply",
        "x7h_dsir_select")) {
      val df = SparkEntry.queries(name)(spark, TestSpark.sf)
      df.collect()
      val all = df.queryExecution.executedPlan.toString.linesIterator.toVector
      val cut = all.indexWhere(_.contains("Initial Plan"))
      val lines = if (cut > 0) all.take(cut) else all
      lines.zipWithIndex.filter(_._1.contains("BroadcastExchange")).foreach {
        case (l, i) =>
          val base = l.indexOf("BroadcastExchange")
          var j = i + 1
          var aggSeen = false
          while (j < lines.size && {
            val pos = lines(j).indexWhere(_.isLetter); pos > base || pos < 0
          }) {
            val line = lines(j)
            if (line.contains("HashAggregate") || line.contains("ObjectHashAggregate"))
              aggSeen = true
            assert(!(line.contains("Generate ") && !aggSeen),
              s"$name broadcasts a raw explode stream:\n${lines.slice(i, j + 1).mkString("\n")}")
            j += 1
          }
      }
    }
  }

  test("x3k per-iteration step keeps x3i's operator profile (bounded broadcast + two aggs)") {
    // the convergence loop is driver control flow only — each distributed
    // step must have exactly the single-step x3i shape: one bounded k-row
    // broadcast join, one Generate (posexplode), and no extra shuffles
    import graft.operators.Vectors
    import spark.implicits._
    def profile(df: org.apache.spark.sql.DataFrame): Map[String, Int] = {
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val all = p.linesIterator.toVector
      val cut = all.indexWhere(_.contains("Initial Plan"))
      val fin = (if (cut > 0) all.take(cut) else all).mkString("\n")
      // executed-plan strings print shuffles as "Exchange hashpartitioning(…)"
      // (never "ShuffleExchange" — that key would count 0 and make the
      // no-extra-shuffles half of this assertion vacuous)
      Seq("BroadcastNestedLoopJoin", "CartesianProduct", "SortMergeJoin",
        "ShuffledHashJoin", "Generate ", "Exchange [a-z]+partitioning")
        .map(op => op -> op.r.findAllIn(fin).size).toMap
    }
    // profile the step combinator, not the registered query: the query
    // appends a presentation orderBy whose rangepartitioning exchange is
    // not part of the per-iteration step shape being pinned here
    val x3i = profile(Vectors.kmeansRefine(
      Tables.embeddings(spark, TestSpark.sf), Vectors.kmeansK))
    val e = Tables.embeddings(spark, TestSpark.sf)
    val q = Vectors.quantizeEmbeddings(e)
    val cents = q.filter(col("vec_id") < Vectors.kmeansK)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
      .toDF("c_id", "cq")
    val step = profile(Vectors.kmeansStepQ(q, cents))
    assert(step === x3i, s"step $step vs x3i $x3i")
    assert(step("CartesianProduct") === 0 && step("SortMergeJoin") === 0)
    assert(step("BroadcastNestedLoopJoin") === 1)
  }

  test("range join keeps the user_id equi-key (sort-merge, not cartesian)") {
    val p = plan("q6_range_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") || p.contains("Join"), p)
  }

  test("temporal dimension join keeps the custkey equi-key: never a cartesian or nested-loop over facts") {
    val p = plan("cdc_scd2_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the interval containment rides as a join residual on the equi-key
    // join, so SOME hash/merge join on the key must be present
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), p)
  }

  test("as-of join window rewrite equals a naive per-group scan") {
    import org.apache.spark.sql.functions._
    val e = Tables.events(spark, TestSpark.sf)
      .select("event_id", "user_id", "ts_ms", "event_type").collect()
    val errorsByUser = e.filter(_.getString(3) == "error")
      .groupBy(_.getLong(1)).map { case (u, rs) =>
        u -> rs.map(r => (r.getLong(2), r.getLong(0))).sortBy(x => (x._1, x._2))
      }
    val expected = e.filter(_.getString(3) == "purchase").map { p =>
      val candidates = errorsByUser.getOrElse(p.getLong(1), Array.empty[(Long, Long)])
        .filter(_._1 <= p.getLong(2))
      val best = if (candidates.isEmpty) None else Some(candidates.last)
      (p.getLong(0), best.map(_._2))
    }.toMap
    val got = SparkEntry.queries("q7_asof_join")(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got === expected)
  }

  test("similarity search broadcasts the query side") {
    val p = plan("x3_cosine_topk")
    assert(p.contains("Broadcast"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("skew discipline: no hot-key Window in dedup, fingerprint, band-cap, or cluster-size plans") {
    // each of these previously counted or ranked over a partition keyed by
    // the potentially-degenerate value itself (dup text, fingerprint, LSH
    // bucket, cluster id); all must stay groupBy+join shaped
    for (q <- Seq("x1_dedup_exact", "x4d_fingerprint", "x2_minhash_lsh",
        "x2d_simhash_neardup", "x7_neardup_clusters")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q plan contains a Window:\n$p")
    }
  }

  test("per-document map queries have no shuffle at all") {
    for (q <- Seq("x8_pii_scrub", "x4_text_quality", "x4b_langid", "x4c_token_count")) {
      val p = plan(q)
      // the only Exchange allowed is the final single-partition ordering
      // for deterministic output (rangepartitioning for orderBy)
      val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(p).toSeq
      assert(exchanges.forall(_.contains("rangepartitioning")),
        s"$q has a non-sort shuffle: $exchanges\n$p")
    }
  }

  test("decontamination broadcasts the benchmark side, never shuffles the corpus for the join") {
    val p = plan("x7e_decontamination")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x3l incremental-index search keeps the IVF-PQ probe shape: broadcast routing, no cartesian, no index-side sort join") {
    // the served index (batch or incremental) joins the broadcast probe
    // explode on the cluster key — a corpus-side SortMergeJoin or a
    // CartesianProduct here would mean routing degraded to a full scan
    val p = plan("x3l_incr_index")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x7m containment apply probes the corpus by broadcast only: anti-join on the contained set and the cluster map both build-right") {
    // the corpus side must be scan + hash-probe (contained-id set and
    // cluster map are near-dup-bounded); a SortMergeJoin in the FINAL
    // consumer would mean the corpus shuffles for a bounded-side join
    val df = SparkEntry.queries("x7m_containment_apply")(spark, TestSpark.sf)
    df.collect() // finalize AQE — the initial plan shows pre-broadcast SMJs
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") &&
      p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
