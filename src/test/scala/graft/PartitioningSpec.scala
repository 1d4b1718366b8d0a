package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Partitioning

/** Each partitioning technique must PROVE its claimed plan property. */
class PartitioningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted join returns identical results to the plain join") {
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("event_id"), col("user_id"), col("value"))
    val dim = Tables.events(spark, TestSpark.sf)
      .select(col("user_id")).distinct()
      .withColumn("user_tag", concat(lit("u"), col("user_id")))
    val plain = ev.join(dim, Seq("user_id"))
      .select(col("event_id"), col("user_tag"))
      .orderBy("event_id").collect()
    val salted = Partitioning.saltedEquiJoin(ev, dim, "user_id", salts = 4)
      .select(col("event_id"), col("user_tag"))
      .orderBy("event_id").collect()
    assert(salted.toSeq === plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("co-bucketed join plans with no shuffle Exchange") {
    // unique names: a crashed prior run leaves the managed location behind
    val sfx = System.nanoTime()
    val (tc, to) = (s"b_cust_$sfx", s"b_ord_$sfx")
    val c = Tables.customer(spark, TestSpark.sf)
    val o = Tables.orders(spark, TestSpark.sf).withColumnRenamed("o_custkey", "c_custkey")
    Partitioning.writeBucketed(c, tc, "c_custkey", buckets = 4)
    Partitioning.writeBucketed(o, to, "c_custkey", buckets = 4)
    // disable auto-broadcast: at fixture size the planner would broadcast
    // (with a BroadcastExchange) and skip bucketed scans entirely; the
    // property under test is the co-located shuffle-free sort-merge join
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Partitioning.bucketedJoin(spark, tc, to, "c_custkey")
      joined.collect() // finalize AQE plan
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p)
      assert(p.contains("SortMergeJoin"), p)
      assert(joined.count() === Tables.orders(spark, TestSpark.sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql(s"DROP TABLE IF EXISTS $tc")
      spark.sql(s"DROP TABLE IF EXISTS $to")
    }
  }

  test("day-partitioned layout: single-day scan prunes to one of 30 partitions") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // collect() does not descend into AQE wrapper nodes (AdaptiveSparkPlan
    // holds the final plan out-of-band; QueryStage wraps each stage)
    def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case s: QueryStageExec => fileScans(s.plan)
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    val q = Partitioning.q29PartitionPrune(spark, TestSpark.sf)
    assert(q.count() > 0)
    q.collect()
    val scan = fileScans(q.queryExecution.executedPlan).head
    // static pruning: the day predicate is a PartitionFilter (directory
    // listing), not a data Filter over a full scan
    assert(scan.partitionFilters.nonEmpty, scan.toString)
    val filesRead = scan.metrics("numFiles").value
    val totalFiles = {
      val root = new java.io.File(
        Partitioning.eventsByDay(spark, TestSpark.sf)
          .inputFiles.head.stripPrefix("file:"))
        .getParentFile.getParentFile
      root.listFiles.count(_.getName.startsWith("day="))
    }
    assert(totalFiles === 30, s"expected 30 day dirs, got $totalFiles")
    assert(filesRead === 1, s"pruned scan read $filesRead files")

    // dynamic partition pruning: when the day set comes from a filtered
    // dimension JOIN instead of a literal, the scan still prunes — via a
    // runtime DPP subquery on the partition key. The dim side must be a
    // real datasource scan with a surviving selective predicate (a filter
    // over a local relation constant-folds away and the DPP rule sees
    // nothing to prune with).
    val dim = Tables.events(spark, TestSpark.sf)
      .filter(col("event_type") === "purchase" && dayofmonth(col("ts")) <= 2)
      .select(to_date(col("ts")).as("day"))
    val dpp = Partitioning.eventsByDay(spark, TestSpark.sf)
      .join(dim, "day")
      .groupBy("day").count()
    dpp.collect()
    assert(fileScans(dpp.queryExecution.executedPlan)
      .exists(_.partitionFilters.exists(_.toString.contains("dynamicpruning"))),
      dpp.queryExecution.executedPlan.toString)
  }

  test("runtime bloom-filter pruning: a selective dim filter reaches the fact scan as a bloom probe") {
    // the third pruning lever after static partition pruning and DPP: when
    // neither side broadcasts, Spark can build a bloom filter from the
    // filtered (small) join side and inject it into the big side's scan,
    // so most fact rows die at the scan instead of traveling to the
    // shuffle — at 100 TB this is the difference between shuffling the
    // table and shuffling the matching fraction
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables.lineitem(spark, TestSpark.sf)
      val ord = Tables.orders(spark, TestSpark.sf)
        .filter(col("o_orderpriority") === "1-URGENT")
      val q = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val withBloom = q.collect()
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("bloom_filter_agg"), p.take(4000))
      // and the runtime filter must not change results
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n")).collect()
      assert(withBloom.toSeq === without.toSeq)
      assert(withBloom.nonEmpty && withBloom.head.getLong(1) > 0)
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("range partitioning by time yields non-overlapping contiguous spans") {
    val ev = Tables.events(spark, TestSpark.sf)
    val ranged = Partitioning.rangePartitionByTime(ev, "ts_ms", 4)
    import spark.implicits._
    val spans = ranged
      .mapPartitions(it => {
        val tss = it.map(_.getAs[Long]("ts_ms")).toSeq
        if (tss.isEmpty) Iterator.empty
        else Iterator.single((tss.min, tss.max))
      })(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
      .collect().sortBy(_._1)
    assert(spans.length > 1)
    spans.sliding(2).foreach {
      case Array((_, maxA), (minB, _)) => assert(maxA <= minB)
      case _ =>
    }
  }

  test("blocked all-pairs emits every unordered pair exactly once, no corpus broadcast") {
    val n = 137 // deliberately not a multiple of the block count
    val df = spark.range(n).select(col("id").as("vec_id"),
      (col("id") * 3 % 11).as("payload"))
    for (b <- Seq(2, 4, 7)) {
      val pairs = Partitioning.blockedAllPairs(df, "vec_id", b)
        .select(
          least(col("a.vec_id"), col("b.vec_id")).as("lo"),
          greatest(col("a.vec_id"), col("b.vec_id")).as("hi"))
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = (for {
        i <- 0L until n; j <- (i + 1) until n
      } yield (i, j)).sorted.toSeq
      assert(got === want, s"block count $b")
    }
    // scale property: with auto-broadcast off (as at real scale, where no
    // side fits), the pair join shuffle-partitions BY BLOCK PAIR — a
    // hash-partitioned equi-join on (i, j), never a nested-loop and never
    // a broadcast of a corpus side
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val e = Tables.embeddings(spark, TestSpark.sf)
        .select(col("vec_id"), col("embedding"))
      val q = Partitioning.blockedAllPairs(e, "vec_id", 4)
      q.collect() // finalize AQE plan
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      // the only broadcasts are the int-only block-pair index (a few rows);
      // the corpus rows travel exclusively through (i,j) hash partitions
      assert(p.contains("SortMergeJoin [i"), p)
      assert(p.contains("hashpartitioning(i"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("blocked all-pairs WITHIN groups emits exactly the same-group pairs, once each") {
    val n = 97
    val df = spark.range(n).select(col("id").as("vec_id"),
      (col("id") % 5).as("label"))
    for (b <- Seq(1, 3, 6)) {
      val pairs = Partitioning.blockedAllPairsWithin(df, Seq("label"), "vec_id", b)
        .select(
          least(col("a.vec_id"), col("b.vec_id")).as("lo"),
          greatest(col("a.vec_id"), col("b.vec_id")).as("hi"))
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = (for {
        i <- 0L until n; j <- (i + 1) until n; if i % 5 == j % 5
      } yield (i, j)).sorted.toSeq
      assert(got === want, s"block count $b")
    }
    // scale property: the pair join is hash-partitioned by (group, block
    // pair) — a degenerate giant group still spreads over block-pair tasks
    // instead of landing on one group-keyed reducer
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val e = Tables.embeddings(spark, TestSpark.sf)
        .select(col("vec_id"), col("label"), col("embedding"))
      val q = Partitioning.blockedAllPairsWithin(e, Seq("label"), "vec_id", 4)
      q.collect()
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(p.contains("hashpartitioning(__g_label"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("ordinalIds equals the single-window row_number and is partition-count invariant") {
    val vocab = Tables.documents(spark, TestSpark.sf)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    def sortCols = Seq(col("n").desc, col("token").asc)
    val byWindow = vocab.withColumn("id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(sortCols: _*)).cast("long"))
      .select("token", "id").orderBy("id").collect().toSeq
    val a = Partitioning.ordinalIds(vocab, sortCols, "id", numParts = 3)
      .select("token", "id").orderBy("id").collect().toSeq
    val b = Partitioning.ordinalIds(vocab, sortCols, "id", numParts = 8)
      .select("token", "id").orderBy("id").collect().toSeq
    assert(a.nonEmpty)
    assert(a === byWindow) // ids depend only on the total order…
    assert(b === byWindow) // …not on where the range sampler cut partitions
  }

  test("zValue interleaves bits; z-buckets bound the span of BOTH dimensions") {
    val df = spark.range(0, 1024).select(
      pmod(col("id"), lit(32L)).as("x"), expr("id DIV 32").as("y"))
    // spot-check the interleave: x=3 → bits 0,2; y=5 → bits 1,5 ⇒ 1+4+2+32
    val z35 = df.filter(col("x") === 3 && col("y") === 5)
      .select(Partitioning.zValue(col("x"), col("y"))).head.getLong(0)
    assert(z35 === 39L)
    // bucket = z DIV 64 leaves 3 free low bits per dimension ⇒ span ≤ 7 in
    // x AND y simultaneously (a single-column sort bounds only one)
    val spans = df
      .withColumn("z", Partitioning.zValue(col("x"), col("y")))
      .withColumn("b", expr("z DIV 64"))
      .groupBy(col("b"))
      .agg((max(col("x")) - min(col("x"))).as("xs"),
        (max(col("y")) - min(col("y"))).as("ys"))
      .collect()
    assert(spans.nonEmpty)
    assert(spans.forall(r => r.getLong(1) <= 7 && r.getLong(2) <= 7))
  }
}
