package graft

import java.nio.file.Files

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LakeFormat, LakeTx}

/** The lake change feed as a REAL Spark streaming source
  * ([[graft.sources.GraftLakeProvider]] / [[graft.sources.GraftLakeTxProvider]]):
  * `readStream.format("graft-lake")` with offsets managed by the Spark
  * CHECKPOINT — recovery, rate limiting, startingVersion, retention and
  * schema-evolution contracts, and the multi-table source's
  * transaction-aligned batch boundaries. The oracle-checked
  * `lake_stream_index` query gates the hash-exact serve; these specs
  * pin the engine-level properties it cannot witness.
  */
class GraftLakeSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val p = Files.createTempDirectory(tag)
    p.toFile.deleteOnExit()
    p.toString
  }

  private def rows(xs: (Long, Long, Boolean, String)*) =
    xs.toDF("id", "lsn", "live", "v")

  private def causeChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")

  /** Collected feed row: (id, v, _change_type, _commit_version, batchId). */
  private type Got = (Long, String, String, Long, Long)

  /** Run a graft-lake stream to exhaustion, collecting every row with
    * its foreachBatch batchId. `once` = Trigger.Once (one trigger, then
    * the query terminates by itself — the deterministic "kill": the
    * engine's offset log is the only state the next start sees). */
  private def drain(root: String, ck: String,
      buf: collection.mutable.Buffer[Got],
      options: Map[String, String] = Map.empty,
      once: Boolean = false): Unit = {
    var r = spark.readStream.format("graft-lake")
    options.foreach { case (k, v) => r = r.option(k, v) }
    val w = r.load(root).writeStream.option("checkpointLocation", ck)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        val got = b.collect().map(x => (x.getLong(0), x.getString(1),
          x.getString(2), x.getLong(3), id))
        buf.synchronized { buf ++= got }
        ()
      }
    if (once) {
      val q = w.trigger(Trigger.Once()).start(); q.awaitTermination()
    } else {
      val q = w.start(); q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
  }

  private def setupTable(root: String): Unit = {
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("id"))
    LakeFormat.merge(rows((1L, 1L, true, "a1"), (2L, 1L, true, "b1")), root)
    LakeFormat.merge(rows((1L, 2L, true, "a2"), (3L, 2L, true, "c1")), root)
    LakeFormat.merge(rows((2L, 3L, false, "b1")), root) // delete id=2
  }

  test("streamed rows equal the batch change feed exactly") {
    val root = freshDir("glss_tbl")
    setupTable(root)
    val buf = collection.mutable.Buffer.empty[Got]
    drain(root, freshDir("glss_ck"), buf)
    val want = LakeFormat.changeFeed(spark, root, 1L, 3L)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2),
        x.getLong(3))).toSet
    assert(want.nonEmpty)
    assert(buf.map(g => (g._1, g._2, g._3, g._4)).toSet === want)
  }

  test("rate-limited kill/restart resumes from the checkpoint alone — no re-delivery, no gaps") {
    val root = freshDir("glss_tbl2")
    setupTable(root) // commits 1-3
    val ck = freshDir("glss_ck2")
    val buf = collection.mutable.Buffer.empty[Got]
    // query 1: ONE trigger capped at 2 commits, then terminates
    drain(root, ck, buf, Map("maxCommitsPerTrigger" -> "2"), once = true)
    val afterKill = buf.map(_._4).toSet
    assert(afterKill === Set(1L, 2L),
      s"first trigger must cover commits 1-2, got $afterKill")
    // more commits land while the stream is down
    LakeFormat.merge(rows((4L, 4L, true, "d1")), root)
    LakeFormat.merge(rows((5L, 5L, true, "e1")), root)
    // query 2: same checkpoint, still rate-limited — resumes at commit 3
    drain(root, ck, buf, Map("maxCommitsPerTrigger" -> "2"))
    assert(buf.map(_._4).toSet === Set(1L, 2L, 3L, 4L, 5L))
    // exactly-once per (key, commit) across the restart
    assert(buf.groupBy(g => (g._1, g._4)).forall(_._2.size == 1),
      s"a (key, commit) pair was delivered twice: $buf")
    // the cap bounds every batch
    buf.groupBy(_._5).foreach { case (bid, g) =>
      assert(g.map(_._4).distinct.size <= 2, s"batch $bid exceeded the cap")
    }
  }

  test("maxBytesPerTrigger chunks the backlog by commit bytes under the real engine") {
    val root = freshDir("glss_bytes")
    setupTable(root) // commits 1-3
    // cap below two commits' added bytes ⇒ every micro-batch carries
    // exactly one commit (whole-commit admission, ≥1 per trigger)
    val buf = collection.mutable.Buffer.empty[Got]
    drain(root, freshDir("glss_bk"), buf, Map("maxBytesPerTrigger" -> "1"))
    assert(buf.map(_._4).toSet === Set(1L, 2L, 3L))
    val perBatch = buf.groupBy(_._5).values.map(_.map(_._4).distinct.size)
    assert(perBatch.forall(_ == 1),
      s"byte cap must admit one commit per batch, got $buf")
    assert(buf.groupBy(_._5).size === 3)
  }

  test("startingVersion=latest tails only post-start commits; numeric startingVersion skips history") {
    val root = freshDir("glss_tbl3")
    setupTable(root) // commits 1-3
    val buf = collection.mutable.Buffer.empty[Got]
    val ck = freshDir("glss_ck3")
    drain(root, ck, buf, Map("startingVersion" -> "latest"))
    assert(buf.isEmpty, "latest must not replay history")
    LakeFormat.merge(rows((9L, 9L, true, "i1")), root) // commit 4
    drain(root, ck, buf, Map("startingVersion" -> "latest"))
    assert(buf.map(_._4).toSet === Set(4L),
      "only the post-start commit flows; the checkpointed offsets hold across restarts")
    // a numeric start on a FRESH checkpoint: from commit 3 only
    val buf2 = collection.mutable.Buffer.empty[Got]
    drain(root, freshDir("glss_ck3b"), buf2, Map("startingVersion" -> "3"))
    assert(buf2.map(_._4).toSet === Set(3L, 4L))
  }

  test("additive schema evolution mid-stream fails the RUNNING query loudly; a restart re-pins and serves the new column") {
    val root = freshDir("glss_tbl4")
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("id"))
    LakeFormat.merge(rows((1L, 1L, true, "a1")), root)
    val ck = freshDir("glss_ck4")
    // the query pins the pre-evolution schema and STAYS RUNNING
    val q = spark.readStream.format("graft-lake").load(root)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch((b: Dataset[Row], _: Long) => { b.count(); () })
      .start()
    q.processAllAvailable() // commit 1 under the old pin
    // the table evolves under the live query
    LakeFormat.merge(
      Seq((2L, 2L, true, "b1", 7.5)).toDF("id", "lsn", "live", "v", "score"),
      root)
    val ex = intercept[StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    assert(causeChain(ex).contains("restart the streaming query"),
      s"want the evolve-restart instruction, got: ${causeChain(ex)}")
    // restart on the SAME checkpoint: the new incarnation pins the
    // evolved schema, serves the new column, and does NOT replay commit 1
    val got = collection.mutable.Buffer.empty[(Long, Option[Double], Long)]
    val q2 = spark.readStream.format("graft-lake").load(root)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        val xs = b.select(col("id"), col("score"), col("_commit_version"))
          .collect().map(x => (x.getLong(0),
            if (x.isNullAt(1)) None else Some(x.getDouble(1)), x.getLong(2)))
        got.synchronized { got ++= xs }
        ()
      }.start()
    q2.processAllAvailable(); q2.stop(); q2.awaitTermination()
    assert(got.toSet === Set((2L, Some(7.5), 2L)))
  }

  test("retention violation surfaces as stream failure, never a silent skip") {
    val root = freshDir("glss_tbl5")
    setupTable(root) // commits 1-3; 2 and 3 rewrote earlier files
    LakeFormat.merge(rows((1L, 4L, true, "a3")), root) // commit 4
    LakeFormat.vacuum(spark, root, keepVersions = 1, olderThanMs = 0L)
    intercept[StreamingQueryException] {
      val q = spark.readStream.format("graft-lake").load(root)
        .writeStream.option("checkpointLocation", freshDir("glss_ck5"))
        .foreachBatch((b: Dataset[Row], _: Long) => { b.count(); () })
        .start()
      try q.processAllAvailable() finally q.stop()
    }
  }

  test("a named stream registers in the table's consumer registry; vacuum holds history for it") {
    val root = freshDir("glss_tbl6")
    setupTable(root) // commits 1-3, rewrites along the way
    val ck = freshDir("glss_ck6")
    val buf = collection.mutable.Buffer.empty[Got]
    // one capped trigger: the stream dies mid-backlog at commit 2,
    // BEFORE the engine's lazy batch acknowledgement ran — the
    // registered pointer legitimately still says "nothing durable yet"
    drain(root, ck, buf,
      Map("maxCommitsPerTrigger" -> "2", "consumerName" -> "ix"),
      once = true)
    assert(LakeFormat.registeredConsumers(spark, root).contains("ix"),
      "query start must register the consumer")
    // a tip-only vacuum would reclaim pre-images the stream still
    // (conservatively) claims: refused, naming the stream
    val ex = intercept[IllegalStateException](
      LakeFormat.vacuum(spark, root, keepVersions = 1, olderThanMs = 0L))
    assert(ex.getMessage.contains("ix"))
    // the restart acknowledges the recovered committed offset (commit 2)
    // eagerly and drains commit 3; the pointer trails the checkpoint by
    // at most one batch — the SAFE direction (vacuum holds extra)
    drain(root, ck, buf, Map("consumerName" -> "ix"))
    val afterCatchup = LakeFormat.registeredConsumers(spark, root)
      .get("ix").flatten
    assert(afterCatchup.exists(_ >= 2L), s"pointer too old: $afterCatchup")
    // one more commit + drain: the previous batch's acknowledgement is
    // now deterministic (it is this drain's recovered start offset)
    LakeFormat.merge(rows((6L, 6L, true, "f1")), root) // commit 4
    drain(root, ck, buf, Map("consumerName" -> "ix"))
    assert(LakeFormat.registeredConsumers(spark, root)
      .get("ix").flatten.exists(_ >= 3L))
    assert(buf.map(_._4).toSet === Set(1L, 2L, 3L, 4L))
    // a window respecting the trail-by-one pointer runs
    LakeFormat.vacuum(spark, root, keepVersions = 2, olderThanMs = 0L)
  }

  test("format sink: writeStream.format(graft-lake) lands CDC envelopes exactly-once; merge mode takes the fold shape") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val root = freshDir("glss_sink")
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("id"))
    val mem = MemoryStream[(Long, Long, String, String)]
    def toEnvelope(df: org.apache.spark.sql.DataFrame) = {
      val img = struct(col("_1").as("id"), col("_4").as("first_name"),
        lit("ln").as("last_name"), lit("em").as("email"))
      df.select(
        when(col("_3") === "d", img).as("before"),
        when(col("_3") =!= "d", img).as("after"),
        struct(col("_2").as("lsn")).as("source"),
        col("_3").as("op"))
    }
    val ck = freshDir("glss_sink_ck")
    val q = toEnvelope(mem.toDF).writeStream.format("graft-lake")
      .option("checkpointLocation", ck).start(root)
    mem.addData((1L, 1L, "c", "a"), (2L, 2L, "c", "b"))
    q.processAllAvailable()
    mem.addData((1L, 3L, "u", "a2"), (2L, 4L, "d", "b"))
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    val live = LakeFormat.snapshot(spark, root).filter(col("live"))
      .select("id", "first_name").as[(Long, String)].collect().toSeq
    assert(live === Seq(1L -> "a2"))
    assert(LakeFormat.snapshot(spark, root).filter(!col("live")).count() === 1L)
    // the exactly-once identity landed under the CHECKPOINT's appId: a
    // replayed batch id no-ops even with different (garbage) content
    val vBefore = LakeFormat.state(spark, root).version
    LakeFormat.merge(
      Seq((99L, 99L, true, "GARBAGE", "x", "y"))
        .toDF("id", "lsn", "live", "first_name", "last_name", "email"),
      root, txn = Some((ck, 0L)))
    assert(LakeFormat.state(spark, root).version === vBefore,
      "a replayed batch id must no-op through the txn marker")
    assert(LakeFormat.snapshot(spark, root).filter(col("id") === 99L).count() === 0L)
    // merge mode: rows already in the fold shape, no envelope
    val root2 = freshDir("glss_sink2")
    LakeFormat.create(spark, root2, Seq("id"), statsCols = Seq("id"))
    val mem2 = MemoryStream[(Long, Long, Boolean, String)]
    val q2 = mem2.toDF.toDF("id", "lsn", "live", "v")
      .writeStream.format("graft-lake").option("mode", "merge")
      .option("checkpointLocation", freshDir("glss_sink2_ck")).start(root2)
    mem2.addData((7L, 1L, true, "v7"), (8L, 2L, false, "v8"))
    q2.processAllAvailable(); q2.stop(); q2.awaitTermination()
    assert(LakeFormat.snapshot(spark, root2).filter(col("live"))
      .select("id").as[Long].collect().toSeq === Seq(7L))
    // and the sink refuses to run without an exactly-once identity
    intercept[IllegalArgumentException] {
      mem2.toDF.toDF("id", "lsn", "live", "v").writeStream
        .format("graft-lake").option("mode", "merge").start(root2)
    }
  }

  test("Trigger.AvailableNow drains the backlog under the rate limit, then terminates") {
    val root = freshDir("glss_an")
    setupTable(root) // commits 1-3
    val buf = collection.mutable.Buffer.empty[Got]
    val q = spark.readStream.format("graft-lake")
      .option("maxCommitsPerTrigger", "1").load(root)
      .writeStream.option("checkpointLocation", freshDir("glss_an_ck"))
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        val got = b.collect().map(x => (x.getLong(0), x.getString(1),
          x.getString(2), x.getLong(3), id))
        buf.synchronized { buf ++= got }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the wrapper honors the cap (3 one-commit batches), drains the
    // whole backlog present at start, and self-terminates
    assert(buf.map(_._4).toSet === Set(1L, 2L, 3L))
    assert(buf.groupBy(_._5).size === 3, s"expected 3 capped batches: $buf")
  }

  test("the stream composes with watermarks and windowed aggregation") {
    val root = freshDir("glss_wm")
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("id"))
    def evRows(xs: (Long, String)*) = xs.toDF("id", "_t")
      .select(col("id"), col("id").as("lsn"), lit(true).as("live"),
        to_timestamp(col("_t")).as("ts"))
    LakeFormat.merge(evRows((1L, "2026-01-01 10:00:00"),
      (2L, "2026-01-01 10:05:00")), root)
    LakeFormat.merge(evRows((3L, "2026-01-01 10:25:00")), root)
    LakeFormat.merge(evRows((4L, "2026-01-01 10:40:00")), root)
    // one commit per trigger: the watermark advances batch by batch, so
    // the 10:00-10:10 window (2 events) closes once the 10:25 commit's
    // watermark (10:20) has been absorbed, and emits in the next batch
    val q = spark.readStream.format("graft-lake")
      .option("maxCommitsPerTrigger", "1").load(root)
      .filter(col("_change_type") =!= "d")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes")).count()
      .select(col("window.start").cast("string").as("w"), col("count"))
      .writeStream.outputMode("append").format("memory")
      .queryName("glss_wm_q")
      .option("checkpointLocation", freshDir("glss_wm_ck")).start()
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    val got = spark.table("glss_wm_q").as[(String, Long)].collect().toMap
    // the final watermark (10:40 - 5m = 10:35) closes the 10:00 and
    // 10:20 windows (the engine's no-data micro-batch flushes the last
    // one); only the 10:40 window stays open
    assert(got === Map("2026-01-01 10:00:00" -> 2L,
      "2026-01-01 10:20:00" -> 1L),
      s"closed windows must emit through the watermark, got $got")
  }

  test("batch relation: format(graft-lake) reads the snapshot, time-travels, reports real bytes to the planner") {
    val root = freshDir("glss_tbl7")
    setupTable(root) // commits 1-3; id=2 tombstoned at commit 3
    val got = spark.read.format("graft-lake").load(root)
    // raw maintained rows — newest per key, tombstones as live=false
    assert(got.count() === 3L)
    assert(got.filter(col("live")).select("id").as[Long].collect().toSet
      === Set(1L, 3L))
    assert(got.collect().toSet ===
      graft.sources.LakeFormat.snapshot(spark, root).collect().toSet)
    // pushed filters agree with the direct API (values, not just counts)
    assert(spark.read.format("graft-lake").load(root)
      .filter(col("id") === 1L).select("v").as[String].head() === "a2")
    // versionAsOf time travel through the reader options
    val v1 = spark.read.format("graft-lake")
      .option("versionAsOf", "1").load(root)
    assert(v1.select("id").as[Long].collect().toSet === Set(1L, 2L))
    // the planner sees the table's REAL recorded size (broadcast-ability
    // for small lake dims), not the conservative default
    val stats = got.queryExecution.optimizedPlan.stats.sizeInBytes
    val bytes = graft.sources.LakeFormat.state(spark, root).files.map(_.bytes).sum
    assert(bytes > 0L && stats === BigInt(bytes))
  }

  test("readChangeFeed batch relation: range options, tip default, retention failure") {
    val root = freshDir("glss_cdf")
    setupTable(root) // commits 1-3
    def cdf(opts: (String, String)*) = {
      var r = spark.read.format("graft-lake")
        .option("readChangeFeed", "true")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load(root)
    }
    // full default range (1..tip) equals the API changeFeed exactly
    val viaFormat = cdf().collect().map(x => (x.getLong(0), x.getString(1),
      x.getString(2), x.getLong(3))).toSet
    val direct = LakeFormat.changeFeed(spark, root, 1L, 3L)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2),
        x.getLong(3))).toSet
    assert(viaFormat === direct && direct.nonEmpty)
    // an explicit sub-range
    assert(cdf("startingVersion" -> "3").select("_commit_version")
      .as[Long].collect().toSet === Set(3L))
    assert(cdf("startingVersion" -> "1", "endingVersion" -> "1")
      .select("_commit_version").as[Long].collect().toSet === Set(1L))
    // an empty range is schema-true and empty
    assert(cdf("startingVersion" -> "9").count() === 0L)
    // a range past retention fails loudly at materialization
    LakeFormat.merge(rows((1L, 9L, true, "a9")), root) // commit 4
    LakeFormat.vacuum(spark, root, keepVersions = 1, olderThanMs = 0L)
    intercept[Exception](cdf().count())
  }

  test("tx batch relation: option(table) serves the manifest pin — in-flight table commits invisible") {
    val root = freshDir("glss_txroot2")
    setupTx(root)
    (1L to 2L).foreach(tx => LakeTx.commitTx(spark, root,
      Map("a" -> marker(tx), "b" -> marker(tx)), "app", tx))
    // an orphan direct table commit (no manifest): a consistent reader
    // through the format must NOT see it
    LakeFormat.merge(marker(9L), LakeTx.tableRoot(root, "a"),
      txn = Some(("app::a", 9L)))
    def read(opts: (String, String)*) = {
      var r = spark.read.format("graft-lake-tx").option("table", "a")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load(root).filter(col("live")).select("id").as[Long].collect().toSet
    }
    assert(read() === Set(1L, 2L), "the orphan commit leaked through the pin")
    // cross-table time travel by manifest version
    assert(read("manifestAsOf" -> "1") === Set(1L))
    // a missing table option refuses loudly
    intercept[IllegalArgumentException](
      spark.read.format("graft-lake-tx").load(root).count())
  }

  // ------------------------------------------------ multi-table source

  private def setupTx(root: String): Unit = {
    val schema = Some(org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, lsn BIGINT, live BOOLEAN, v STRING"))
    LakeFormat.create(spark, LakeTx.tableRoot(root, "a"), Seq("id"),
      statsCols = Seq("id"), schema = schema)
    LakeFormat.create(spark, LakeTx.tableRoot(root, "b"), Seq("id"),
      statsCols = Seq("id"), schema = schema)
    LakeTx.init(spark, root, Seq("a", "b"))
  }

  private def marker(tx: Long) =
    Seq((tx, tx, true, s"m$tx")).toDF("id", "lsn", "live", "v")

  /** Collected tx-feed row: (table, id, change_type, manifestV, batchId). */
  private type TxGot = (String, Long, String, Long, Long)

  private def drainTx(root: String, ck: String,
      buf: collection.mutable.Buffer[TxGot],
      options: Map[String, String] = Map.empty,
      once: Boolean = false): Unit = {
    var r = spark.readStream.format("graft-lake-tx")
    options.foreach { case (k, v) => r = r.option(k, v) }
    val w = r.load(root).writeStream.option("checkpointLocation", ck)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        val got = b.select(col("_table"), col("id"), col("_change_type"),
            col("_manifest_version")).collect()
          .map(x => (x.getString(0), x.getLong(1), x.getString(2),
            x.getLong(3), id))
        buf.synchronized { buf ++= got }
        ()
      }
    if (once) {
      val q = w.trigger(Trigger.Once()).start(); q.awaitTermination()
    } else {
      val q = w.start(); q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
  }

  test("tx format sink: one mixed-table stream lands atomically across members through format resolution") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val root = freshDir("glss_txsink")
    setupTx(root)
    val mem = MemoryStream[(String, Long, Long, String, String)]
    def toEnv(df: org.apache.spark.sql.DataFrame) = {
      val img = struct(col("_2").as("id"), col("_5").as("v"))
      df.select(
        when(col("_4") === "d", img).as("before"),
        when(col("_4") =!= "d", img).as("after"),
        struct(col("_3").as("lsn"), col("_1").as("table")).as("source"),
        col("_4").as("op"))
    }
    val q = toEnv(mem.toDF).writeStream.format("graft-lake-tx")
      .option("tables", "a:id;b:id")
      .option("checkpointLocation", freshDir("glss_txsink_ck")).start(root)
    mem.addData(("a", 1L, 1L, "c", "a1"), ("b", 7L, 2L, "c", "b7"),
      ("a", 2L, 3L, "c", "a2"))
    q.processAllAvailable()
    mem.addData(("a", 1L, 4L, "u", "a1x"), ("b", 7L, 5L, "d", "b7"))
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    def live(t: String) = LakeTx.snapshot(spark, root, t)
      .filter(col("live")).select("id", "v").as[(Long, String)]
      .collect().toSet
    assert(live("a") === Set(1L -> "a1x", 2L -> "a2"))
    assert(live("b") === Set.empty[(Long, String)])
    // both batches manifested atomically: 2 manifest versions past init
    assert(LakeTx.manifestVersion(spark, root) === 2L)
    // a malformed tables spec refuses at sink creation
    intercept[IllegalArgumentException] {
      toEnv(mem.toDF).writeStream.format("graft-lake-tx")
        .option("tables", "a=id").option("appId", "x").start(root)
    }
  }

  test("tx stream: batches are transaction-aligned; kill/restart drives cross-table derived state exactly-once") {
    val root = freshDir("glss_txroot")
    setupTx(root)
    // three two-table transactions + one touching only table a
    (1L to 3L).foreach(tx => LakeTx.commitTx(spark, root,
      Map("a" -> marker(tx), "b" -> marker(tx)), "app", tx))
    LakeTx.commitTx(spark, root, Map("a" -> marker(4L)), "app", 4L)
    val ck = freshDir("glss_txck")
    val buf = collection.mutable.Buffer.empty[TxGot]
    // kill after ONE rate-limited trigger (manifests 1-2)...
    drainTx(root, ck, buf, Map("maxManifestsPerTrigger" -> "2"), once = true)
    assert(buf.map(_._4).toSet === Set(1L, 2L))
    // ...a fifth transaction lands while the stream is down...
    LakeTx.commitTx(spark, root,
      Map("a" -> marker(5L), "b" -> marker(5L)), "app", 5L)
    // ...and the restart resumes from the checkpoint alone
    drainTx(root, ck, buf)
    assert(buf.map(_._4).toSet === Set(1L, 2L, 3L, 4L, 5L))
    // TRANSACTION ALIGNMENT: a manifest version never splits across
    // micro-batches — every row of one tx shares one foreachBatch id
    buf.groupBy(_._4).foreach { case (mv, g) =>
      assert(g.map(_._5).distinct.size === 1,
        s"manifest v$mv split across batches: $g")
    }
    // two-table transactions deliver BOTH members' rows in that batch
    (1L to 3L).foreach { mv =>
      val tables = buf.filter(_._4 == mv).map(_._1).toSet
      assert(tables === Set("a", "b"), s"manifest v$mv tore: $tables")
    }
    assert(buf.filter(_._4 == 4L).map(_._1).toSet === Set("a"))
    // exactly-once per (table, key, manifest) across the kill/restart
    assert(buf.groupBy(g => (g._1, g._2, g._4)).forall(_._2.size == 1))
    // CROSS-TABLE DERIVED STATE through the restart: fold the feed per
    // table (the lake_tx_feed epoch discipline — newest manifest wins,
    // deletes tombstone) and it must equal the manifest-pinned snapshots
    def fold(table: String): Set[Long] = {
      val byKey = buf.filter(_._1 == table).groupBy(_._2)
      byKey.collect { case (id, g)
        if g.maxBy(_._4)._3 != "d" => id }.toSet
    }
    def snap(table: String): Set[Long] =
      LakeTx.snapshot(spark, root, table)
        .filter(col("live")).select("id").as[Long].collect().toSet
    assert(fold("a") === snap("a"))
    assert(fold("b") === snap("b"))
  }
}
