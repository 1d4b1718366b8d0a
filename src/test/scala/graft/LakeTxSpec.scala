package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LakeFormat, LakeTx}

/** Multi-table lake transactions ([[graft.sources.LakeTx]]): atomic
  * cross-table visibility through the transaction manifest — the property
  * the oracle-checked `lake_multitable_tx` query relies on but cannot
  * witness (torn states, crash recovery, in-flight invisibility).
  */
class LakeTxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(): String = {
    val p = Files.createTempDirectory("lake_tx_spec")
    p.toFile.deleteOnExit()
    p.toString
  }

  // one tx writes the SAME marker value into both tables: cross-table
  // consistency is then "the set of markers visible in A equals the set
  // visible in B" at every manifest version
  private def markerRows(tx: Long) =
    Seq((tx, tx, true, s"m$tx")).toDF("id", "lsn", "live", "v")

  private def setup(root: String): Unit = {
    // the declared schema makes manifest v0 (zero-file members) serve
    // typed empties — a `live` filter on the pre-first-tx state analyzes
    val schema = Some(org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, lsn BIGINT, live BOOLEAN, v STRING"))
    LakeFormat.create(spark, LakeTx.tableRoot(root, "a"), Seq("id"),
      statsCols = Seq("id"), schema = schema)
    LakeFormat.create(spark, LakeTx.tableRoot(root, "b"), Seq("id"),
      statsCols = Seq("id"), schema = schema)
    LakeTx.init(spark, root, Seq("a", "b"))
  }

  private def visible(root: String, table: String, mv: Long): Set[Long] =
    LakeTx.snapshotAsOf(spark, root, table, mv)
      .filter(col("live")).select("id").as[Long].collect().toSet

  test("every manifest version shows BOTH tables at the same tx prefix — never half") {
    val root = freshRoot()
    setup(root)
    (1L to 4L).foreach(tx => LakeTx.commitTx(spark, root,
      Map("a" -> markerRows(tx), "b" -> markerRows(tx)), "app", tx))
    val tip = LakeTx.manifestVersion(spark, root)
    assert(tip === 4L)
    (0L to tip).foreach { mv =>
      val (va, vb) = (visible(root, "a", mv), visible(root, "b", mv))
      assert(va === vb, s"manifest v$mv tore a tx: a=$va b=$vb")
      assert(va === (1L to mv).toSet)
    }
  }

  test("an orphan table commit (crash before manifest) is invisible; retry converges") {
    val root = freshRoot()
    setup(root)
    LakeTx.commitTx(spark, root,
      Map("a" -> markerRows(1L), "b" -> markerRows(1L)), "app", 1L)
    // simulate tx 2 crashing AFTER table a's merge, BEFORE table b and
    // the manifest: merge a directly with the marker commitTx would use
    LakeFormat.merge(markerRows(2L), LakeTx.tableRoot(root, "a"),
      txn = Some(("app::a", 2L)))
    val mvBefore = LakeTx.manifestVersion(spark, root)
    // manifest readers see the PRE-tx state on BOTH tables...
    assert(visible(root, "a", mvBefore) === Set(1L))
    assert(visible(root, "b", mvBefore) === Set(1L))
    // ...even though a DIRECT table read (bypassing the manifest — the
    // documented boundary) already shows the orphan
    assert(LakeFormat.snapshot(spark, LakeTx.tableRoot(root, "a"))
      .filter(col("live")).count() === 2L)
    // retry the whole tx: a's merge no-ops through its marker, b applies,
    // ONE manifest publishes both
    val mv = LakeTx.commitTx(spark, root,
      Map("a" -> markerRows(2L), "b" -> markerRows(2L)), "app", 2L)
    assert(mv === mvBefore + 1)
    assert(visible(root, "a", mv) === Set(1L, 2L))
    assert(visible(root, "b", mv) === Set(1L, 2L))
    // a's orphan version left NO extra table commit on retry (the marker
    // gated it): table a has create + 2 merges only
    assert(LakeFormat.state(spark, LakeTx.tableRoot(root, "a")).version === 2L)
  }

  test("replaying a fully-committed tx publishes nothing and changes nothing") {
    val root = freshRoot()
    setup(root)
    val mv1 = LakeTx.commitTx(spark, root,
      Map("a" -> markerRows(1L), "b" -> markerRows(1L)), "app", 1L)
    val mv2 = LakeTx.commitTx(spark, root,
      Map("a" -> markerRows(1L), "b" -> markerRows(1L)), "app", 1L)
    assert(mv2 === mv1, "replay must not mint a manifest version")
    assert(LakeTx.manifest(spark, root) ===
      LakeTx.manifest(spark, root, Some(mv1)))
    assert(visible(root, "a", mv1) === Set(1L))
  }

  test("partial-table transactions pin untouched members; historical manifests time-travel consistently") {
    val root = freshRoot()
    setup(root)
    LakeTx.commitTx(spark, root,
      Map("a" -> markerRows(1L), "b" -> markerRows(1L)), "app", 1L)
    // tx 2 touches ONLY table a
    LakeTx.commitTx(spark, root, Map("a" -> markerRows(2L)), "app", 2L)
    val tip = LakeTx.manifestVersion(spark, root)
    assert(visible(root, "a", tip) === Set(1L, 2L))
    assert(visible(root, "b", tip) === Set(1L))
    // cross-table time travel: manifest v1 shows tx 1 only, on both
    assert(visible(root, "a", tip - 1) === Set(1L))
    assert(visible(root, "b", tip - 1) === Set(1L))
    // unknown member tables are refused
    intercept[IllegalArgumentException](LakeTx.commitTx(spark, root,
      Map("zz" -> markerRows(9L)), "app", 9L))
  }

  test("concurrent commitTx on an overlapping table never regresses its pin") {
    val root = freshRoot()
    setup(root)
    LakeTx.commitTx(spark, root,
      Map("a" -> markerRows(1L), "b" -> markerRows(1L)), "appA", 1L)
    // Interleave deterministically through the commit hook: transaction
    // A merges its tables in sorted order (a, then b) BEFORE claiming
    // the manifest. On A's SECOND table commit (b's merge), a full
    // concurrent commitTx from appB advances table a and publishes its
    // own manifest. A's manifest claim then holds a STALE applied
    // version for a — publishing it verbatim would un-publish appB's
    // committed rows from the consistent view and make consumeChanges
    // silently skip them; the pin must take the per-table max instead.
    var fired = 0
    LakeFormat.beforeCommitHook = () => {
      fired += 1
      if (fired == 2) {
        LakeFormat.beforeCommitHook = () => ()
        LakeTx.commitTx(spark, root, Map("a" -> markerRows(3L)), "appB", 3L)
      }
    }
    val tip = try {
      LakeTx.commitTx(spark, root,
        Map("a" -> markerRows(2L), "b" -> markerRows(2L)), "appA", 2L)
    } finally LakeFormat.beforeCommitHook = () => ()
    // BOTH transactions' rows are visible at A's manifest
    assert(visible(root, "a", tip) === Set(1L, 2L, 3L))
    assert(visible(root, "b", tip) === Set(1L, 2L))
    // pins are monotonic across every manifest version, per table
    (1L to tip).foreach { mv =>
      val (prev, cur) = (LakeTx.manifest(spark, root, Some(mv - 1)),
        LakeTx.manifest(spark, root, Some(mv)))
      cur.foreach { case (t, v) =>
        assert(v >= prev(t), s"manifest v$mv regressed $t: $v < ${prev(t)}")
      }
    }
    // and the transaction-aligned feed delivers appB's row (a regressed
    // pin would make the version window skip it)
    val dir = Files.createTempDirectory("lake_tx_cons").toString
    val seen = scala.collection.mutable.Set.empty[Long]
    LakeTx.consumeChanges(spark, root, dir) { (t, df, _) =>
      if (t == "a") seen ++= df.filter(col("_change_type") =!= "d")
        .select("id").as[Long].collect()
    }
    assert(seen.toSet === Set(1L, 2L, 3L))
  }

  // envelope rows for the streaming sink: (table, id, lsn, op, value)
  private def envRows(xs: (String, Long, Long, String, String)*) = {
    val df = xs.toSeq.toDF("_t", "_id", "_lsn", "_op", "_v")
    val img = struct(col("_id").as("id"), col("_v").as("v"))
    df.select(
      when(col("_op") === "d", img).as("before"),
      when(col("_op") =!= "d", img).as("after"),
      struct(col("_lsn").as("lsn"), col("_t").as("table")).as("source"),
      col("_op").as("op"))
  }

  private val sinkKeys = Map("a" -> Seq("id"), "b" -> Seq("id"))

  test("streaming sink: one mixed-table batch lands atomically; replay no-ops; one-table batches pin the other") {
    val root = freshRoot()
    setup(root)
    // batch 0: both tables
    streaming.LakeTxSink.applyBatch(envRows(
      ("a", 1L, 1L, "c", "a1"), ("b", 1L, 1L, "c", "b1"),
      ("a", 2L, 2L, "c", "a2")), root, sinkKeys, "sink", 0L)
    val mv0 = LakeTx.manifestVersion(spark, root)
    assert(visible(root, "a", mv0) === Set(1L, 2L))
    assert(visible(root, "b", mv0) === Set(1L))
    // replay of batch 0: no new manifest, no state change
    streaming.LakeTxSink.applyBatch(envRows(
      ("a", 1L, 1L, "c", "a1"), ("b", 1L, 1L, "c", "b1"),
      ("a", 2L, 2L, "c", "a2")), root, sinkKeys, "sink", 0L)
    assert(LakeTx.manifestVersion(spark, root) === mv0)
    assert(visible(root, "a", mv0) === Set(1L, 2L))
    // batch 1: only table b has events (a's slice is empty) — the batch
    // still manifests atomically, a keeps its pin, and a delete for b
    // tombstones through the fold
    streaming.LakeTxSink.applyBatch(envRows(
      ("b", 1L, 3L, "d", "b1"), ("b", 2L, 4L, "c", "b2")),
      root, sinkKeys, "sink", 1L)
    val mv1 = LakeTx.manifestVersion(spark, root)
    assert(mv1 === mv0 + 1)
    assert(visible(root, "a", mv1) === Set(1L, 2L))
    assert(visible(root, "b", mv1) === Set(2L))
    // cross-table time travel still serves the pre-batch-1 pair
    assert(visible(root, "b", mv0) === Set(1L))
    // an event for a table nobody configured refuses loudly — silent
    // drops would desynchronize the replica forever
    val ex = intercept[IllegalArgumentException] {
      streaming.LakeTxSink.applyBatch(envRows(("zz", 9L, 9L, "c", "z9")),
        root, sinkKeys, "sink", 2L)
    }
    assert(ex.getMessage.contains("zz"))
    assert(LakeTx.manifestVersion(spark, root) === mv1,
      "the refused batch must not publish")
  }

  test("streaming sink: a NULL source.table is a stray, not a silent drop") {
    val root = freshRoot()
    setup(root)
    val mv0 = LakeTx.manifestVersion(spark, root)
    // `!isin(...)` is NULL (not true) for a NULL table — without the
    // explicit isNull arm the envelope would slip past the stray guard
    // and then match no per-table `===` filter, vanishing silently
    intercept[IllegalArgumentException] {
      streaming.LakeTxSink.applyBatch(
        envRows((null.asInstanceOf[String], 9L, 9L, "c", "z9")),
        root, sinkKeys, "sink", 0L)
    }
    assert(LakeTx.manifestVersion(spark, root) === mv0,
      "the refused batch must not publish")
  }

  test("streaming sink wrapper smoke: cdcApply drives batches through a real stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val root = freshRoot()
    setup(root)
    val mem = MemoryStream[(String, Long, Long, String, String)]
    def toEnv(df: org.apache.spark.sql.DataFrame) = {
      val img = struct(col("_2").as("id"), col("_5").as("v"))
      df.select(
        when(col("_4") === "d", img).as("before"),
        when(col("_4") =!= "d", img).as("after"),
        struct(col("_3").as("lsn"), col("_1").as("table")).as("source"),
        col("_4").as("op"))
    }
    val ck = Files.createTempDirectory("lake_tx_ck").toString
    val q = streaming.LakeTxSink.cdcApply(toEnv(mem.toDF), root, sinkKeys, "stream")
      .option("checkpointLocation", ck).start()
    mem.addData(("a", 1L, 1L, "c", "a1"), ("b", 7L, 2L, "c", "b7"))
    q.processAllAvailable()
    mem.addData(("a", 1L, 3L, "u", "a1x"))
    q.processAllAvailable(); q.stop()
    val tip = LakeTx.manifestVersion(spark, root)
    assert(visible(root, "a", tip) === Set(1L))
    assert(LakeTx.snapshot(spark, root, "a").filter(col("live"))
      .select("v").as[String].collect().toSeq === Seq("a1x"))
    assert(visible(root, "b", tip) === Set(7L))
  }

  test("consumeChanges delivers transaction-aligned member batches; replay no-ops; crash redelivers one version") {
    val root = freshRoot()
    setup(root)
    (1L to 3L).foreach(tx => LakeTx.commitTx(spark, root,
      Map("a" -> markerRows(tx), "b" -> markerRows(tx)), "app", tx))
    val cons = s"${freshRoot()}/c"
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, String)]
    def drain(max: Int = Int.MaxValue) =
      LakeTx.consumeChanges(spark, root, cons, max) { (t, batch, mv) =>
        batch.select("id", "_change_type").as[(Long, String)].collect()
          .foreach { case (id, ct) => seen += ((mv, t, id, ct)) }
      }
    assert(drain(max = 2) === Seq(1L, 2L))
    // per manifest version, BOTH tables' creates arrive, tx-aligned
    assert(seen.sorted.toSeq === Seq(
      (1L, "a", 1L, "c"), (1L, "b", 1L, "c"),
      (2L, "a", 2L, "c"), (2L, "b", 2L, "c")))
    assert(drain() === Seq(3L))
    assert(drain() === Seq.empty, "replay must deliver nothing")
    assert(seen.size === 6)
    // crash INSIDE a version: table a's batch applied, then the consumer
    // dies before b's — the offset must not advance, and the retry
    // redelivers the WHOLE version (a's idempotent epoch absorbs it)
    LakeTx.commitTx(spark, root,
      Map("a" -> markerRows(4L), "b" -> markerRows(4L)), "app", 4L)
    var crashed = false
    intercept[RuntimeException] {
      LakeTx.consumeChanges(spark, root, cons) { (t, _, _) =>
        if (t == "b" && !crashed) { crashed = true; throw new RuntimeException("crash") }
      }
    }
    assert(LakeFormat.consumerOffset(spark, cons) === Some(3L),
      "offset must sit BEFORE the half-delivered version")
    val redelivered = scala.collection.mutable.ArrayBuffer.empty[String]
    assert(LakeTx.consumeChanges(spark, root, cons) { (t, _, _) =>
      redelivered += t
    } === Seq(4L))
    assert(redelivered.sorted.toSeq === Seq("a", "b"),
      "the retry must redeliver BOTH members of the torn version")
  }

  test("manifest log retention: pruned versions fail loudly, retained ones serve, new txs land") {
    val root = freshRoot()
    setup(root)
    (1L to 5L).foreach(tx => LakeTx.commitTx(spark, root,
      Map("a" -> markerRows(tx), "b" -> markerRows(tx)), "app", tx))
    // retention prunes manifests 0-3 from the _tx log itself: the
    // listing is bounded by the window, not by transaction history
    LakeTx.vacuum(spark, root, keepManifests = 2, olderThanMs = 0L)
    assert(LakeTx.manifestVersion(spark, root) === 5L)
    // retained manifests are SELF-CONTAINED — each reads on its own
    assert(LakeTx.manifest(spark, root, Some(4L))("a") ===
      LakeTx.manifest(spark, root, Some(4L))("b"))
    assert(visible(root, "a", 4L) === (1L to 4L).toSet)
    // a pruned manifest version fails loudly at the manifest layer
    intercept[Exception](LakeTx.manifest(spark, root, Some(2L)))
    // a consumer below the retention floor fails loudly, never partially
    val dir = Files.createTempDirectory("tx_cons_floor").toString
    intercept[Exception](
      LakeTx.consumeChanges(spark, root, dir)((_, _, _) => ()))
    // life goes on above the floor: new transactions land and serve
    val mv = LakeTx.commitTx(spark, root,
      Map("a" -> markerRows(6L), "b" -> markerRows(6L)), "app", 6L)
    assert(mv === 6L)
    assert(visible(root, "a", mv) === (1L to 6L).toSet)
  }

  test("registered tx consumers: vacuum refuses while the slowest lags, proceeds after catch-up or drop") {
    val root = freshRoot()
    setup(root)
    (1L to 4L).foreach(tx => LakeTx.commitTx(spark, root,
      Map("a" -> markerRows(tx), "b" -> markerRows(tx)), "app", tx))
    val slow = LakeTx.registerConsumer(spark, root, "replica")
    LakeTx.consumeChanges(spark, root, slow, maxManifests = 1) {
      (_, b, _) => { b.count(); () }
    }
    assert(LakeTx.registeredConsumers(spark, root) ===
      Map("replica" -> Some(1L)))
    // pruning manifests the replica still needs refuses, naming it
    val ex = intercept[IllegalStateException](
      LakeTx.vacuum(spark, root, keepManifests = 1, olderThanMs = 0L))
    assert(ex.getMessage.contains("replica"))
    // a window covering its offset runs; full catch-up unlocks tight ones
    LakeTx.vacuum(spark, root, keepManifests = 4, olderThanMs = 0L)
    LakeTx.consumeChanges(spark, root, slow)((_, b, _) => { b.count(); () })
    LakeTx.vacuum(spark, root, keepManifests = 1, olderThanMs = 0L)
    // a dropped consumer stops holding history
    LakeTx.registerConsumer(spark, root, "abandoned")
    LakeTx.commitTx(spark, root, Map("a" -> markerRows(5L)), "app", 5L)
    intercept[IllegalStateException](
      LakeTx.vacuum(spark, root, keepManifests = 1, olderThanMs = 0L))
    LakeTx.dropConsumer(spark, root, "abandoned")
    // replica lags the new tip by one manifest — catch it up first
    LakeTx.consumeChanges(spark, root, slow)((_, b, _) => { b.count(); () })
    LakeTx.vacuum(spark, root, keepManifests = 1, olderThanMs = 0L)
  }

  test("manifest-coordinated vacuum keeps every retained manifest readable, reclaims older rewrites") {
    val root = freshRoot()
    setup(root)
    (1L to 3L).foreach(tx => LakeTx.commitTx(spark, root,
      // same key every tx: each merge REWRITES table a's single file, so
      // old pinned versions have reclaimable files
      Map("a" -> Seq((1L, tx, true, s"m$tx")).toDF("id", "lsn", "live", "v"),
        "b" -> markerRows(tx)), "app", tx))
    val tip = LakeTx.manifestVersion(spark, root)
    // retain the 2 newest manifests: tip and tip-1 must stay readable
    val deleted = LakeTx.vacuum(spark, root, keepManifests = 2, olderThanMs = 0L)
    assert(deleted("a").nonEmpty, "tx-1-era rewrite of table a must reclaim")
    assert(LakeTx.snapshotAsOf(spark, root, "a", tip).filter(col("live"))
      .select("v").as[String].collect().toSeq === Seq("m3"))
    assert(LakeTx.snapshotAsOf(spark, root, "a", tip - 1).filter(col("live"))
      .select("v").as[String].collect().toSeq === Seq("m2"))
    // the out-of-retention manifest's pinned read fails loudly at scan
    intercept[Exception](
      LakeTx.snapshotAsOf(spark, root, "a", tip - 2).count())
  }
}
