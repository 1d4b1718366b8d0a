package graft

import java.nio.file.Files
import java.util.ConcurrentModificationException

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LakeFormat

/** Protocol guarantees of [[graft.sources.LakeFormat]] — ACID commits over
  * immutable files, optimistic concurrency, merge semantics, time travel,
  * stats pruning, checkpoint replay, vacuum safety. These are the
  * properties the oracle-checked lake_* catalog queries rely on but can't
  * themselves witness (races, crashes, pruning ratios).
  */
class LakeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(): String = {
    val p = Files.createTempDirectory("lake_spec")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def rows(xs: (Long, Long, Boolean, String)*) =
    xs.toSeq.toDF("id", "lsn", "live", "v")

  test("create + append + snapshot round trip; double create throws") {
    val root = freshRoot()
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("id"))
    intercept[IllegalArgumentException](
      LakeFormat.create(spark, root, Seq("id")))
    val v = LakeFormat.append(rows((1L, 1L, true, "a"), (2L, 1L, true, "b")), root)
    assert(v === 1L)
    val got = LakeFormat.snapshot(spark, root)
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(1L -> "a", 2L -> "b"))
  }

  test("merge upserts, deletes tombstone, stale lsn loses, replay is idempotent") {
    val root = freshRoot()
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("id"))
    LakeFormat.merge(rows((1L, 10L, true, "a"), (2L, 10L, true, "b")), root)
    // upsert id=1, delete id=2, insert id=3
    val wave2 = rows((1L, 20L, true, "a2"), (2L, 20L, false, null.asInstanceOf[String]),
      (3L, 20L, true, "c"))
    LakeFormat.merge(wave2, root)
    def live() = LakeFormat.snapshot(spark, root).filter(col("live"))
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(live() === Seq(1L -> "a2", 3L -> "c"))
    // the tombstone is STORED (blocks resurrection), not just filtered
    val stored = LakeFormat.snapshot(spark, root)
      .select("id", "live").as[(Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(stored === Seq(1L -> true, 2L -> false, 3L -> true))
    // a stale event (lsn 15 < stored 20) must lose to both the upsert and
    // the tombstone — no resurrection, no rollback
    LakeFormat.merge(rows((1L, 15L, true, "stale"), (2L, 15L, true, "ghost")), root)
    assert(live() === Seq(1L -> "a2", 3L -> "c"))
    // replaying wave2 verbatim is a no-op on the served state
    LakeFormat.merge(wave2, root)
    assert(live() === Seq(1L -> "a2", 3L -> "c"))
  }

  test("concurrent blind appends all land at distinct versions, no lost rows") {
    val root = freshRoot()
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("id"))
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        LakeFormat.append(
          Seq((i.toLong, 1L, true, s"t$i")).toDF("id", "lsn", "live", "v"), root)
        ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val st = LakeFormat.state(spark, root)
    assert(st.version === 4L) // versions 1..4 all claimed, densely
    assert(LakeFormat.snapshot(spark, root).count() === 4L)
  }

  test("merge aborts with ConcurrentModificationException when the tip moves; re-run succeeds") {
    val root = freshRoot()
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("id"))
    LakeFormat.merge(rows((1L, 1L, true, "a")), root)
    // simulate a racer: claim the next log slot between this merge's
    // read (state at v1) and its commit — the merge below must abort,
    // and the data files it staged must not leak into the snapshot
    val st = LakeFormat.state(spark, root)
    val racer = rows((9L, 1L, true, "racer"))
    LakeFormat.append(racer, root) // tip is now v2
    val before = LakeFormat.snapshot(spark, root).count()
    // a merge planned against v1 would now mis-ground its rewrite; the
    // public API re-reads the tip, so drive the race by interleaving two
    // real merges: thread A reads, thread B commits, A commits second.
    // Deterministic interleave: run B's full merge inside A's window via
    // a planned-then-committed replica of merge's internals is private —
    // so assert the OBSERVABLE contract instead: two threads merging
    // concurrently → at least one succeeds; any loser throws CME and a
    // re-run lands. State afterwards contains both key sets.
    assert(st.version === 1L && before === 2L)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ts = Seq(
      rows((1L, 5L, true, "a5")),
      rows((2L, 5L, true, "b5"))).zipWithIndex.map { case (df, i) =>
      new Thread(() => {
        try { LakeFormat.merge(df, root); results.add(s"ok$i") }
        catch { case _: ConcurrentModificationException =>
          results.add(s"cme$i")
          LakeFormat.merge(df, root); results.add(s"retry$i")
        }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val r = results.asScala.toSeq
    assert(r.count(_.startsWith("ok")) + r.count(_.startsWith("retry")) === 2)
    val live = LakeFormat.snapshot(spark, root).filter(col("live"))
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(live(1L) === "a5" && live(2L) === "b5" && live(9L) === "racer")
  }

  test("time travel reads every historical version; beyond-tip throws") {
    val root = freshRoot()
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("id"))
    LakeFormat.merge(rows((1L, 1L, true, "v1")), root)
    LakeFormat.merge(rows((1L, 2L, true, "v2")), root)
    LakeFormat.merge(rows((1L, 3L, false, null.asInstanceOf[String])), root)
    def at(v: Long) = LakeFormat.readAsOf(spark, root, v)
      .filter(col("live")).select("v").as[String].collect().toSeq
    assert(at(1) === Seq("v1"))
    assert(at(2) === Seq("v2"))
    assert(at(3) === Seq.empty) // tombstoned
    assert(LakeFormat.readAsOf(spark, root, 0).count() === 0L) // pre-data
    intercept[IllegalArgumentException](LakeFormat.readAsOf(spark, root, 4))
  }

  test("scan prunes files by log stats and misses no rows") {
    val root = freshRoot()
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("id"))
    // range layout: 8 near-disjoint files over id 0..7999
    LakeFormat.append(
      spark.range(8000).select(col("id"), lit(1L).as("lsn"),
        lit(true).as("live"), (col("id") % 97).as("v"))
        .repartitionByRange(8, col("id")), root)
    val sc = LakeFormat.scan(spark, root, col("id") < lit(1000L))
    assert(sc.totalFiles === 8L)
    assert(sc.keptFiles < sc.totalFiles, s"no pruning: ${sc.keptFiles}/${sc.totalFiles}")
    assert(sc.df.count() === 1000L)
    // compound predicates: AND narrows, OR keeps the union
    val both = LakeFormat.scan(spark, root,
      col("id") >= lit(2000L) && col("id") < lit(3000L))
    assert(both.keptFiles <= 2L && both.df.count() === 1000L)
    val disj = LakeFormat.scan(spark, root,
      col("id") < lit(500L) || col("id") >= lit(7500L))
    assert(disj.keptFiles < disj.totalFiles && disj.df.count() === 1000L)
    // un-prunable predicate keeps everything (conservative, never wrong)
    val full = LakeFormat.scan(spark, root, (col("id") % 2) === lit(0L))
    assert(full.keptFiles === full.totalFiles && full.df.count() === 4000L)
  }

  test("checkpoint accelerates replay without changing any read") {
    val root = freshRoot()
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("id"))
    (1 to 5).foreach(i => LakeFormat.merge(rows((i.toLong, i.toLong, true, s"r$i")), root))
    val before = LakeFormat.snapshot(spark, root).filter(col("live")).count()
    val cv = LakeFormat.checkpoint(spark, root)
    assert(cv === 5L)
    // post-checkpoint commits replay as the JSON tail on top of it
    LakeFormat.merge(rows((6L, 6L, true, "r6")), root)
    assert(LakeFormat.snapshot(spark, root).filter(col("live")).count() === before + 1)
    // time travel to a pre-checkpoint version still replays the raw log
    assert(LakeFormat.readAsOf(spark, root, 2L).filter(col("live")).count() === 2L)
  }

  test("vacuum reclaims only out-of-retention files; retained time travel survives; torn staging is swept") {
    val root = freshRoot()
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("id"))
    LakeFormat.merge(rows((1L, 1L, true, "v1")), root)  // v1
    LakeFormat.merge(rows((1L, 2L, true, "v2")), root)  // v2 rewrites v1's file
    LakeFormat.merge(rows((1L, 3L, true, "v3")), root)  // v3 rewrites v2's
    // a crashed writer's staging dir: data written, commit never claimed
    val torn = new java.io.File(root, "_tmp-deadbeef")
    assert(torn.mkdirs())
    val deleted = LakeFormat.vacuum(spark, root, keepVersions = 2, olderThanMs = 0L)
    assert(!torn.exists(), "torn staging dir must be swept")
    assert(deleted.nonEmpty, "v1's rewritten file is out of retention")
    // retained reads are intact...
    assert(LakeFormat.readAsOf(spark, root, 2L).select("v").as[String].collect()
      .toSeq === Seq("v2"))
    assert(LakeFormat.snapshot(spark, root).select("v").as[String].collect()
      .toSeq === Seq("v3"))
    // ...and the in-flight-writer guard refuses young files even when
    // unreferenced: nothing young is ever deleted with the default guard
    LakeFormat.merge(rows((1L, 4L, true, "v4")), root)
    assert(LakeFormat.vacuum(spark, root, keepVersions = 1).isEmpty)
  }

  test("txn marker makes merge exactly-once: replayed batches no-op, even from a checkpoint") {
    val root = freshRoot()
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("id"))
    val b1 = rows((1L, 1L, true, "a"), (2L, 1L, true, "b"))
    val b2 = rows((1L, 2L, true, "a2"))
    def live() = LakeFormat.snapshot(spark, root).filter(col("live"))
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq
    val v1 = LakeFormat.merge(b1, root, txn = Some(("app", 1L)))
    // immediate replay: version unchanged, state unchanged
    assert(LakeFormat.merge(b1, root, txn = Some(("app", 1L))) === v1)
    assert(LakeFormat.state(spark, root).version === v1)
    // txn survives the checkpoint: replay AFTER checkpointing must still
    // no-op (the marker rides the parquet checkpoint, not just the JSONs)
    LakeFormat.checkpoint(spark, root)
    assert(LakeFormat.merge(b1, root, txn = Some(("app", 1L))) === v1)
    val v2 = LakeFormat.merge(b2, root, txn = Some(("app", 2L)))
    assert(v2 === v1 + 1)
    // a LATE replay of batch 1 (marker below the high-water mark) no-ops
    // instead of resurrecting the pre-update row
    assert(LakeFormat.merge(b1, root, txn = Some(("app", 1L))) === v2)
    assert(live() === Seq(1L -> "a2", 2L -> "b"))
    // a DIFFERENT app id is not gated by this app's marker
    LakeFormat.merge(rows((3L, 1L, true, "c")), root, txn = Some(("other", 1L)))
    assert(live() === Seq(1L -> "a2", 2L -> "b", 3L -> "c"))
  }

  test("streaming cdcApply lands envelope batches in the lake exactly like the batch fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val root = freshRoot()
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("id"))
    case class Raw(id: Long, lsn: Long, op: String, fn: String)
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
    val ck = Files.createTempDirectory("lake_ck").toString
    val q = streaming.LakeSink.cdcApply(toEnvelope(mem.toDF), root, "stream")
      .option("checkpointLocation", ck).start()
    mem.addData((1L, 1L, "c", "a"), (2L, 2L, "c", "b"))
    q.processAllAvailable()
    mem.addData((1L, 3L, "u", "a2"), (2L, 4L, "d", "b"))
    q.processAllAvailable(); q.stop()
    val live = LakeFormat.snapshot(spark, root).filter(col("live"))
      .select("id", "first_name").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(live === Seq(1L -> "a2"))
    // the tombstone for id=2 is stored, not lost
    assert(LakeFormat.snapshot(spark, root).filter(!col("live")).count() === 1L)
  }

  test("optimize compacts small files and z-order prunes on BOTH dimensions") {
    val root = freshRoot()
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("x", "y"))
    // 16 appends of 512 rows each: many small files, interleaved ranges
    // (every file spans the full x/y domain — nothing prunes)
    (0 until 16).foreach { i =>
      val ids = spark.range(512).select((col("id") * 16 + i).as("id"))
      LakeFormat.append(
        ids.select(col("id"), lit(1L).as("lsn"), lit(true).as("live"),
          // hash-scattered coordinates: every appended file spans the full
          // x/y domain, so nothing can prune until optimize clusters them
          pmod(xxhash64(col("id")), lit(64L)).as("x"),
          pmod(xxhash64(col("id") + 1000000L), lit(128L)).as("y")),
        root)
    }
    val before = LakeFormat.state(spark, root)
    assert(before.files.size >= 16)
    val preX = LakeFormat.scan(spark, root, col("x") < lit(8L))
    assert(preX.keptFiles === preX.totalFiles) // interleaved: no pruning
    val nX = preX.df.count()
    val nY = LakeFormat.scan(spark, root, col("y") < lit(16L)).df.count()
    // compact into 8 z-ordered files
    LakeFormat.optimize(spark, root,
      Seq(graft.operators.Partitioning.zValue(col("x"), col("y"), bits = 8)),
      targetFiles = 8)
    val after = LakeFormat.state(spark, root)
    assert(after.files.size <= 8)
    assert(LakeFormat.snapshot(spark, root).count() === 16L * 512)
    val sx = LakeFormat.scan(spark, root, col("x") < lit(8L))
    val sy = LakeFormat.scan(spark, root, col("y") < lit(16L))
    assert(sx.keptFiles < sx.totalFiles, s"x-prune: ${sx.keptFiles}/${sx.totalFiles}")
    assert(sy.keptFiles < sy.totalFiles, s"y-prune: ${sy.keptFiles}/${sy.totalFiles}")
    assert(sx.df.count() === nX && sy.df.count() === nY)
  }

  test("pruning stays conservative at the edges: NaN stats, narrowing casts, evolved columns") {
    // NaN lands in a double stats column (Spark's max orders NaN above
    // everything): the table must stay readable and the file kept
    val r1 = freshRoot()
    LakeFormat.create(spark, r1, Seq("id"), statsCols = Seq("x"))
    LakeFormat.append(Seq((1L, 1L, true, Double.NaN), (2L, 1L, true, 0.5))
      .toDF("id", "lsn", "live", "x"), r1)
    val s1 = LakeFormat.scan(spark, r1, col("x") <= lit(1.0))
    assert(s1.df.count() === 1L) // readable; an all-NaN file may prune (sound)
    // Spark orders NaN above every numeric — the NaN row must survive a
    // high-bound probe, so the stats ranking mirrors the engine's order
    assert(LakeFormat.scan(spark, r1, col("x") > lit(10.0)).df.count() === 1L)
    // a VALUE-CHANGING cast must not prune: x=5.9 has stats [5.9, 5.9]
    // but matches cast(x as int) = 5 — the file must be kept
    val r2 = freshRoot()
    LakeFormat.create(spark, r2, Seq("id"), statsCols = Seq("x"))
    LakeFormat.append(Seq((1L, 1L, true, 5.9)).toDF("id", "lsn", "live", "x"), r2)
    val s2 = LakeFormat.scan(spark, r2, col("x").cast("int") === lit(5))
    assert(s2.keptFiles === 1L && s2.df.count() === 1L)
    // a predicate on a schema-evolved column resolves regardless of which
    // vintage sorts last, including through a checkpointed log
    val r3 = freshRoot()
    LakeFormat.create(spark, r3, Seq("id"), statsCols = Seq("id"))
    LakeFormat.append(rows((1L, 1L, true, "old")), r3)
    LakeFormat.append(
      Seq((2L, 1L, true, "new", 42L)).toDF("id", "lsn", "live", "v", "extra"), r3)
    LakeFormat.checkpoint(spark, r3)
    val s3 = LakeFormat.scan(spark, r3, col("extra") === lit(42L))
    assert(s3.df.count() === 1L)
  }

  test("change feed classifies c/u/d per commit, drops carried-along rows, and OPTIMIZE is silent") {
    val root = freshRoot()
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("id"))
    // v1: blind append → all creates
    LakeFormat.append(rows((1L, 1L, true, "a"), (2L, 1L, true, "b"),
      (3L, 1L, true, "c")).coalesce(1), root)
    // v2: update id=1, delete id=2, insert id=4; id=3 is carried along the
    // file rewrite UNCHANGED (same single file holds all keys) → no row
    LakeFormat.merge(rows((1L, 2L, true, "a2"),
      (2L, 2L, false, null.asInstanceOf[String]), (4L, 2L, true, "dd")), root)
    // v3: OPTIMIZE rewrites everything with identical data → empty slice
    LakeFormat.optimize(spark, root, Seq(col("id")), targetFiles = 1)
    // v4: idempotent replay of v2's batch → folded state unchanged → empty
    LakeFormat.merge(rows((1L, 2L, true, "a2")), root)
    val feed = LakeFormat.changeFeed(spark, root, 1L, 4L)
      .select("_commit_version", "_change_type", "id", "v")
      .as[(Long, String, Long, Option[String])].collect().sortBy(r => (r._1, r._3))
    assert(feed.filter(_._1 == 1L).map(r => (r._2, r._3)).toSeq ===
      Seq(("c", 1L), ("c", 2L), ("c", 3L)))
    assert(feed.filter(_._1 == 2L).map(r => (r._2, r._3, r._4)).toSeq ===
      Seq(("u", 1L, Some("a2")), ("d", 2L, Some("b")), ("c", 4L, Some("dd"))))
    assert(feed.count(_._1 >= 3L) === 0) // optimize + replay: silent
    // feeding past the tip or from v0 refuses loudly
    intercept[IllegalArgumentException](LakeFormat.changeFeed(spark, root, 0L, 2L))
    intercept[IllegalArgumentException](LakeFormat.changeFeed(spark, root, 1L, 99L))
  }

  test("change feed survives duplicate-key appends and live/order-free append-only tables") {
    // duplicate keys stacked by blind appends: the diff folds each side to
    // the newest row per key, so an OPTIMIZE rewrite of the duplicate set
    // is SILENT (an unfolded join would multiply the dups into bogus 'u's)
    val r1 = freshRoot()
    LakeFormat.create(spark, r1, Seq("id"), statsCols = Seq("id"))
    LakeFormat.append(rows((1L, 1L, true, "a")).coalesce(1), r1)
    LakeFormat.append(rows((1L, 2L, true, "b")).coalesce(1), r1) // same key again
    LakeFormat.optimize(spark, r1, Seq(col("id")), targetFiles = 1)
    val f1 = LakeFormat.changeFeed(spark, r1, 1L, 3L)
      .select("_commit_version", "_change_type", "id")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(f1.toSeq === Seq((1L, "c", 1L), (2L, "c", 1L))) // optimize (v3): nothing
    // an append-only table with NO live/order columns feeds as all-creates
    val r2 = freshRoot()
    LakeFormat.create(spark, r2, Seq("id"), statsCols = Seq("id"))
    LakeFormat.append(spark.range(4).select(col("id"), (col("id") * 10).as("m")), r2)
    LakeFormat.optimize(spark, r2, Seq(col("id")), targetFiles = 1)
    val f2 = LakeFormat.changeFeed(spark, r2, 1L, 2L)
    assert(f2.filter(col("_change_type") === "c").count() === 4L)
    assert(f2.filter(col("_commit_version") === 2L).count() === 0L) // optimize silent
    // an all-txn range returns an EMPTY feed with the table's real schema
    val r3 = freshRoot()
    LakeFormat.create(spark, r3, Seq("id"), statsCols = Seq("id"))
    LakeFormat.merge(rows((1L, 1L, true, "a")), r3, txn = Some(("app", 1L)))
    LakeFormat.merge(rows((1L, 1L, true, "a")), r3, txn = Some(("app", 1L))) // replayed: txn-only? no — gated, no commit
    val v = LakeFormat.merge(spark.emptyDataset[(Long, Long, Boolean, String)]
      .toDF("id", "lsn", "live", "v"), r3, txn = Some(("app", 2L))) // txn-only commit
    val f3 = LakeFormat.changeFeed(spark, r3, v, v)
    assert(f3.count() === 0L && f3.columns.contains("v")
      && f3.columns.contains("_change_type"))
  }

  test("hive-partitioned tables: nested layout, typed read-back, partition pruning, partition-local merge, nested vacuum") {
    val root = freshRoot()
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("id"),
      partitionCols = Seq("day"))
    LakeFormat.append(
      spark.range(300).select(col("id"), lit(1L).as("lsn"),
        lit(true).as("live"), (col("id") % 3).as("day"),
        (col("id") * 2).as("m")).repartition(col("day")), root)
    val st = LakeFormat.state(spark, root)
    assert(st.files.nonEmpty
      && st.files.forall(_.path.matches("data/day=\\d+/[^/]+\\.parquet")))
    // read-back keeps the WRITTEN type (path re-inference would narrow
    // the long partition values to int)
    val snap = LakeFormat.snapshot(spark, root)
    assert(snap.schema("day").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(snap.count() === 300L)
    // partition pruning rides the singleton min=max stats
    val sc = LakeFormat.scan(spark, root, col("day") === lit(1L))
    assert(sc.keptFiles < sc.totalFiles, s"${sc.keptFiles}/${sc.totalFiles}")
    assert(sc.df.count() === 100L)
    // merge rewrites only the touched partition's files
    val pre = st.files.map(_.path).toSet
    LakeFormat.merge(Seq((0L, 2L, true, 0L, 99L))
      .toDF("id", "lsn", "live", "day", "m"), root)
    val post = LakeFormat.state(spark, root).files.map(_.path).toSet
    val removed = pre -- post
    assert(removed.nonEmpty && removed.forall(_.startsWith("data/day=0/")),
      s"rewrote outside the touched partition: $removed")
    assert((pre & post).exists(_.startsWith("data/day=1/"))
      && (pre & post).exists(_.startsWith("data/day=2/")))
    // vacuum walks the nested layout and reclaims exactly the rewrite
    val del = LakeFormat.vacuum(spark, root, keepVersions = 1, olderThanMs = 0L)
    assert(del.toSet === removed)
    val after = LakeFormat.snapshot(spark, root).filter(col("live"))
    assert(after.count() === 300L)
    assert(after.filter(col("id") === 0L).select("m").as[Long].head() === 99L)
  }

  test("pruning handles IN-lists and null-count probes") {
    val root = freshRoot()
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("x"))
    // file A: x ∈ [0,9], no nulls; file B: x ∈ [100,107] with 2 nulls;
    // file C: all-null x (min/max absent, nulls = rows)
    LakeFormat.append(spark.range(10).select(col("id"), lit(1L).as("lsn"),
      lit(true).as("live"), col("id").as("x")).coalesce(1), root)
    LakeFormat.append(spark.range(10).select((col("id") + 10).as("id"),
      lit(1L).as("lsn"), lit(true).as("live"),
      when(col("id") < 8, col("id") + 100).as("x")).coalesce(1), root)
    LakeFormat.append(spark.range(5).select((col("id") + 20).as("id"),
      lit(1L).as("lsn"), lit(true).as("live"),
      lit(null).cast("long").as("x")).coalesce(1), root)
    def probe(p: org.apache.spark.sql.Column) = LakeFormat.scan(spark, root, p)
    val in = probe(col("x").isin(3L, 5L))
    assert(in.keptFiles === 1L && in.df.count() === 2L)
    val farIn = probe(col("x").isin(50L, 60L)) // inside no file's range
    assert(farIn.keptFiles === 0L && farIn.df.count() === 0L)
    val isn = probe(col("x").isNull)
    assert(isn.keptFiles === 2L && isn.df.count() === 7L) // B's 2 + C's 5
    val nn = probe(col("x").isNotNull)
    assert(nn.keptFiles === 2L && nn.df.count() === 18L) // A's 10 + B's 8
    val ns = probe(col("x") <=> lit(105L))
    assert(ns.keptFiles === 1L && ns.df.count() === 1L)
    val nsNull = probe(col("x") <=> lit(null).cast("long"))
    assert(nsNull.keptFiles === 2L && nsNull.df.count() === 7L)
  }

  test("additive schema evolution: a new column appends and reads back widened") {
    val root = freshRoot()
    LakeFormat.create(spark, root, Seq("id"), statsCols = Seq("id"))
    LakeFormat.append(rows((1L, 1L, true, "old")), root)
    LakeFormat.append(
      Seq((2L, 1L, true, "new", 42L)).toDF("id", "lsn", "live", "v", "extra"), root)
    val snap = LakeFormat.snapshot(spark, root)
    assert(snap.columns.contains("extra"))
    val got = snap.select("id", "extra").as[(Long, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(1L -> None, 2L -> Some(42L)))
  }
}
