package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Staged, Tables}
import graft.sources.{LakeFormat, LakeTx}

/** Lakehouse-format catalog queries: the CDC changelog landed in a
  * [[graft.sources.LakeFormat]] table via transactional file-level MERGE
  * waves (the reference's replica-maintenance loop, ez-cdc main.py:29-39,
  * as table-format commits), then served through the snapshot, time-travel
  * and stats-pruned-scan read paths. Oracles are the ESTABLISHED CDC fold
  * SQL — the lake layer must be semantically invisible: materializing the
  * same changelog through 3 merge commits (including a delete wave) and
  * reading the committed table back must hash-equal folding the raw log.
  */
object Lake {
  type Q = (SparkSession, String) => DataFrame

  private def tempRoot(prefix: String): String = {
    val rootPath = java.nio.file.Files.createTempDirectory(prefix)
    // session scratch — reclaim at JVM exit (the x4v generation-store
    // discipline) so repeated bench/test runs don't accumulate tables
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      if (Files.exists(rootPath))
        Files.walk(rootPath).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => { Files.deleteIfExists(p); () })
    }))
    rootPath.toString
  }

  /** Staged customer lake: the synthetic changelog applied in three
    * LSN-banded MERGE waves — initial load (r/c), updates (u), deletes
    * (d) — so every registered read exercises a table that went through
    * insert, update AND tombstone maintenance, then a checkpoint (replay
    * shortcut) and a vacuum with all three data versions retained — which
    * must reclaim NOTHING, so the time-travel read below doubles as the
    * retention-safety check. The staged 1-row frame
    * carries the root so the build cost lands in the bench `staging`
    * attribution, and the timed queries measure the SERVE. */
  def stagedCustomerLakeRoot(spark: SparkSession, dir: String): String =
    Staged(spark, s"lake_customer:$dir") {
      val root = tempRoot("graft_lake_cust")
      LakeFormat.create(spark, root, keyCols = Seq("id"), orderCol = "lsn",
        liveCol = "live", statsCols = Seq("id"))
      val chg = Cdc.changelog(spark, dir)
      def wave(pred: Column): DataFrame =
        Cdc.snapshotWithTombstones(chg.filter(pred))
      val band = col("source.lsn") % 100
      LakeFormat.merge(wave(band <= 1), root)                      // v1: r/c
      LakeFormat.merge(wave(band.between(2, 3)), root)             // v2: u
      LakeFormat.merge(wave(band === 4), root)                     // v3: d
      LakeFormat.checkpoint(spark, root)
      LakeFormat.vacuum(spark, root, keepVersions = 3, olderThanMs = 0L)
      spark.range(1).select(lit(root).as("root"))
    }.head().getString(0)

  /** The committed live view: snapshot minus tombstones — must equal the
    * one-shot fold of the raw changelog (cdcSnapshotSql VERBATIM). */
  val lakeCdcSnapshot: Q = (spark, dir) => {
    val root = stagedCustomerLakeRoot(spark, dir)
    LakeFormat.snapshot(spark, root)
      .filter(col("live"))
      .select(col("id"), col("first_name"), col("last_name"), col("email"))
      .orderBy(col("id"))
  }

  /** Time travel to v2 — the table BEFORE the delete wave: both update
    * events applied, no tombstones yet. The oracle folds the raw log
    * restricted to the same LSN band, proving the historical read is the
    * real pre-delete state, not the current one. */
  val lakeTimeTravel: Q = (spark, dir) => {
    val root = stagedCustomerLakeRoot(spark, dir)
    LakeFormat.readAsOf(spark, root, 2L)
      .filter(col("live"))
      .select(col("id"), col("first_name"), col("last_name"), col("email"))
      .orderBy(col("id"))
  }
  val lakeTimeTravelSql: String = Cdc.changelogCte +
    """
      |SELECT id, a_fn AS first_name, a_ln AS last_name, a_em AS email
      |FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn
      |      FROM chg WHERE lsn % 100 <= 3)
      |WHERE rn = 1 AND op <> 'd'
      |ORDER BY id""".stripMargin

  /** Staged lineitem lake: one range-layout append (repartitionByRange on
    * the stats column ⇒ near-disjoint per-file key ranges), the layout a
    * 100 TB fact table is compacted into so key-range predicates prune. */
  def stagedLineitemLakeRoot(spark: SparkSession, dir: String): String =
    Staged(spark, s"lake_lineitem:$dir") {
      val root = tempRoot("graft_lake_li")
      LakeFormat.create(spark, root, keyCols = Seq("l_orderkey"),
        orderCol = "l_orderkey", liveCol = "live",
        statsCols = Seq("l_orderkey"))
      LakeFormat.append(
        Tables.lineitem(spark, dir)
          .repartitionByRange(8, col("l_orderkey")), root)
      spark.range(1).select(lit(root).as("root"))
    }.head().getString(0)

  /** Stats-pruned scan: the key-range predicate resolves against per-file
    * min/max from the LOG (no file opened to decide) — LakeSpec asserts
    * the pruning ratio; this oracle proves the pruned read misses no row.
    * Integer-exact aggregate (TPC-H quantities are integral). */
  val lakePruneScan: Q = (spark, dir) => {
    val root = stagedLineitemLakeRoot(spark, dir)
    LakeFormat.scan(spark, root, col("l_orderkey") <= lit(1000L)).df
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }
  val lakePruneScanSql: String =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem WHERE l_orderkey <= 1000
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** The same pruned aggregate as `lake_prune_scan`, entered through
    * Spark's DATA SOURCE resolution — `spark.read.format("graft-lake")`
    * over the SAME staged table — so the oracle gates the whole batch
    * provider round trip: relation schema, pushed-filter translation
    * into the stats pruning ([[graft.sources.GraftLakeProvider]]), and
    * Catalyst column pruning through the V1 relation. */
  val lakeBatchSource: Q = (spark, dir) => {
    val root = stagedLineitemLakeRoot(spark, dir)
    spark.read.format("graft-lake").load(root)
      .filter(col("l_orderkey") <= lit(1000L))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** Staged z-ordered lineitem lake: appended in the source's own layout
    * (interleaved key ranges — every file overlaps every predicate), then
    * OPTIMIZE'd on the Morton z-value of (l_orderkey, l_partkey) — the
    * multi-dimensional clustering that makes per-file min/max stats prune
    * on BOTH dimensions (a single-column sort prunes only its own).
    * 21 interleave bits cover key domains to 2M (the fixture SF ceiling;
    * a production table sizes bits to its domain). */
  def stagedZorderLakeRoot(spark: SparkSession, dir: String): String =
    Staged(spark, s"lake_zorder:$dir") {
      val root = tempRoot("graft_lake_z")
      LakeFormat.create(spark, root, keyCols = Seq("l_orderkey"),
        orderCol = "l_orderkey", liveCol = "live",
        statsCols = Seq("l_orderkey", "l_partkey"))
      LakeFormat.append(Tables.lineitem(spark, dir), root)
      LakeFormat.optimize(spark, root,
        Seq(Partitioning.zValue(col("l_orderkey"), col("l_partkey"), bits = 21)),
        targetFiles = 8)
      spark.range(1).select(lit(root).as("root"))
    }.head().getString(0)

  /** Two-dimensional predicate over the z-ordered layout: the oracle
    * proves the pruned read misses no row; LakeSpec asserts the pruning
    * ratio on both dimensions independently. */
  val lakeZorderScan: Q = (spark, dir) => {
    val root = stagedZorderLakeRoot(spark, dir)
    LakeFormat.scan(spark, root,
      col("l_orderkey") <= lit(1500L) && col("l_partkey") <= lit(100L)).df
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }
  val lakeZorderScanSql: String =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem WHERE l_orderkey <= 1500 AND l_partkey <= 100
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Change data feed over the three merge waves: the lake as a CDC
    * PRODUCER — row-level c/u/d changes reconstructed from the
    * file-level log alone (pre-image in removed files, post-image in
    * added files). The oracle re-derives the same changes from the raw
    * changelog: wave-1 fold = creates, wave-2 rows whose payload moved =
    * updates, wave-3 tombstoned ids = deletes carrying the pre-image. */
  val lakeChangeFeed: Q = (spark, dir) => {
    val root = stagedCustomerLakeRoot(spark, dir)
    LakeFormat.changeFeed(spark, root, 1L, 3L)
      .orderBy(col("_commit_version"), col("id"))
  }
  val lakeChangeFeedSql: String = Cdc.changelogCte +
    """
      |, f1 AS (SELECT id, a_fn AS fn, a_ln AS ln, a_em AS em FROM (
      |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn
      |    FROM chg WHERE lsn % 100 <= 1) WHERE rn = 1 AND op <> 'd'),
      |f2 AS (SELECT id, a_fn AS fn, a_ln AS ln, a_em AS em FROM (
      |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn
      |    FROM chg WHERE lsn % 100 <= 3) WHERE rn = 1 AND op <> 'd'),
      |del AS (SELECT id FROM chg WHERE op = 'd')
      |SELECT id, fn AS first_name, ln AS last_name, em AS email,
      |  'c' AS _change_type, CAST(1 AS BIGINT) AS _commit_version FROM f1
      |UNION ALL
      |SELECT f2.id, f2.fn, f2.ln, f2.em, 'u', CAST(2 AS BIGINT)
      |FROM f2 JOIN f1 ON f2.id = f1.id
      |WHERE f2.fn IS DISTINCT FROM f1.fn OR f2.ln IS DISTINCT FROM f1.ln
      |   OR f2.em IS DISTINCT FROM f1.em
      |UNION ALL
      |SELECT f2.id, f2.fn, f2.ln, f2.em, 'd', CAST(3 AS BIGINT)
      |FROM f2 JOIN del ON f2.id = del.id
      |ORDER BY _commit_version, id""".stripMargin

  /** The change feed read as a BATCH TABLE through data-source
    * resolution (`option("readChangeFeed", "true")` — the public Delta
    * `table_changes` shape), over the SAME staged table and commit
    * range as `lake_change_feed`: the oracle (lakeChangeFeedSql
    * VERBATIM) gates the whole relation path — schema pinning, range
    * options, and the per-commit diff plans behind the V1 scan. */
  val lakeCdfBatch: Q = (spark, dir) => {
    val root = stagedCustomerLakeRoot(spark, dir)
    spark.read.format("graft-lake")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").option("endingVersion", "3")
      .load(root)
      .orderBy(col("_commit_version"), col("id"))
  }

  /** Staged LAKE-FED BM25 postings: the documents corpus lands in a lake
    * table through seven maintenance merges (three insert waves, a
    * corrupting rewrite of the %10 docs, their restore, tombstone
    * deletes of the %7 docs, their re-insert — the x4t schedule, as
    * TABLE COMMITS), and the durable T30 postings store is maintained by
    * TAILING THE TABLE'S CHANGE FEED with a durable consumer offset
    * ([[graft.streaming.Streams.postingsFromLake]]) — the replica →
    * serving-index chain closed through the storage layer: no raw
    * changelog subscription, no table re-read, one epoch per commit.
    * The drain runs TWICE: the second pass must apply nothing (the
    * offset discipline witnessed in-plan, not just in specs). */
  def stagedLakeFedPostingsDir(spark: SparkSession, dir: String): String =
    stagedLakeFedPostings(spark, dir)._1

  /** (postings dir, lake table root) — the root is exposed so the
    * STREAMING-source twin ([[stagedStreamFedPostingsDir]]) can tail the
    * SAME staged table instead of paying the seven-wave producer twice. */
  def stagedLakeFedPostings(spark: SparkSession, dir: String): (String, String) = {
    val r = stagedLakeFedPostingsRow(spark, dir).head()
    (r.getString(0), r.getString(1))
  }

  private def stagedLakeFedPostingsRow(spark: SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Staged(spark, s"lake_bm25:$dir") {
      val scratch = tempRoot("graft_lake_bm25")
      val root = s"$scratch/table"
      val consumerDir = s"$scratch/consumer"
      val postingsDir = s"$scratch/postings"
      LakeFormat.create(spark, root, keyCols = Seq("doc_id"),
        orderCol = "lsn", liveCol = "live", statsCols = Seq("doc_id"))
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      def up(d: org.apache.spark.sql.DataFrame, lsn: Long) =
        d.withColumn("lsn", lit(lsn)).withColumn("live", lit(true))
      def del(d: org.apache.spark.sql.DataFrame, lsn: Long) =
        d.select(col("doc_id"), lit(null).cast("string").as("text"),
          lit(lsn).as("lsn"), lit(false).as("live"))
      LakeFormat.merge(up(docs.filter(col("doc_id") % 3 === 0), 1L), root)
      LakeFormat.merge(up(docs.filter(col("doc_id") % 3 === 1), 2L), root)
      LakeFormat.merge(up(docs.filter(col("doc_id") % 3 === 2), 3L), root)
      LakeFormat.merge(up(docs.filter(col("doc_id") % 10 === 0)
        .withColumn("text", concat(col("text"), lit(" corrupted"))), 4L), root)
      LakeFormat.merge(up(docs.filter(col("doc_id") % 10 === 0), 5L), root)
      LakeFormat.merge(del(docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id")), 6L), root)
      LakeFormat.merge(up(docs.filter(col("doc_id") % 7 === 0), 7L), root)
      val applied = graft.streaming.Streams.postingsFromLake(
        spark, root, consumerDir, postingsDir)
      require(applied == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L),
        s"lake drain applied $applied, expected commits 1..7")
      val replay = graft.streaming.Streams.postingsFromLake(
        spark, root, consumerDir, postingsDir)
      require(replay.isEmpty,
        s"replayed drain must no-op past the offset, applied $replay")
      spark.range(1).select(lit(postingsDir).as("dir"), lit(root).as("root"))
    }

  /** BM25 served from the lake-fed maintained index: the seven commits
    * converge to the plain corpus, so the folded store must reproduce
    * the batch x4r answer HASH-EXACTLY (oracle = x4rSql verbatim) —
    * corrupt/restore as feed `u`s, delete as `d` tombstones, re-insert
    * as `c`s, all composed through change-feed classification, the
    * offset-gated drain, and the winner-batch fold. */
  val lakeBm25Index: Q = (spark, dir) => {
    val postingsDir = stagedLakeFedPostingsDir(spark, dir)
    graft.streaming.Streams.servedBm25(spark, postingsDir, Text.bm25Terms)
  }

  /** Staged STREAM-FED postings: the SAME staged lake table (producer
    * shared with [[stagedLakeFedPostingsDir]] — no second seven-wave
    * pass) maintained into a SECOND postings store through a REAL
    * StreamingQuery over the `graft-lake` source
    * ([[graft.sources.GraftLakeProvider]]): offsets live in the Spark
    * CHECKPOINT's offset log, not a hand-rolled consumer dir. The drive
    * is deliberately a KILL/RESTART: query 1 runs ONE rate-limited
    * trigger (Trigger.Once, maxCommitsPerTrigger=4 → lake commits 1-4)
    * and terminates; query 2 starts on the SAME checkpointLocation with
    * no other state and must resume at commit 5 from the engine's
    * offset log alone — recovery witnessed in-plan, not just in specs.
    */
  def stagedStreamFedPostingsDir(spark: SparkSession, dir: String): String =
    Staged(spark, s"lake_stream_bm25:$dir") {
      val tableRoot = stagedLakeFedPostings(spark, dir)._2
      val scratch = tempRoot("graft_lake_stream_bm25")
      val postingsDir = s"$scratch/postings"
      val ck = s"$scratch/ck"
      def writer = spark.readStream.format("graft-lake")
        .option("maxCommitsPerTrigger", "4").load(tableRoot)
        .writeStream.option("checkpointLocation", ck)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) =>
            graft.streaming.Streams.postingsApplyFeedBatch(b.toDF, postingsDir)
        }
      val q1 = writer
        .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
      q1.awaitTermination() // one capped batch: commits 1-4, then stop
      val q2 = writer.start() // restart from the checkpoint ALONE
      q2.processAllAvailable()
      q2.stop(); q2.awaitTermination()
      spark.range(1).select(lit(postingsDir).as("dir"))
    }.head().getString(0)

  /** BM25 served from the STREAM-fed postings store: must equal the
    * drain-fed `lake_bm25_index` and the batch x4r answer HASH-EXACTLY
    * (oracle = x4rSql verbatim) — the per-commit change-feed plans are
    * identical; only the offset management moved into Spark's streaming
    * checkpoint, through a mid-stream restart. */
  val lakeStreamIndex: Q = (spark, dir) => {
    val postingsDir = stagedStreamFedPostingsDir(spark, dir)
    graft.streaming.Streams.servedBm25(spark, postingsDir, Text.bm25Terms)
  }

  /** Staged MULTI-TABLE transactional lake: the C14 fixture — customers
    * and orders changelogs restricted to transactions complete at the
    * 60% cutoff — lands in TWO member tables of one [[LakeTx]] root
    * through three cross-table transaction waves (LSN-banded, each wave
    * carrying BOTH tables' folded updates in ONE commitTx), so every
    * wave exercises the atomic two-table manifest publish. A replay of
    * the last wave (same app/txv) must no-op without a new manifest
    * version — exactly-once witnessed in-plan. */
  def stagedMultiTableTxRoot(spark: SparkSession, dir: String): String =
    Staged(spark, s"lake_tx:$dir") {
      val root = tempRoot("graft_lake_tx")
      val cust = Cdc.changelog(spark, dir)
      val ords = Cdc.ordersChangelog(spark, dir)
      val cutoff = cust.select(col("source.lsn").as("lsn"))
        .unionAll(ords.select(col("source.lsn").as("lsn")))
        .agg(expr("max(lsn) * 6 DIV 10").as("cutoff"))
      val Seq(custC, ordsC) = Cdc.multiTableCompleteTx(Seq(cust, ords), cutoff)
      LakeFormat.create(spark, LakeTx.tableRoot(root, "customers"),
        keyCols = Seq("id"), statsCols = Seq("id"))
      LakeFormat.create(spark, LakeTx.tableRoot(root, "orders"),
        keyCols = Seq("id"), statsCols = Seq("id"))
      LakeTx.init(spark, root, Seq("customers", "orders"))
      // three lsn%3-banded waves — a residue banding covers BOTH logs'
      // lsn domains (the customer fixture stripes lsn%100 low, the
      // orders fixture high), and orderCol=lsn makes wave order
      // irrelevant: a key whose events span bands folds to its true
      // newest event regardless of which wave landed first
      def wave(i: Long) = Map(
        "customers" -> Cdc.snapshotWithTombstones(
          custC.filter(col("source.lsn") % 3 === i)),
        "orders" -> Cdc.latestWithTombstonesBy(
          ordsC.filter(col("source.lsn") % 3 === i), Seq("id")))
      (0L to 2L).foreach(i =>
        LakeTx.commitTx(spark, root, wave(i), app = "lake_tx_stage", txv = i))
      val mv = LakeTx.manifestVersion(spark, root)
      val replay = LakeTx.commitTx(spark, root, wave(2L),
        app = "lake_tx_stage", txv = 2L)
      require(replay == mv,
        s"replayed tx must publish no new manifest: $mv -> $replay")
      spark.range(1).select(lit(root).as("root"))
    }.head().getString(0)

  /** The C14 replica join served from the TRANSACTIONAL lake: both
    * member tables read through one manifest (never half a distributed
    * tx), live rows joined orders→customers — must hash-equal the C14
    * fold of the raw changelogs (cdcMultitableSnapshotSql VERBATIM),
    * proving the manifest-pinned two-table read is exactly the
    * transaction-consistent snapshot. */
  val lakeMultitableTx: Q = (spark, dir) => {
    val root = stagedMultiTableTxRoot(spark, dir)
    val snapC = LakeTx.snapshot(spark, root, "customers").filter(col("live"))
    val snapO = LakeTx.snapshot(spark, root, "orders").filter(col("live"))
    snapO.select(col("id").as("orderkey"), col("custkey"),
        col("status"), col("total"))
      .join(snapC.select(col("id").as("custkey"), col("first_name"),
        col("email")), "custkey")
      .select(col("orderkey"), col("custkey"), col("first_name"),
        col("email"), col("status"), col("total"))
      .orderBy(col("orderkey"))
  }

  /** Staged DML lake: the lineitem table landed range-laid-out, then hit
    * with the two direct user-facing table operations — a predicate
    * UPDATE (zero out the %100==7 orders' quantities) and a predicate
    * DELETE (drop the %10==3 orders entirely — the GDPR-erasure shape:
    * one call, stats-pruned + scan-confirmed, only matching files
    * rewritten, no fabricated CDC batch). The staged frame carries the
    * root; the registered query times the post-DML read. */
  def stagedDmlLakeRoot(spark: SparkSession, dir: String): String =
    Staged(spark, s"lake_dml:$dir") {
      val root = tempRoot("graft_lake_dml")
      LakeFormat.create(spark, root, keyCols = Seq("l_orderkey"),
        orderCol = "l_orderkey", liveCol = "live",
        statsCols = Seq("l_orderkey"))
      LakeFormat.append(Tables.lineitem(spark, dir)
        .repartitionByRange(8, col("l_orderkey")), root)
      LakeFormat.update(spark, root, col("l_orderkey") % 100 === 7,
        Map("l_quantity" -> lit(0.0)))
      LakeFormat.delete(spark, root, col("l_orderkey") % 10 === 3)
      spark.range(1).select(lit(root).as("root"))
    }.head().getString(0)

  /** Aggregate over the DML'd table: deleted orders contribute NOTHING
    * (physical removal — no tombstone residue in the current version),
    * updated orders contribute zero quantity; the oracle re-derives the
    * same state from the raw table with WHERE + CASE. Integer-exact. */
  val lakeDmlScan: Q = (spark, dir) => {
    val root = stagedDmlLakeRoot(spark, dir)
    LakeFormat.snapshot(spark, root)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }
  val lakeDmlScanSql: String =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(CASE WHEN l_orderkey % 100 = 7 THEN 0.0
      |                    ELSE l_quantity END AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem WHERE l_orderkey % 10 <> 3
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Staged CONSUMER REPLAY of the multi-table feed: drain the staged
    * [[stagedMultiTableTxRoot]] root's manifest versions through
    * [[graft.sources.LakeTx.consumeChanges]] into per-table EPOCH stores
    * (`<table>/b=<manifestV>` dirs — the T30 store discipline: one
    * idempotent overwrite per (table, version), tombstones as dead
    * rows), draining twice so the second pass must deliver nothing.
    * This is S7's read half exercised end-to-end: a downstream replica
    * maintained purely from transaction-aligned increments. */
  def stagedTxFeedStoreDir(spark: SparkSession, dir: String): String =
    Staged(spark, s"lake_tx_feed:$dir") {
      val root = stagedMultiTableTxRoot(spark, dir)
      val out = tempRoot("graft_lake_txfeed")
      val cons = s"$out/_offset"
      def drain(): Seq[Long] =
        LakeTx.consumeChanges(spark, root, cons) { (t, batch, mv) =>
          batch.withColumn("__live", col("_change_type") =!= "d")
            .drop("_change_type", "_commit_version")
            .write.mode("overwrite").parquet(s"$out/$t/b=$mv")
        }
      val applied = drain()
      require(applied.nonEmpty, "feed drain delivered no manifest versions")
      require(drain().isEmpty,
        "replayed feed drain must no-op past the durable offset")
      spark.range(1).select(lit(out).as("dir"))
    }.head().getString(0)

  /** The C14 replica join REBUILT FROM THE FEED alone: fold each member's
    * epoch store to the newest manifest version per key (tombstones
    * filtered after the fold), join — must hash-equal the direct
    * manifest-pinned read (lake_multitable_tx) and therefore the C14
    * fold of the raw changelogs (cdcMultitableSnapshotSql VERBATIM):
    * the incremental consumer loses nothing the table has. */
  val lakeTxFeedJoin: Q = (spark, dir) => {
    val out = stagedTxFeedStoreDir(spark, dir)
    def serve(table: String): DataFrame = {
      val df = spark.read.parquet(s"$out/$table") // partition col b = manifestV
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("b").desc)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1 && col("__live"))
        .drop("__rn", "__live", "b")
    }
    serve("orders").select(col("id").as("orderkey"), col("custkey"),
        col("status"), col("total"))
      .join(serve("customers").select(col("id").as("custkey"),
        col("first_name"), col("email")), "custkey")
      .select(col("orderkey"), col("custkey"), col("first_name"),
        col("email"), col("status"), col("total"))
      .orderBy(col("orderkey"))
  }

  /** STATS-PRUNED TIME TRAVEL through data-source resolution: the DML'd
    * table read AS OF v1 — BEFORE the update and delete waves — with a
    * key-range predicate, entered via `option("versionAsOf", 1)` +
    * `.filter`. The pinned-version relation routes the pushed filter
    * into [[graft.sources.LakeFormat.scanAsOf]] (per-file min/max
    * pruning over the HISTORICAL version's file set — stats are
    * recorded at commit and immutable, so yesterday's version prunes
    * like today's); the oracle is lakePruneScanSql VERBATIM (v1 is the
    * raw appended lineitem), proving the historical pruned read misses
    * no row the later DML would have hidden. LakeSpec asserts the
    * pruning ratio at the pinned historical version. */
  val lakeAsofPrune: Q = (spark, dir) => {
    val root = stagedDmlLakeRoot(spark, dir)
    spark.read.format("graft-lake").option("versionAsOf", "1").load(root)
      .filter(col("l_orderkey") <= lit(1000L))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** The lake table through the SQL CATALOG — `CREATE TABLE ... USING
    * graft-lake OPTIONS (path ...)` then a plain `spark.sql` SELECT:
    * the first thing a SQL-first user does with a table format. The V1
    * [[graft.sources.GraftLakeProvider]] resolves behind the catalog
    * entry, so the SELECT's WHERE feeds the same pushed-filter stats
    * pruning as the DataFrame path; oracle = lakePruneScanSql VERBATIM
    * over the same staged table as `lake_prune_scan`/`lake_batch_source`
    * — three entry points (API, source, catalog SQL), one answer. */
  val lakeSqlSource: Q = (spark, dir) => {
    val root = stagedLineitemLakeRoot(spark, dir)
    val tbl = "graft_lake_lineitem"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING `graft-lake` OPTIONS (path '$root')")
    spark.sql(
      s"""SELECT l_returnflag, count(*) AS n,
         | sum(CAST(l_quantity AS LONG)) AS sum_qty
         |FROM $tbl WHERE l_orderkey <= 1000
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** Staged WRITER-PATH lake: the table is built entirely through the
    * SQL write surface — `CREATE TABLE ... USING graft-lake AS SELECT`
    * lands the even-key half (CTAS → CreatableRelationProvider:
    * create-from-options + first append), `INSERT INTO` lands the odd
    * half (InsertableRelation.append), and `INSERT OVERWRITE` replaces
    * the whole contents with the full corpus in ONE atomic commit
    * (history intact: the pre-overwrite version is asserted
    * time-travelable). Three write forms, three commits, one final
    * state. */
  def stagedCtasLakeRoot(spark: SparkSession, dir: String): String =
    Staged(spark, s"lake_ctas:$dir") {
      val root = tempRoot("graft_lake_ctas")
      val tbl = "graft_lake_ctas_li"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      Tables.lineitem(spark, dir).createOrReplaceTempView("li_all_v")
      spark.sql(
        s"""CREATE TABLE $tbl USING `graft-lake`
           |OPTIONS (path '$root', keyCols 'l_orderkey')
           |AS SELECT * FROM li_all_v WHERE l_orderkey % 2 = 0""".stripMargin)
      spark.sql(s"INSERT INTO $tbl SELECT * FROM li_all_v WHERE l_orderkey % 2 = 1")
      spark.sql(s"INSERT OVERWRITE $tbl SELECT * FROM li_all_v")
      val vs = graft.sources.LakeFormat.state(spark, root).version
      require(vs == 3L, s"CTAS+INSERT+OVERWRITE must commit v1..v3, tip=$vs")
      // the replaced (two-append) version stays time-travelable
      val preOverwrite = graft.sources.LakeFormat.readAsOf(spark, root, 2L).count()
      val now = graft.sources.LakeFormat.snapshot(spark, root).count()
      require(preOverwrite == now,
        s"pre-overwrite history must serve the same rows: $preOverwrite vs $now")
      spark.range(1).select(lit(root).as("root"))
    }.head().getString(0)

  /** The lake_prune_scan aggregate over the WRITER-BUILT table: CTAS +
    * INSERT INTO + INSERT OVERWRITE converge to the plain lineitem
    * corpus, so the oracle is lakePruneScanSql VERBATIM — the whole SQL
    * write surface (create-from-options, positional insert resolution,
    * atomic overwrite) gated by the same hash the read paths answer. */
  val lakeCtasInsert: Q = (spark, dir) => {
    val root = stagedCtasLakeRoot(spark, dir)
    spark.read.format("graft-lake").load(root)
      .filter(col("l_orderkey") <= lit(1000L))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Map[String, Q] = Map(
    "lake_asof_prune" -> lakeAsofPrune,
    "lake_sql_source" -> lakeSqlSource,
    "lake_ctas_insert" -> lakeCtasInsert,
    "lake_change_feed" -> lakeChangeFeed,
    "lake_cdf_batch" -> lakeCdfBatch,
    "lake_cdc_snapshot" -> lakeCdcSnapshot,
    "lake_time_travel" -> lakeTimeTravel,
    "lake_prune_scan" -> lakePruneScan,
    "lake_batch_source" -> lakeBatchSource,
    "lake_zorder_scan" -> lakeZorderScan,
    "lake_bm25_index" -> lakeBm25Index,
    "lake_stream_index" -> lakeStreamIndex,
    "lake_multitable_tx" -> lakeMultitableTx,
    "lake_tx_feed" -> lakeTxFeedJoin,
    "lake_dml_scan" -> lakeDmlScan)

  val oracle: Map[String, String] = Map(
    "lake_asof_prune" -> lakePruneScanSql,
    "lake_sql_source" -> lakePruneScanSql,
    "lake_ctas_insert" -> lakePruneScanSql,
    "lake_change_feed" -> lakeChangeFeedSql,
    "lake_cdf_batch" -> lakeChangeFeedSql,
    "lake_cdc_snapshot" -> Cdc.cdcSnapshotSql,
    "lake_time_travel" -> lakeTimeTravelSql,
    "lake_prune_scan" -> lakePruneScanSql,
    "lake_batch_source" -> lakePruneScanSql,
    "lake_zorder_scan" -> lakeZorderScanSql,
    "lake_bm25_index" -> Text.x4rSql,
    "lake_stream_index" -> Text.x4rSql,
    "lake_multitable_tx" -> Cdc.cdcMultitableSnapshotSql,
    "lake_tx_feed" -> Cdc.cdcMultitableSnapshotSql,
    "lake_dml_scan" -> lakeDmlScanSql)
}
