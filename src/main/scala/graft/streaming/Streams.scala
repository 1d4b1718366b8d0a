package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.Schemas.{CdcEvent, CdcRow}

/** Structured Streaming surface (SURVEY.md §2.2 T1–T7). Every combinator
  * takes a DataFrame/Dataset that may be batch or streaming — the same
  * declarative plan runs under MicroBatchExecution when the source is a
  * stream (`readStream` / MemoryStream) and under normal batch execution
  * otherwise, which is exactly how the specs cross-check streaming results
  * against the batch oracle-verified forms.
  *
  * The reference consumes a Kafka CDC topic (`main.py:21-26`); in
  * production this surface reads `spark.readStream.format("kafka")
  * .option("subscribe", topic)` — no broker ships in this environment, so
  * tests drive MemoryStream (S2 stand-in per SURVEY.md §2.2).
  */
// Serializable: stateful-operator closures (the expiring gate's keyed
// function) capture this module when they call its private helpers
object Streams extends Serializable {

  /** T1 — tumbling-window counts per event type. */
  def tumblingCounts(events: DataFrame, width: String = "10 minutes"): DataFrame =
    events.groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** T2 — sliding-window counts (width, slide). */
  def slidingCounts(events: DataFrame, width: String = "10 minutes",
      slide: String = "5 minutes"): DataFrame =
    events.groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** T3 — session windows per user (gap-based). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n"))

  /** T4 — event-time watermark: bounds state and drops data later than
    * `delay` behind the max observed event time.
    */
  def withLateness(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay)

  /** T5 — streaming dedup by event id with watermark-bounded state (the
    * at-least-once → exactly-once repair for the reference's autocommit
    * consumer, `main.py:52-53`).
    */
  def dedupEvents(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicates("event_id")

  /** T5b — watermark-scoped dedup: unlike dropDuplicates (which keys state
    * on event_id forever unless the watermark column is part of the key),
    * dropDuplicatesWithinWatermark expires each key's state once the
    * watermark passes it — bounded state for unbounded streams.
    */
  def dedupWithinWatermark(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")

  // ------------------------------------------------------------------ T6
  /** Per-key running-snapshot state: the streaming twin of batch
    * Cdc.snapshot (C4). Key-partitioned state via flatMapGroupsWithState —
    * scales horizontally with executors; state per key is O(1) (latest lsn
    * + row image).
    */
  case class SnapState(lsn: Long, live: Boolean,
      first_name: Option[String], last_name: Option[String], email: Option[String])
  case class SnapUpdate(id: Long, live: Boolean, lsn: Long,
      first_name: Option[String], last_name: Option[String], email: Option[String])

  /** The shared per-key fold: the winning (max-lsn) incoming event against
    * the prior state; None when the batch is stale/out-of-order — the SAME
    * state transition drives both the flatMapGroupsWithState form (T6) and
    * the transformWithState form (T11), so the two APIs cannot drift.
    */
  def advance(id: Long, prior: Option[SnapState],
      incoming: Seq[CdcEvent]): Option[SnapState] = {
    if (incoming.isEmpty) None
    else {
      val best = incoming.maxBy(e => e.source.lsn.getOrElse(Long.MinValue))
      val bestLsn = best.source.lsn.getOrElse(Long.MinValue)
      if (prior.exists(_.lsn >= bestLsn)) None // stale / out-of-order
      else if (best.op == "d") Some(SnapState(bestLsn, live = false, None, None, None))
      else {
        val row = best.after.getOrElse(CdcRow(id, None, None, None))
        Some(SnapState(bestLsn, live = true, row.first_name, row.last_name, row.email))
      }
    }
  }

  def foldKey(id: Long, events: Iterator[CdcEvent],
      state: GroupState[SnapState]): Iterator[SnapUpdate] =
    advance(id, state.getOption, events.toSeq) match {
      case None => Iterator.empty
      case Some(next) =>
        state.update(next)
        Iterator.single(SnapUpdate(id, next.live, next.lsn,
          next.first_name, next.last_name, next.email))
    }

  /** T6 — running CDC snapshot as an update stream; emit one row per key
    * per micro-batch when its state advanced. Works on batch Datasets too
    * (state starts empty, one "batch").
    */
  def snapshotStream(events: Dataset[CdcEvent]): Dataset[SnapUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      // keyless events (both images null — e.g. Debezium TRUNCATE/message
      // records) carry no row state; dropping them up front keeps them from
      // collapsing into one shared phantom key
      .filter(e => e.after.orElse(e.before).isDefined)
      .groupByKey(e => e.after.orElse(e.before).map(_.id).get)
      .flatMapGroupsWithState[SnapState, SnapUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(foldKey)
  }

  // ----------------------------------------------------------------- T11
  /** T11 — the same running snapshot on the Spark 4 arbitrary-state API
    * (`transformWithState` + [[StatefulProcessor]]), the successor to
    * flatMapGroupsWithState: typed named state ([[ValueState]]) with
    * per-state TTL support, timers decoupled from output mode, and state
    * evolution across query versions. Requires the RocksDB state store
    * provider (`spark.sql.streaming.stateStore.providerClass`); state per
    * key is the same O(1) (lsn, row image) record as T6, and the state
    * transition is the SAME [[advance]] fold, spec-asserted equivalent.
    */
  class SnapshotProcessor extends StatefulProcessor[Long, CdcEvent, SnapUpdate] {
    @transient private var latest: ValueState[SnapState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[SnapState]("latest",
        Encoders.product[SnapState], TTLConfig.NONE)

    override def handleInputRows(id: Long, rows: Iterator[CdcEvent],
        timerValues: TimerValues): Iterator[SnapUpdate] = {
      val prior = if (latest.exists()) Some(latest.get()) else None
      advance(id, prior, rows.toSeq) match {
        case None => Iterator.empty
        case Some(next) =>
          latest.update(next)
          Iterator.single(SnapUpdate(id, next.live, next.lsn,
            next.first_name, next.last_name, next.email))
      }
    }
  }

  def snapshotStreamTws(events: Dataset[CdcEvent]): Dataset[SnapUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(e => e.after.orElse(e.before).isDefined)
      .groupByKey(e => e.after.orElse(e.before).map(_.id).get)
      .transformWithState(new SnapshotProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** T6-alt — snapshot via foreachBatch + versioned commit: each
    * micro-batch folds the batch's events with the previously COMMITTED
    * snapshot and commits the merged table as a new version through
    * [[SnapshotStore]] (stage data dir → atomic pointer write → GC).
    * Simpler operational model than state stores — the snapshot IS the
    * checkpoint — at the cost of rewriting the table per epoch; right when
    * the snapshot is small relative to the stream (a dimension table fed
    * by CDC). The version is the micro-batch id: monotonic across restarts
    * via the query checkpoint, and a replayed batch after a crash commits
    * the same version it was writing — idempotent recovery.
    */
  /** Shared epoch fold for both snapshot sinks: one winner per key from
    * the union of prior committed state and the batch's winners, ranked by
    * (lsn desc, incoming-wins). KEEP tombstones (live=false) in the
    * persisted state: a delete must retain its winning lsn across epochs,
    * or a redelivered older update in a later batch would resurrect the
    * deleted row — consumers read live rows only via the read helpers.
    *
    * `allowMissingColumns = true` is the schema-evolution seam (C15): a
    * batch carrying a NEW column (upstream additive DDL) widens the
    * persisted schema on THIS write — prior rows null the new column —
    * and a column the batch no longer carries survives with nulls on the
    * batch's rows. TYPE evolution rides the same union: when a batch
    * carries a WIDER type for an existing column (upstream
    * `ALTER … TYPE BIGINT` — the int32→int64 case the typed C15 query
    * exercises), the analyzer's set-operation coercion widens the merged
    * column, so int-era prior rows fold into the long column losslessly.
    * Untouched partitions keep their old files; reads reconcile schema
    * vintages across them (`PartitionedSnapshotStore.read` groups bucket
    * files by vintage and unions with the same widening), so a replica
    * keeps serving through a rolling schema OR type migration with no
    * rewrite of history.
    */
  def mergeEpoch(prior: Option[DataFrame], incoming: DataFrame): DataFrame =
    mergeEpochBy(prior, incoming, Seq("id"))

  /** [[mergeEpoch]] generalized to a COMPOSITE key (multi-tenant
    * `(tenant_id, id)` replicas): the winner window partitions by the
    * full key tuple — same single keyed shuffle, same tombstone and
    * widening semantics.
    */
  def mergeEpochBy(prior: Option[DataFrame], incoming: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "mergeEpochBy needs at least one key column")
    val merged = prior match {
      case Some(p) => p.withColumn("__src", lit(0))
        .unionByName(incoming.withColumn("__src", lit(1)),
          allowMissingColumns = true)
      case None => incoming.withColumn("__src", lit(1))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("lsn").desc, col("__src").desc)
    merged.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "__src")
  }

  def snapshotForeachBatch(events: Dataset[CdcEvent], snapshotRoot: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[CdcEvent] = {
    val spark = events.sparkSession
    events.writeStream.foreachBatch { (batch: Dataset[CdcEvent], batchId: Long) =>
      val incoming = graft.operators.Cdc.snapshotWithTombstones(batch.toDF)
      // merge against the snapshot as of BEFORE this batch id — on crash
      // replay the pointer may already name batchId (see readBefore)
      val next = mergeEpoch(
        SnapshotStore.readBefore(spark, snapshotRoot, batchId), incoming)
      SnapshotStore.commit(next, snapshotRoot, batchId)
      ()
    }
  }

  /** T19 — [[snapshotForeachBatch]] that also EXPORTS a downstream
    * changelog: after each epoch commits version v, diff the committed
    * live view against its predecessor
    * ([[graft.operators.Cdc.snapshotDiff]]) and publish the net change
    * events under `exportDir/b=<v>` — the replica becomes a PRODUCER,
    * re-emitting c/u/d events per epoch with no access to the upstream
    * WAL (the re-emission half of the CDC ecosystem; R4's wire sink
    * serializes the exported images directly). The [[SnapshotStore]] GC
    * grace window (current + predecessor) retains EXACTLY the version
    * each epoch's diff needs, so export costs one keyed full-outer join
    * per epoch and no extra retention.
    *
    * IDEMPOTENT REPLAY: the diff derives from strictly-before state
    * (`readBefore`) and the batch's own merge, and overwrites its own
    * `b=<v>` dir — a crash-replayed epoch re-exports identical events.
    * Downstream convergence is the C19 producer contract, spec'd: the
    * exported epochs, re-wrapped as an envelope changelog
    * ([[graft.operators.Cdc.diffAsChangelog]], lsn = epoch) and folded
    * by C4, reproduce the upstream live view exactly.
    */
  def snapshotForeachBatchExport(events: Dataset[CdcEvent],
      snapshotRoot: String, exportDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[CdcEvent] = {
    val spark = events.sparkSession
    events.writeStream.foreachBatch { (batch: Dataset[CdcEvent], batchId: Long) =>
      val incoming = graft.operators.Cdc.snapshotWithTombstones(batch.toDF)
      val prior = SnapshotStore.readBefore(spark, snapshotRoot, batchId)
      val next = mergeEpoch(prior, incoming)
      SnapshotStore.commit(next, snapshotRoot, batchId)
      def live(df: DataFrame) =
        df.filter(col("live")).drop("live", "lsn")
      val prevLive = prior.map(live)
        .getOrElse(live(next).filter(lit(false)))
      graft.operators.Cdc.snapshotDiff(prevLive, live(next), Seq("id"))
        .write.mode("overwrite").parquet(s"$exportDir/b=$batchId")
      ()
    }
  }

  /** The exported changelog (every epoch's net events, epoch in `b`). */
  def readChangelogExport(spark: org.apache.spark.sql.SparkSession,
      exportDir: String): DataFrame = {
    val dirs = bandBatchDirs(spark, exportDir)
    require(dirs.nonEmpty, s"no exported epochs under $exportDir")
    dirs.map { case (id, p) =>
      spark.read.parquet(p).withColumn("b", lit(id)) }
      .reduce(_ unionByName _)
  }

  /** T6-merge — keyed-merge variant of [[snapshotForeachBatch]]: the
    * snapshot is hash-partitioned by key into `buckets` directories
    * ([[PartitionedSnapshotStore]]) and an epoch REWRITES ONLY the
    * partitions its batch touched, merging the batch's winners against
    * just those partitions' prior rows. Same fold, same crash-replay
    * idempotence (merge reads strictly-before state; the epoch pointer is
    * the single commit point) — but apply cost scales with the batch's
    * key spread, not the table size: the 100 TB CDC-apply shape, where a
    * micro-batch touches a handful of partitions of a huge replica.
    */
  def snapshotForeachBatchMerge(events: Dataset[CdcEvent], snapshotRoot: String,
      buckets: Int = 16): org.apache.spark.sql.streaming.DataStreamWriter[CdcEvent] = {
    val spark = events.sparkSession
    val bcol = PartitionedSnapshotStore.bucketColName
    events.writeStream.foreachBatch { (batch: Dataset[CdcEvent], batchId: Long) =>
      import org.apache.spark.sql.functions._
      // the key→bucket modulus must never change for this store: persist
      // it on first commit, fail loudly on a misconfigured restart
      PartitionedSnapshotStore.ensureBucketCount(spark, snapshotRoot, buckets)
      val incoming = graft.operators.Cdc.snapshotWithTombstones(batch.toDF)
        .withColumn(bcol, PartitionedSnapshotStore.bucketOf(col("id"), buckets))
      // only the touched partitions participate in the merge; every other
      // partition's files are not even read
      val affected = incoming.select(col(bcol)).distinct()
      val prior = PartitionedSnapshotStore.readBefore(spark, snapshotRoot, batchId)
        .map(_.withColumn(bcol, PartitionedSnapshotStore.bucketOf(col("id"), buckets))
          .join(broadcast(affected), bcol))
      // same fold (and schema-widening seam) as the full-overwrite form
      val next = mergeEpoch(prior, incoming)
      PartitionedSnapshotStore.commit(next, snapshotRoot, batchId)
      ()
    }
  }

  /** Durable incremental view maintenance (the production form of the
    * IVM the memory-sink spec demonstrates): each micro-batch folds its
    * OWN events to a per-group delta state (`Cdc.aggMaintainState` — no
    * live filter, so a batch carrying only deletes keeps its −1
    * retraction) and merges it ADDITIVELY with the committed aggregate
    * through [[SnapshotStore]]'s versioned-dir + pointer protocol.
    * Groups whose merged count reaches zero are dropped from the
    * persisted state (retraction to absence; a future insert recreates
    * the group from scratch). Crash replay is idempotent for the same
    * reason the snapshot sinks are: the merge reads state strictly
    * BEFORE the batch id and the commit overwrites the batch's own
    * version.
    *
    * Scale: the delta aggregate is one map-side-combined groupBy over
    * the (tiny) increment; the merge unions it with the committed
    * aggregate — #groups rows, not data rows — and re-sums. Keeping a
    * 100 TB corpus's aggregate current costs one pass over the delta
    * stream per epoch; the recompute it replaces rescans the world.
    */
  def aggMaintainBatch(batch: DataFrame, batchId: Long, root: String,
      groupOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
    val spark = batch.sparkSession
    val delta = graft.operators.Cdc.aggMaintainState(batch, groupOf)
    val merged = SnapshotStore.readBefore(spark, root, batchId) match {
      case Some(p) => p.unionByName(delta)
        .groupBy(col("grp"))
        .agg(sum(col("n")).as("n"), sum(col("sum_id")).as("sum_id"))
      case None => delta
    }
    SnapshotStore.commit(merged.filter(col("n") =!= 0L), root, batchId)
  }

  def aggMaintainForeachBatch(events: Dataset[CdcEvent], root: String,
      groupOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : org.apache.spark.sql.streaming.DataStreamWriter[CdcEvent] =
    events.writeStream.foreachBatch { (batch: Dataset[CdcEvent], batchId: Long) =>
      aggMaintainBatch(batch.toDF, batchId, root, groupOf)
    }

  /** Consumer view of an [[aggMaintainForeachBatch]] aggregate: live
    * groups only (the persisted state can briefly hold negative counts
    * only mid-protocol, never at a committed version fed from a
    * complete log).
    */
  def readAggSnapshot(spark: org.apache.spark.sql.SparkSession,
      root: String): DataFrame = {
    val committed = SnapshotStore.read(spark, root)
      .getOrElse(sys.error(s"no committed aggregate under $root"))
    committed.filter(col("n") > 0)
  }

  /** [[snapshotForeachBatchMerge]] generalized to ANY envelope-shaped
    * stream and a COMPOSITE key — the untyped DataFrame form a
    * multi-table/multi-tenant replica sink actually needs (the typed
    * CdcEvent form is the reference-schema convenience). Per batch:
    * winners-with-tombstones by the key tuple
    * (`Cdc.latestWithTombstonesBy`), bucket by the composite placement
    * (`bucketOfKeys`), merge against ONLY the touched buckets' prior
    * rows, commit through the epoch pointer — same crash-replay
    * idempotence and schema/type-widening seams as the single-key sink.
    */
  def snapshotForeachBatchMergeBy(changelogStream: DataFrame,
      snapshotRoot: String, keyCols: Seq[String], buckets: Int = 16)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val bcol = PartitionedSnapshotStore.bucketColName
    changelogStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      val spark = batch.sparkSession
      PartitionedSnapshotStore.ensureBucketCount(spark, snapshotRoot, buckets)
      def bucketed(df: DataFrame) = df.withColumn(bcol,
        PartitionedSnapshotStore.bucketOfKeys(keyCols.map(col), buckets))
      val incoming = bucketed(
        graft.operators.Cdc.latestWithTombstonesBy(batch.toDF, keyCols))
      val affected = incoming.select(col(bcol)).distinct()
      val prior = PartitionedSnapshotStore.readBefore(spark, snapshotRoot, batchId)
        .map(p => bucketed(p).join(broadcast(affected), bcol))
      PartitionedSnapshotStore.commit(
        mergeEpochBy(prior, incoming, keyCols), snapshotRoot, batchId)
      ()
    }
  }

  /** Consumer view of a [[snapshotForeachBatchMerge]] snapshot. */
  def readMergedSnapshot(spark: org.apache.spark.sql.SparkSession,
      snapshotRoot: String): DataFrame = {
    val committed = PartitionedSnapshotStore.read(spark, snapshotRoot)
      .getOrElse(sys.error(s"no committed snapshot under $snapshotRoot"))
    committed.filter(org.apache.spark.sql.functions.col("live")).drop("live")
  }

  /** Consumer view of a foreachBatch-maintained snapshot: live rows only
    * (the persisted table also carries tombstones — state, not output).
    */
  /** T8 — streaming decontamination: a document stream checked against a
    * STATIC benchmark shingle set via a stream-static left-SEMI join. The
    * static side is small (eval suites) and broadcast, so each micro-batch
    * is scan + hash-probe — no stateful operator, no watermark needed, and
    * the same flagged-docs semantics as the batch `Text.decontaminate`.
    *
    * `docStream` must carry (doc_id, text); emits one row per CONTAMINATED
    * doc with its contaminating-shingle count — clean docs produce no
    * output (a semi join keeps only matches). Consumers drop contaminated
    * training docs by anti-joining on the emitted doc_ids; a left-join-
    * with-flag shape that also emits clean docs is deliberately avoided
    * here because the flag column would force every micro-batch to carry
    * the full (mostly clean) corpus through the aggregation state.
    */
  def decontaminateStream(docStream: DataFrame, benchShingles: DataFrame,
      width: Int = graft.operators.Text.defaultShingleWidth): DataFrame = {
    // per-doc distinct shingles via array_distinct INSIDE the row — the
    // batch path's relation-level distinct() would be a second stateful
    // operator in a streaming plan; this keeps the query's only state in
    // the final aggregation (same n_hits semantics: a doc's shingle set is
    // local to its row)
    val sh = docStream
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(expr(
        s"""array_distinct(transform(
           | CASE WHEN size(t) >= $width
           |  THEN sequence(1, size(t)-${width - 1}) ELSE array() END,
           | i -> md5(cast(concat_ws(' ', slice(t, i, $width)) AS binary))))"""
          .stripMargin)).as("hs"))
    sh.join(broadcast(benchShingles.select(col("hs"))), Seq("hs"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
  }

  /** T8 at eval-suite scale: [[decontaminateStream]] broadcasts the
    * EXACT benchmark shingle set; when that set outgrows a broadcast,
    * this twin probes a Bloom sketch riding in the plan as a
    * numBits/8-byte literal instead (`Text.bloomDecontaminate`'s
    * stream form — build the sketch once in batch, stream against it).
    * Same no-false-negative direction: a contaminated doc is always
    * emitted; the sized fpp bounds spurious emissions. Stateless per
    * micro-batch except the final per-doc count aggregation — no join,
    * no broadcast exchange, nothing keyed by the benchmark at all.
    */
  def decontaminateStreamBloom(docStream: DataFrame, sketch: Array[Byte],
      width: Int = graft.operators.Text.defaultShingleWidth): DataFrame = {
    val sh = docStream
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(expr(
        s"""array_distinct(transform(
           | CASE WHEN size(t) >= $width
           |  THEN sequence(1, size(t)-${width - 1}) ELSE array() END,
           | i -> md5(cast(concat_ws(' ', slice(t, i, $width)) AS binary))))"""
          .stripMargin)).as("hs"))
    sh.filter(graft.functions.BloomMembership.mightContain(sketch, col("hs")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
  }

  // --------------------------------------- T13 incremental near-dup probe
  /** T13 — streaming INCREMENTAL near-dup: each micro-batch's documents
    * are MinHash-signed with the exact batch combinators
    * (`Text.shingles` → `Text.minhashBands` inside foreachBatch — the
    * stream path cannot drift from the batch semantics because it IS the
    * batch code), probed against the growing band store for candidates
    * versus everything seen before, self-joined for candidates within the
    * batch, and the batch's bands are appended to the store so later
    * arrivals probe against them. Real pipelines dedup this way — a new
    * crawl increment probes the corpus index; nobody recomputes all-pairs
    * over 100 TB per increment.
    *
    * A pair is discovered exactly once: in the batch where its LATER
    * member arrives (the earlier one is in the store, or the same batch —
    * `new×prior` plus in-batch `bandPairs`, deduped per batch). Pair
    * orientation is (min doc_id, max doc_id), matching the batch twin.
    *
    * Scale: per batch, one signature pass over the INCREMENT only, one
    * (band, key) equi-join against the store — partitioned by bucket key,
    * shards at any corpus size; the store grows by the increment's bands
    * only. The bucket cap applies per batch exactly as it applies
    * per corpus in the batch path; a bucket that crosses the cap only
    * with later increments stops producing NEW pairs once its stored
    * membership exceeds the cap iff the probe re-caps — here the cap
    * guards the in-batch melt, and the store-side probe stays uncapped so
    * the stream≡batch equivalence holds whenever no bucket exceeds the
    * cap (asserted by the spec's precondition; a production deployment
    * re-caps the store on compaction as a skew guard, a policy choice).
    *
    * `docStream` must carry (doc_id, text); emits parquet under
    * `pairDir` with (doc_a, doc_b) — read it via [[readNearDupPairs]].
    *
    * IDEMPOTENT REPLAY: both stores are keyed by micro-batch —
    * `<dir>/b=<batchId>/` — and a batch's write is a full OVERWRITE of
    * its own subdirectory, with "prior" defined as the union of band
    * directories with id strictly below the current batch. foreachBatch
    * is at-least-once, so a crash-replayed batch recomputes from the
    * identical inputs (its own increment + the same strictly-earlier
    * store) and overwrites the identical output, instead of
    * double-appending pairs and re-probing its own half-written bands as
    * "prior" — the failure mode a flat append store has. The batch id is
    * monotonic across restarts via the query checkpoint (the same
    * versioning contract as [[SnapshotStore]]).
    */
  def nearDupStream(docStream: DataFrame, bandDir: String, pairDir: String,
      maxBucket: Int = graft.operators.Text.defaultMaxBucket)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      nearDupBatch(batch.toDF, batchId, bandDir, pairDir, maxBucket)
    }

  /** One micro-batch of [[nearDupStream]], factored out so a crash
    * replay is directly testable: calling it twice with the same
    * (batch, batchId) leaves both stores byte-for-row identical.
    */
  def nearDupBatch(batch: DataFrame, batchId: Long, bandDir: String,
      pairDir: String,
      maxBucket: Int = graft.operators.Text.defaultMaxBucket): Unit = {
    val spark = batch.sparkSession
    val bands = graft.operators.Text.minhashBands(
      graft.operators.Text.shingles(batch), maxBucket)
      .persist() // read 3x below: prior-probe, self-join, store write
    val priorPaths = bandBatchDirs(spark, bandDir)
      .collect { case (id, p) if id < batchId => p }
    // a retired (erased) doc's stored bands must not form NEW pairs —
    // the probe drops them like the readers do
    val prior =
      if (priorPaths.isEmpty) None
      else Some(dropDead(spark.read.parquet(priorPaths: _*),
        readDeadDocs(spark, bandDir)))
    val vsPrior = prior.map { p =>
      bands.join(p.withColumnRenamed("doc_id", "prior_id"), Seq("band", "key"))
        .filter(col("doc_id") =!= col("prior_id"))
        .select(least(col("doc_id"), col("prior_id")).as("doc_a"),
          greatest(col("doc_id"), col("prior_id")).as("doc_b"))
    }
    val inBatch = graft.operators.Text.bandPairs(bands)
    val pairs = vsPrior.map(_.unionByName(inBatch)).getOrElse(inBatch)
      .distinct()
    pairs.write.mode("overwrite").parquet(s"$pairDir/b=$batchId")
    bands.write.mode("overwrite").parquet(s"$bandDir/b=$batchId")
    bands.unpersist()
    ()
  }

  /** Seed the band store with a pre-existing corpus index (reserved
    * batch id −1, below every real micro-batch id).
    */
  def seedBandStore(bands: DataFrame, bandDir: String): Unit =
    bands.write.mode("overwrite").parquet(s"$bandDir/b=-1")

  private def bandBatchDirs(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(Long, String)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val all = fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("b="))
        .flatMap(s => s.getPath.getName.stripPrefix("b=").toLongOption
          .map(_ -> s.getPath.toString))
      // a batch dir is COMMITTED only once the job committer's _SUCCESS
      // marker lands. A dir without it is a torn write from a crash
      // mid-batch: the sink write happens before the checkpoint
      // advances, so that batch WILL be replayed and its dir rewritten —
      // readers must skip it rather than union partial parquet into a
      // serve (the T33-manifest lesson, applied to every band store).
      val (committed, torn) = all.partition { case (_, path) =>
        fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS")) }
      // every dir torn is a different story: either the store is wholly
      // corrupt or the committer runs with marksuccessfuljobs=false —
      // serving an EMPTY view of a non-empty store must fail loudly
      require(torn.isEmpty || committed.nonEmpty,
        s"every batch dir under $dir lacks a _SUCCESS marker — torn " +
          "store or a committer configured without success markers; " +
          "refusing to serve an empty view of a non-empty store")
      // under the single-writer foreachBatch protocol only the
      // MAX-batch-id dir can legitimately be torn (crash mid-batch; the
      // checkpoint hasn't advanced, so that batch replays and rewrites
      // it). A torn INTERIOR dir — one below a committed id — cannot be
      // a pending replay: serving around it would be a silent hole in
      // the store (manual cleanup / fs fault), so fail loudly instead.
      if (torn.nonEmpty) {
        val maxCommitted = committed.map(_._1).max
        val interior = torn.filter(_._1 < maxCommitted).map(_._1).sorted
        require(interior.isEmpty,
          s"batch dir(s) b=${interior.mkString(",")} under $dir lack a " +
            s"_SUCCESS marker but sit BELOW committed batch " +
            s"b=$maxCommitted — an interior gap can never be replayed " +
            "by the single writer; refusing to serve a view with a hole")
      }
      committed.sortBy(_._1)
    }
  }

  /** Union of every committed `b=*` directory under a batch-keyed store
    * — the one reader shape every such store shares (pairs, bands,
    * enriched facts, published events).
    */
  private def readBatchStore(spark: org.apache.spark.sql.SparkSession,
      dir: String, what: String): DataFrame = {
    val paths = bandBatchDirs(spark, dir).map(_._2)
    require(paths.nonEmpty, s"no committed $what batches under $dir")
    spark.read.parquet(paths: _*)
  }

  // ---------------- dead-doc retirement for the content-keyed stores
  /** DEAD-DOC RETIREMENT for the append-only content-keyed stores
    * (bands, shingles, discovered pairs). The T30/T35/T16 stores carry
    * per-key tombstones through their winner folds; these three cannot
    * — their rows are content-derived and IMMUTABLE (a band signature,
    * a shingle hash, a discovered pair), with no per-key versioning to
    * tombstone through — so retirement is a store-side dead set: an
    * epoch-keyed `_dead/b=<id>` marker dir (outside the `b=*` data
    * namespace, so data readers never union it) holding the retired
    * doc ids. Readers anti-join it (erasure-request-bounded, so the
    * probe broadcasts); PROBES skip dead docs too, so an erased doc
    * stops forming new pairs; compaction drops the dead docs' rows
    * PHYSICALLY — after sweep + compaction no store retains
    * erased-doc-derived content. Markers are kept after compaction
    * (tiny, and they keep a replayed pre-compaction epoch from
    * resurrecting retired rows into the read view).
    *
    * Replay: a marker write is a full overwrite of its own epoch dir
    * derived from its own rows only — re-delivery reproduces its
    * bytes; retiring an unknown/already-dead doc is a no-op by the
    * anti-join semantics.
    */
  def retireDocsBatch(deleteIds: DataFrame, batchId: Long,
      storeDir: String): Unit = {
    deleteIds.select(col("doc_id")).distinct()
      .write.mode("overwrite").parquet(s"$storeDir/_dead/b=$batchId")
    ()
  }

  /** The store's retired-doc set (None when nothing was ever retired). */
  def readDeadDocs(spark: org.apache.spark.sql.SparkSession,
      storeDir: String): Option[DataFrame] = {
    val paths = bandBatchDirs(spark, s"$storeDir/_dead").map(_._2)
    if (paths.isEmpty) None
    else Some(spark.read.parquet(paths: _*).select(col("doc_id")).distinct())
  }

  /** Id columns a store row can reference a document through — every
    * one must clear the dead set for the row to survive. */
  private val deadJoinCols = Set("doc_id", "doc_a", "doc_b", "da", "db")

  /** Drop every row referencing a retired doc through ANY id column the
    * frame carries. The dead set is erasure-request-bounded, so each
    * anti-join is a broadcast probe, never a shuffle of the store. */
  private def dropDead(df: DataFrame,
      dead: Option[DataFrame]): DataFrame =
    dead match {
      case None => df
      case Some(d) =>
        val cols = df.schema.fieldNames.filter(deadJoinCols.contains)
        require(cols.nonEmpty,
          "dropDead: the frame carries none of the known doc-id " +
            s"columns (${deadJoinCols.mkString(", ")}) — a retirement " +
            "filter that matches nothing would silently serve " +
            "erased-doc content")
        cols.foldLeft(df)((acc, c) =>
            acc.join(broadcast(d.select(col("doc_id").as(c))),
              Seq(c), "left_anti"))
          // a USING join moves the key column first — restore the
          // input order so consumers' positional reads don't flip
          .select(df.columns.map(col): _*)
    }

  /** All discovered pairs (the consumer view of [[nearDupStream]]'s
    * pair store): the union of every batch's pair directory. Pairs are
    * already globally unique — each is discovered exactly once, in the
    * batch where its later member arrived.
    */
  def readNearDupPairs(spark: org.apache.spark.sql.SparkSession,
      pairDir: String): DataFrame =
    dropDead(readBatchStore(spark, pairDir, "pair"),
      readDeadDocs(spark, pairDir))

  /** The full band index (seed + every committed batch), retired docs
    * dropped. */
  def readBandStore(spark: org.apache.spark.sql.SparkSession,
      bandDir: String): DataFrame =
    dropDead(readBatchStore(spark, bandDir, "band"),
      readDeadDocs(spark, bandDir))

  /** Compact the band store: merge every batch directory with id ≤
    * `upTo` into ONE directory keyed `b=upTo`, optionally RE-CAPPING
    * (band, key) buckets to `maxBucket` members — the small-files AND
    * skew repair for a long-running incremental near-dup index. A store
    * accumulates one directory per micro-batch forever, and a
    * boilerplate-heavy bucket that stayed under the per-batch cap can
    * grow unboundedly ACROSS batches; the per-batch probe join against
    * such a bucket is exactly the hot-key melt the batch path's cap
    * exists to prevent. Re-capping on compaction is the documented
    * skew-guard policy: after it, a degenerate bucket stops producing
    * new pairs (a deliberate recall trade, same as the batch cap).
    *
    * MUST run at a quiescent barrier: no in-flight micro-batch, and no
    * possible replay of a batch id ≤ `upTo` (a replayed batch excludes
    * its own id from "prior", but the compacted directory carries id
    * `upTo` ≥ the replayed id, so the replay would see almost no prior
    * and emit wrong pairs). Running it between `processAllAvailable()`
    * and the next `start()` — or any checkpoint-committed boundary —
    * satisfies this; the same barrier every streaming-store compaction
    * (RocksDB, Delta OPTIMIZE) requires.
    *
    * Crash-safe via [[compactStore]]'s staged-merge protocol.
    */
  def compactBandStore(spark: org.apache.spark.sql.SparkSession,
      bandDir: String, upTo: Long, maxBucket: Int = Int.MaxValue): Unit = {
    val dead = readDeadDocs(spark, bandDir) // retired rows leave PHYSICALLY
    compactStore(spark, bandDir, upTo,
      df => {
        val live = dropDead(df, dead)
        if (maxBucket == Int.MaxValue) live
        else graft.operators.Text.capBuckets(live, maxBucket)
      })
  }

  /** Compact the PAIR store: [[nearDupBatch]] grows one `pairDir`
    * directory per micro-batch forever and [[readNearDupPairs]] unions
    * all of them — the same small-files pathology the band side has.
    * Pairs are globally unique (each discovered exactly once, in the
    * batch where its later member arrived), so compaction is pure
    * concatenation under the same staged protocol: afterwards the
    * consumer reads ONE directory. Same quiescent-barrier requirement
    * as [[compactBandStore]] — no in-flight batch, no possible replay
    * of an id ≤ `upTo` (a replayed batch would overwrite the compacted
    * `b=upTo` dir with only its own pairs).
    */
  def compactPairStore(spark: org.apache.spark.sql.SparkSession,
      pairDir: String, upTo: Long): Unit = {
    val dead = readDeadDocs(spark, pairDir) // retired rows leave PHYSICALLY
    compactStore(spark, pairDir, upTo, df => dropDead(df, dead))
  }

  /** T25 — INCREMENTAL containment detection: the x2e/x7m verbatim-embed
    * verifier applied to a crawl increment against a durable SHINGLE
    * store, exactly as T13 ([[nearDupBatch]]) applies the banded Jaccard
    * candidates against the band store. Containment cannot ride the band
    * store: minhash signatures estimate Jaccard, and a short doc embedded
    * in a long host has near-zero Jaccard — the asymmetric case needs the
    * exact shared-shingle counts, so the durable state is the increment's
    * (doc_id, hs) shingle table itself. Each micro-batch:
    *
    *   1. shingles the INCREMENT only;
    *   2. probes the store by hs equi-join for prior docs sharing any of
    *      the increment's shingles — with the rare-shingle prune
    *      evaluated at CURRENT corpus state: df(hs) over store+increment,
    *      computed only for the increment's shingles (the only ones that
    *      can form new pairs), so the df aggregation is bounded by the
    *      probe hits and never scans the store beyond the equi-join;
    *   3. retrieves the FULL shingle sets of just the candidate prior
    *      docs (join bounded by candidates) and verifies exact shared
    *      counts — emitted verdicts are exact regardless of the prune;
    *   4. adds in-batch pairs via the batch verifier on the increment;
    *   5. writes pairs and the increment's shingles to batchId-keyed
    *      overwrite dirs — T13's idempotent-replay protocol; compaction
    *      via [[compactShingleStore]]/[[compactPairStore]].
    *
    * Each pair is discovered exactly once, in the batch where its later
    * member arrives, so [[readNearDupPairs]] is the consumer here too.
    * Under the df cap the incremental form discovers a SUPERSET of the
    * end-state batch run (a shingle rare at discovery time may be hot by
    * corpus end; T13's bucket cap has the same property) — the cap is a
    * skew guard, not a semantic gate, and with no capped shingles the two
    * are spec'd EQUAL.
    *
    * Scale: per batch, one shingle pass over the increment, one hs
    * equi-join against the store (bucket the store by hs on a cluster),
    * and verify joins bounded by candidate membership. The corpus-sized
    * store is never re-shingled and never moves except through the
    * pruned equi-join.
    */
  def containmentBatch(batch: DataFrame, batchId: Long, shingleDir: String,
      pairDir: String, maxDf: Int = graft.operators.Text.defaultMaxDf,
      cNum: Int = graft.operators.Text.ContainmentVerbatim._1,
      cDen: Int = graft.operators.Text.ContainmentVerbatim._2): Unit = {
    val spark = batch.sparkSession
    val T = graft.operators.Text
    val sh = T.shingles(batch).persist()
    val priorPaths = bandBatchDirs(spark, shingleDir)
      .collect { case (id, p) if id < batchId => p }
    val inBatch = T.containmentPairs(sh, maxDf, cNum, cDen)
    var hitRef: Option[DataFrame] = None
    val pairs = if (priorPaths.isEmpty) inBatch else {
      // retired docs' shingles neither form new candidates nor count
      // toward df — the store is probed as if they were never written
      val store = dropDead(spark.read.parquet(priorPaths: _*),
        readDeadDocs(spark, shingleDir))
      // prior-doc rows sharing any shingle with the increment (equi-join).
      // df is computed FIRST, over the unpersisted hit stream (column-
      // pruned to hs), and the hit set is pruned to rare shingles BEFORE
      // it is persisted or joined — a hot boilerplate shingle with df far
      // above maxDf can never form a candidate pair, so caching its
      // store-row explosion would be pure memory/skew cost (the batch
      // path prunes hot shingles before its self-join for the same
      // reason).
      val hit0 = store.join(sh.select(col("hs")).distinct(), Seq("hs"))
        .withColumnRenamed("doc_id", "prior_id")
      // df at current state, for the increment's shingles only
      val dfTab = sh.groupBy(col("hs")).agg(count(lit(1)).as("n_inc"))
        .join(hit0.groupBy(col("hs")).agg(count(lit(1)).as("n_prior")),
          Seq("hs"), "left")
        .select(col("hs"),
          (col("n_inc") + coalesce(col("n_prior"), lit(0L))).as("df"))
      val rare = dfTab.filter(col("df") <= maxDf).select(col("hs"))
      val hit = hit0.join(rare, Seq("hs")).persist()
      hitRef = Some(hit)
      val cand = sh.join(rare, Seq("hs")).join(hit, Seq("hs"))
        .filter(col("doc_id") =!= col("prior_id"))
        .select(col("doc_id"), col("prior_id")).distinct()
      // full shingle sets of candidate prior docs only
      val priorSh = store.join(
        cand.select(col("prior_id").as("doc_id")).distinct(), Seq("doc_id"))
      val cntInc = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("ni"))
      val cntPrior = priorSh.groupBy(col("doc_id")).agg(count(lit(1)).as("np"))
      val shared = cand.as("c")
        .join(sh.as("x"), col("c.doc_id") === col("x.doc_id"))
        .join(priorSh.as("y"),
          col("c.prior_id") === col("y.doc_id") && col("x.hs") === col("y.hs"))
        .groupBy(col("c.doc_id").as("i"), col("c.prior_id").as("p"))
        .agg(count(lit(1)).as("shared"))
      val cross = shared
        .join(cntInc.as("ci"), col("i") === col("ci.doc_id"))
        .join(cntPrior.as("cp"), col("p") === col("cp.doc_id"))
        .select(least(col("i"), col("p")).as("da"),
          greatest(col("i"), col("p")).as("db"),
          col("shared"),
          when(col("i") < col("p"), col("ni")).otherwise(col("np")).as("na"),
          when(col("i") < col("p"), col("np")).otherwise(col("ni")).as("nb"))
        .filter(col("shared") * cDen >= least(col("na"), col("nb")) * cNum)
        // tie-break matches Text.containmentOf: equal sizes drop the
        // larger doc_id, the min-id doc survives
        .withColumn("contained",
          when(col("na") < col("nb"), col("da")).otherwise(col("db")))
      inBatch.unionByName(cross)
    }
    pairs.write.mode("overwrite").parquet(s"$pairDir/b=$batchId")
    sh.write.mode("overwrite").parquet(s"$shingleDir/b=$batchId")
    hitRef.foreach(_.unpersist())
    sh.unpersist()
    ()
  }

  /** Compact the T25 shingle store: per-batch dirs are disjoint by
    * doc_id (each doc shingled once, in its arrival batch), so the merge
    * is pure concatenation under [[compactStore]]'s staged protocol.
    * Same quiescent-barrier requirement as [[compactBandStore]].
    */
  def compactShingleStore(spark: org.apache.spark.sql.SparkSession,
      shingleDir: String, upTo: Long): Unit = {
    val dead = readDeadDocs(spark, shingleDir) // retired rows leave PHYSICALLY
    compactStore(spark, shingleDir, upTo, df => dropDead(df, dead))
  }

  /** Staged-merge compaction shared by every batchId-keyed directory
    * store here (bands, pairs, vector index): merge every `b=<id>` dir
    * with id ≤ `upTo` into ONE dir keyed `b=upTo`, `transform` applied
    * to the merged frame (bucket re-cap for bands; identity for pairs).
    *
    * Protocol: (1) merge into a `_compact_b=<upTo>` staging dir —
    * invisible to readers, which list only `b=*` dirs — then record the
    * merged batch-id set in a `_MANIFEST` file written AFTER the data
    * (parquet `_SUCCESS` + manifest together mark a COMPLETE stage);
    * (2) delete the source batch dirs; (3) rename the stage into place.
    * The rename result is CHECKED: Hadoop FileSystem.rename reports
    * failure by returning false, not by throwing, and ignoring it would
    * leave the merged store invisible in the staging dir — every later
    * probe would then silently see an empty prior index and emit wrong
    * (missing) pairs. A failed rename aborts loudly with the staged
    * data retained; the re-run adopts the completed stage.
    *
    * Crash/staleness rules (a stage can be left over from a crash at
    * any point, or from an ABANDONED compaction after which new batches
    * landed): a re-run ADOPTS a completed stage iff its manifest COVERS
    * the batch dirs still present (⊇ — a mid-delete crash leaves a
    * subset of what was merged); a completed stage whose manifest
    * misses a present batch dir is STALE — adopting it verbatim would
    * delete data it never merged — so it is discarded and re-merged.
    * Incomplete stages (no `_SUCCESS`/manifest) and stages at other
    * `upTo` values are likewise deleted on entry.
    */
  private def compactStore(spark: org.apache.spark.sql.SparkSession,
      dir: String, upTo: Long, transform: DataFrame => DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // GC stages abandoned at OTHER upTo values — never adoptable here,
    // and left alone they accumulate forever
    if (fs.exists(root))
      fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("_compact_b=")
          && s.getPath.getName != s"_compact_b=$upTo")
        .foreach(s => fs.delete(s.getPath, true))
    val tmp = new Path(dir, s"_compact_b=$upTo")
    val manifest = new Path(tmp, "_MANIFEST")
    def manifestIds(): Option[Set[Long]] =
      if (!fs.exists(manifest)) None
      else {
        val in = fs.open(manifest)
        try Some(new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
          .trim.split(",").filter(_.nonEmpty).map(_.toLong).toSet)
        finally in.close()
      }
    val present = bandBatchDirs(spark, dir).filter(_._1 <= upTo)
    // empty `present` adopts even without a manifest: a crash between
    // the manifest delete and the rename leaves the stage as the ONLY
    // copy of the merged data
    val adoptable = fs.exists(new Path(tmp, "_SUCCESS")) &&
      (present.isEmpty ||
        manifestIds().exists(ids => present.map(_._1).toSet.subsetOf(ids)))
    if (!adoptable) {
      require(present.nonEmpty, s"no batches ≤ $upTo under $dir")
      if (fs.exists(tmp)) fs.delete(tmp, true) // incomplete or stale stage
      transform(spark.read.parquet(present.map(_._2): _*))
        .write.mode("overwrite").parquet(tmp.toString)
      val out = fs.create(manifest, true)
      try out.write(present.map(_._1).sorted.mkString(",").getBytes("UTF-8"))
      finally out.close()
    }
    bandBatchDirs(spark, dir).filter(_._1 <= upTo)
      .foreach { case (_, p) => fs.delete(new Path(p), true) }
    fs.delete(manifest, false) // keep the published layout parquet-only
    require(fs.rename(tmp, new Path(dir, s"b=$upTo")),
      s"compaction rename of $tmp failed; staged data retained — re-run adopts it")
    ()
  }

  // --------------------------------- T16 incremental vector-index upsert
  /** T16 — incremental ANN-index maintenance: the T13 increment pattern
    * applied to X3, closing the gap where the CDC half maintained
    * everything incrementally while embeddings were indexed batch-only.
    * A real 100 TB deployment re-embeds changed documents and UPSERTS
    * them into the serving index — re-fitting and re-encoding the
    * corpus per increment would rescan the world. Each micro-batch of
    * (vec_id, embedding) rows — new docs or re-embedded ones — is
    * coarse-assigned against the EXISTING centroids and PQ-encoded
    * against the EXISTING codebooks (frozen models: production refits
    * them offline, rarely — [[graft.operators.Vectors.encodeForIndex]],
    * shuffle-free per-row expression work over the increment only) and
    * written under `indexDir/b=<batchId>`, each row tagged with its
    * batch id.
    *
    * UPSERT semantics ride the layout: [[readVectorIndex]] folds
    * latest-batch-wins per vec_id, so a re-embedded doc's newest
    * encoding shadows every earlier one — the CDC winner-per-key fold,
    * keyed by batch id instead of lsn. Serving reads the folded index
    * through [[graft.operators.Vectors.pqSearchIndex]] — the IDENTICAL
    * search plan the batch path uses, so stream-built ≡ batch-encoded
    * exactly (T16 spec; `x3l` oracle-checks the same equivalence
    * inline).
    *
    * IDEMPOTENT REPLAY, the [[nearDupBatch]] contract: a batch's write
    * is a full overwrite of its own subdirectory, derived only from its
    * own rows and the frozen models, so an at-least-once replay
    * rewrites identical bytes.
    */
  def vectorIndexBatch(batch: DataFrame, batchId: Long, indexDir: String,
      coarse: Array[Array[Float]],
      books: Array[Array[Array[Float]]],
      encoder: (DataFrame, Array[Array[Float]], Array[Array[Array[Float]]])
        => DataFrame = graft.operators.Vectors.encodeForIndex): Unit =
    writeIndexEpoch(
      encoder(batch, coarse, books)
        .withColumn("live", lit(true)),
      batchId, indexDir)

  /** Upserts AND deletions in one index epoch: a deletion rides as a
    * TOMBSTONE row (live=false, cluster −1, null codes/embedding)
    * through the same latest-batch-wins fold — exactly the CDC
    * tombstone discipline (C8/`latestWithTombstonesBy`): the marker
    * must WIN over every earlier encoding of its vec_id, or a replayed
    * older batch could resurrect a deleted document into ANN serving.
    * [[readVectorIndex]] folds first, filters `live` second; a later
    * re-create simply upserts over the tombstone. `upserts` and
    * `deleteIds` must be key-disjoint within one epoch (the changelog
    * fold guarantees this — one winner per key); two same-batch rows
    * for one vec_id would tie the fold.
    */
  def vectorIndexApplyBatch(upserts: DataFrame, deleteIds: DataFrame,
      batchId: Long, indexDir: String, coarse: Array[Array[Float]],
      books: Array[Array[Array[Float]]],
      encoder: (DataFrame, Array[Array[Float]], Array[Array[Array[Float]]])
        => DataFrame = graft.operators.Vectors.encodeForIndex): Unit = {
    // same-batch key overlap would TIE the winner-per-vec_id fold (both
    // rows share `b`) — refuse loudly, as postingsApplyBatch does
    require(deleteIds.join(upserts.select(col("vec_id")), Seq("vec_id"))
        .isEmpty,
      "vectorIndexApplyBatch: a vec_id appears in both upserts and " +
        "deleteIds of one epoch — the fold would tie; pre-fold the " +
        "changelog to one winner per key (reembedIndexBatch does).")
    val enc = encoder(upserts, coarse, books).withColumn("live", lit(true))
    // tombstone columns derive from the encoder's own output schema so a
    // CARRYING encoder (encodeForIndexCarry: label, license tier, …)
    // keeps every epoch schema-identical — carried attributes are typed
    // nulls on a tombstone, which the fold never serves (live=false)
    val fixed: Map[String, org.apache.spark.sql.Column] = Map(
      "cluster" -> lit(-1), "vec_id" -> col("vec_id"))
    val dead = deleteIds.select(enc.drop("live").schema.fields.map(f =>
      fixed.getOrElse(f.name, lit(null).cast(f.dataType)).as(f.name))
      :+ lit(false).as("live"): _*)
    writeIndexEpoch(enc.unionByName(dead), batchId, indexDir)
  }

  private def writeIndexEpoch(rows: DataFrame, batchId: Long,
      indexDir: String): Unit = {
    rows.withColumn("b", lit(batchId))
      .write.mode("overwrite").parquet(s"$indexDir/b=$batchId")
    ()
  }

  def vectorIndexStream(embStream: DataFrame, indexDir: String,
      coarse: Array[Array[Float]], books: Array[Array[Array[Float]]])
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    embStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      vectorIndexBatch(batch.toDF, batchId, indexDir, coarse, books)
    }

  /** The full CDC → re-embed → index pipeline in one micro-batch: a
    * DOCUMENT changelog batch (envelope-shaped, `after.id`/`after.text`)
    * folds to its winners (latest live image per key — the C4 fold), the
    * winning texts re-embed ([[graft.operators.Vectors.stubEmbed]]: the
    * model is a deterministic stub, the plumbing is real), and the fresh
    * embeddings upsert into the index via [[vectorIndexApplyBatch]] — so an
    * upstream `UPDATE documents SET text=…` propagates to ANN serving as
    * one increment-sized pass, never a corpus re-encode. This is the
    * integration the T16 machinery exists for: the same changelog that
    * maintains replicas/aggregates now maintains the vector index.
    * Document DELETIONS propagate too: the batch fold keeps tombstone
    * winners (`latestWithTombstonesBy`) and they write through
    * [[vectorIndexApplyBatch]] as index tombstones, so a deleted
    * document leaves ANN serving in the same epoch and cannot be
    * resurrected by older encodings; a re-created document upserts
    * over its own tombstone.
    */
  def reembedIndexBatch(changelog: DataFrame, batchId: Long,
      indexDir: String, coarse: Array[Array[Float]],
      books: Array[Array[Array[Float]]]): Unit = {
    val winners = graft.operators.Cdc.latestWithTombstonesBy(
      changelog, Seq("id"))
    val embedded = graft.operators.Vectors.stubEmbed(
      winners.filter(col("live"))
        .select(col("id").as("vec_id"), col("text")))
    vectorIndexApplyBatch(
      embedded.select(col("vec_id"), col("embedding")),
      winners.filter(!col("live")).select(col("id").as("vec_id")),
      batchId, indexDir, coarse, books)
  }

  /** LAKE → vector-index integration — [[postingsFromLake]]'s twin for
    * the T16 store, making the T38 claim literal: EVERY maintained
    * serving store tails the table's commits. Each lake commit becomes
    * one index epoch keyed by the commit version: `c`/`u` rows re-embed
    * their post-image text against the FROZEN models and upsert, `d`
    * rows write through as index tombstones. Same at-least-once ×
    * epoch-idempotent composition as the postings path. */
  def vectorIndexFromLake(spark: org.apache.spark.sql.SparkSession,
      lakeRoot: String, consumerDir: String, indexDir: String,
      coarse: Array[Array[Float]], books: Array[Array[Array[Float]]],
      maxCommits: Int = Int.MaxValue): Seq[Long] =
    graft.sources.LakeFormat.consumeChangeFeed(spark, lakeRoot, consumerDir,
        maxCommits) { (batch, v) =>
      val embedded = graft.operators.Vectors.stubEmbed(
        batch.filter(col("_change_type").isin("c", "u"))
          .select(col("doc_id").as("vec_id"), col("text")))
      vectorIndexApplyBatch(
        embedded.select(col("vec_id"), col("embedding")),
        batch.filter(col("_change_type") === "d")
          .select(col("doc_id").as("vec_id")),
        v, indexDir, coarse, books)
    }

  /** Seed the index with a pre-built corpus encode (reserved batch id
    * −1, below every real micro-batch id — [[seedBandStore]]'s
    * convention).
    */
  def seedVectorIndex(corpus: DataFrame, indexDir: String,
      coarse: Array[Array[Float]],
      books: Array[Array[Array[Float]]]): Unit =
    vectorIndexBatch(corpus, -1L, indexDir, coarse, books)

  /** Consumer view of the incremental index: one row per vec_id, the
    * encoding from its HIGHEST batch id (a vec_id appears at most once
    * per batch dir, so the winner is unique), tombstone winners
    * filtered AFTER the fold — fold-then-filter is what makes a delete
    * irreversible by older encodings. The result feeds `pqSearchIndex`
    * directly.
    */
  def readVectorIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): DataFrame =
    readVectorIndexAsOf(spark, indexDir, Long.MaxValue)

  /** The index AS OF epoch `batchId` (inclusive) — byte-reproducible
    * historical serving for lineage and debugging ("which index
    * answered this training job's queries"): the fold runs over only
    * the batch dirs with id ≤ `batchId`. Compaction collapses history:
    * after `compactVectorIndex(upTo)` the merged dir carries id `upTo`,
    * so as-of reads at t ≥ upTo stay exact (the merged rows are the
    * fold of everything ≤ upTo) while t < upTo is outside the retention
    * window and REFUSED loudly — the same retention contract as
    * `PartitionedSnapshotStore.readAsOf`, never a silently-partial
    * answer.
    */
  def readVectorIndexAsOf(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, batchId: Long): DataFrame = {
    val paths = bandBatchDirs(spark, indexDir)
      .filter(_._1 <= batchId).map(_._2)
    require(paths.nonEmpty,
      s"no index batches ≤ $batchId under $indexDir " +
        "(outside the compaction retention window, or before the seed)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("b").desc)
    spark.read.parquet(paths: _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("live"))
      .drop("__rn", "b", "live")
  }

  /** Compact the vector index: merge batch dirs ≤ `upTo` into one AND
    * drop shadowed rows (superseded encodings of re-embedded vec_ids) —
    * the winner fold moved from read time into storage, so a
    * long-running index stops paying the read-side window over every
    * historical version. Winning TOMBSTONES are dropped too: every
    * batch ≤ `upTo` participates in the same fold, so nothing older
    * remains for a tombstone to suppress, and any batch > `upTo`
    * out-ranks it anyway — deleted vec_ids simply vanish from storage.
    * Surviving rows keep their `b` tag (the fold keys on the COLUMN,
    * not the directory), so reads before and after compaction are
    * identical. Same staged protocol and quiescent-barrier requirement
    * as [[compactBandStore]].
    */
  def compactVectorIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, upTo: Long): Unit =
    compactStore(spark, indexDir, upTo, df => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("b").desc)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1 && col("live")).drop("__rn")
    })

  // ------------------------------- T30 incremental BM25 postings index
  /** T30 — incremental SEARCH-index maintenance: the T16 upsert/tombstone
    * discipline applied to the x4r BM25 postings. Each epoch writes the
    * FULL inverted-index rows of just its own documents
    * ([[graft.operators.Text.docPostings]]: per-(doc, token) tf rows plus
    * one META row per doc carrying dl — the doc-exists marker that keeps
    * corpus statistics exact), under `postingsDir/b=<batchId>`; a delete
    * rides as a dead META row through the same fold.
    *
    * The fold is winner-BATCH-per-doc, not winner-row: a rewritten
    * document may LOSE tokens, so folding per (doc, token) would leak
    * stale postings from superseded versions — the whole posting set of
    * the doc's highest epoch wins atomically ([[readPostings]]).
    * Serving ([[servedBm25]]) recomputes (N, Σdl) from the folded META
    * rows and scores through the SAME
    * [[graft.operators.Text.bm25FromPostings]] tail as batch `x4r`, so
    * stream-maintained ≡ batch is exact, not approximate (spec; the
    * `x4t` oracle checks the identical fold in-plan).
    *
    * IDEMPOTENT REPLAY: a batch's write is a full overwrite of its own
    * subdirectory derived only from its own rows (the [[nearDupBatch]]
    * contract). 100 TB shape: per-epoch work is increment-sized
    * expression + one map-side-combined groupBy; the read fold is one
    * window keyed by doc_id; production compacts with
    * [[compactPostings]] so the fold stops paying for history.
    */
  def postingsApplyBatch(upserts: DataFrame, deleteIds: DataFrame,
      batchId: Long, postingsDir: String): Unit = {
    // key-disjointness is load-bearing: a doc_id in BOTH sides of one
    // batch would share one `b`, and the winner-batch fold keeps live
    // rows — the tombstone would silently lose. A changelog-fed caller
    // cannot produce this (bm25IndexBatch folds to one winner per key);
    // the public API refuses it loudly.
    require(deleteIds.join(upserts.select(col("doc_id")), Seq("doc_id"))
        .isEmpty,
      "postingsApplyBatch: a doc_id appears in both upserts and " +
        "deleteIds of one batch — the in-batch tombstone would silently " +
        "lose to the upsert; pre-fold the changelog to one winner per " +
        "key (bm25IndexBatch does) or split across batches.")
    val live = graft.operators.Text.docPostings(upserts)
      .withColumn("live", lit(true))
    val dead = deleteIds.select(col("doc_id"),
      lit(null).cast("string").as("token"), lit(0L).as("tf"),
      lit(0L).as("dl"), lit(false).as("live"))
    live.unionByName(dead).withColumn("b", lit(batchId))
      .write.mode("overwrite").parquet(s"$postingsDir/b=$batchId")
    ()
  }

  /** Seed the postings store from a pre-built corpus (reserved id −1,
    * below every real micro-batch id — [[seedBandStore]]'s convention).
    */
  def seedPostings(corpus: DataFrame, postingsDir: String): Unit =
    postingsApplyBatch(corpus, corpus.select(col("doc_id")).limit(0),
      -1L, postingsDir)

  /** CDC → search-index integration (the [[reembedIndexBatch]] twin for
    * the text index): a DOCUMENT changelog batch folds to its winners
    * (latest live image per key, tombstones kept —
    * [[graft.operators.Cdc.latestWithTombstonesBy]]), winning texts
    * re-index as postings upserts, and deletes write through as dead
    * META rows — an upstream `UPDATE documents SET text=…` reaches BM25
    * serving as one increment-sized pass, and a deleted document leaves
    * search results in the same epoch.
    */
  def bm25IndexBatch(changelog: DataFrame, batchId: Long,
      postingsDir: String): Unit = {
    val winners = graft.operators.Cdc.latestWithTombstonesBy(
      changelog, Seq("id"))
    postingsApplyBatch(
      winners.filter(col("live")).select(col("id").as("doc_id"), col("text")),
      winners.filter(!col("live")).select(col("id").as("doc_id")),
      batchId, postingsDir)
  }

  def postingsStream(docChangelogStream: DataFrame, postingsDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docChangelogStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      bm25IndexBatch(batch.toDF, batchId, postingsDir)
    }

  /** LAKE → search-index integration: maintain the T30 postings store by
    * TAILING A LAKE TABLE'S COMMITS
    * ([[graft.sources.LakeFormat.consumeChangeFeed]]) instead of
    * subscribing to the raw changelog — the replica → serving chain at
    * table scale: once the CDC stream lands in the lake exactly-once
    * (T37), every derived store drains the table's own change feed with
    * a durable consumer offset, never re-reading the table.
    *
    * Each lake commit becomes ONE postings epoch keyed by the commit
    * version: `c`/`u` rows re-index their post-image text, `d` rows
    * write through as dead META tombstones — the exact
    * [[bm25IndexBatch]] classification, sourced from the table log.
    * At-least-once delivery composes with the epoch-keyed idempotent
    * [[postingsApplyBatch]] write: a replayed commit overwrites its own
    * `b=<version>` directory with identical rows, so the serve is
    * exactly-once in effect. Returns the commit versions applied. */
  def postingsFromLake(spark: org.apache.spark.sql.SparkSession,
      lakeRoot: String, consumerDir: String, postingsDir: String,
      maxCommits: Int = Int.MaxValue): Seq[Long] =
    graft.sources.LakeFormat.consumeChangeFeed(spark, lakeRoot, consumerDir,
        maxCommits) { (batch, v) =>
      postingsApplyBatch(
        batch.filter(col("_change_type").isin("c", "u"))
          .select(col("doc_id"), col("text")),
        batch.filter(col("_change_type") === "d").select(col("doc_id")),
        v, postingsDir)
    }

  /** [[postingsFromLake]]'s StreamingQuery-native sibling: the
    * `foreachBatch` applier for a `spark.readStream.format("graft-lake")`
    * stream over the table ([[graft.sources.GraftLakeProvider]]) —
    * offsets live in the SPARK CHECKPOINT, not a hand-rolled consumer
    * dir, so kill/restart recovery is the engine's. One micro-batch may
    * span several lake commits; each commit still becomes its own
    * postings epoch (split on `_commit_version` — the union branches
    * carry it as a literal, so Catalyst prunes every other commit's
    * subplan under the filter). The per-batch commit list is O(#commits
    * in the trigger) driver-side — never row-scaled. Idempotence is
    * [[postingsApplyBatch]]'s epoch-overwrite discipline, absorbing the
    * engine's at-least-once batch replay after a crash. */
  def postingsApplyFeedBatch(batch: DataFrame, postingsDir: String): Unit = {
    val versions = batch.select("_commit_version").distinct()
      .collect().map(_.getLong(0)).sorted
    versions.foreach { v =>
      val b = batch.filter(col("_commit_version") === v)
      postingsApplyBatch(
        b.filter(col("_change_type").isin("c", "u"))
          .select(col("doc_id"), col("text")),
        b.filter(col("_change_type") === "d").select(col("doc_id")),
        v, postingsDir)
    }
  }

  /** Consumer view: all postings rows of each doc's HIGHEST epoch, dead
    * docs dropped AFTER the fold (fold-then-filter makes a delete
    * irreversible by older epochs; a re-create upserts over it).
    */
  def readPostings(spark: org.apache.spark.sql.SparkSession,
      postingsDir: String): DataFrame =
    readPostingsAsOf(spark, postingsDir, Long.MaxValue)

  /** The postings index AS OF epoch `batchId` (inclusive) — same
    * retention contract as [[readVectorIndexAsOf]]: reads inside a
    * compacted range are refused loudly, never answered partially.
    */
  def readPostingsAsOf(spark: org.apache.spark.sql.SparkSession,
      postingsDir: String, batchId: Long): DataFrame = {
    val paths = bandBatchDirs(spark, postingsDir)
      .filter(_._1 <= batchId).map(_._2)
    require(paths.nonEmpty,
      s"no postings batches ≤ $batchId under $postingsDir " +
        "(outside the compaction retention window, or before the seed)")
    graft.operators.Text.foldWinnerBatch(spark.read.parquet(paths: _*))
      .drop("b", "live")
  }

  /** BM25 over the maintained index — the serving path: corpus stats
    * (N, Σdl) from the folded META rows, scoring through the identical
    * [[graft.operators.Text.bm25FromPostings]] tail as batch x4r.
    * The winner fold runs over only the query terms' rows plus the META
    * rows ([[graft.operators.Text.foldWinnerBatchForTerms]] — provably
    * the same surviving rows), so the term filter reaches the store's
    * parquet scan as a pushed predicate and the serve reads
    * query-proportional bytes: measured at sf0.1 the full-store fold
    * was 2 × ~1.6 s of scan+window task time per serve (the folded
    * subtree executes once for stats, once for scoring); term-bounded
    * it is a few rows per doc.
    */
  def servedBm25(spark: org.apache.spark.sql.SparkSession,
      postingsDir: String, terms: Seq[String]): DataFrame = {
    val paths = bandBatchDirs(spark, postingsDir).map(_._2)
    require(paths.nonEmpty, s"no postings batches under $postingsDir")
    val folded = graft.operators.Text.foldWinnerBatchForTerms(
      spark.read.parquet(paths: _*), terms).drop("b", "live")
    val stats = folded.filter(col("token").isNull)
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
    graft.operators.Text.bm25FromPostings(folded, stats, terms)
  }

  /** Compact the postings store: merge epochs ≤ `upTo` into one dir,
    * keeping only each doc's winning epoch rows and dropping dead docs
    * (nothing older remains for a tombstone to suppress; anything newer
    * out-ranks it). Rows keep their `b` tag so reads before and after
    * compaction are identical. Same staged protocol and
    * quiescent-barrier requirement as [[compactBandStore]].
    */
  def compactPostings(spark: org.apache.spark.sql.SparkSession,
      postingsDir: String, upTo: Long): Unit =
    compactStore(spark, postingsDir, upTo,
      graft.operators.Text.foldWinnerBatch)

  // -------------- T35 incremental positional phrase index (T30's twin)
  /** T35 — the POSITIONAL index maintained under document CDC, closing
    * x4w's serving loop the way T30 closes x4r's: phrase queries need
    * (doc, token, pos) rows, and re-extracting positions for the corpus
    * per increment rescans the world. Same protocol as T30 in every
    * particular — per-epoch `b=<id>` dirs each carrying the batch's own
    * docs' FULL positional rows plus a null-token META row per doc (the
    * doc-exists marker a delete tombstone replaces), winner-BATCH-per-doc
    * read fold (a rewrite may SHORTEN a doc — per-(doc,token,pos) folding
    * would leak stale positions), batchId-keyed idempotent writes, staged
    * compaction. [[servedPhrase]] matches through the identical
    * [[graft.operators.Text.phraseFromPositions]] tail as batch x4w, so
    * served ≡ batch exactly (spec; the `x4x` oracle checks the identical
    * fold in-plan against x4wSql verbatim).
    *
    * The positional store is ~dl/|vocab-hit| times larger than the tf
    * store — that is the classic positional-index trade and the reason
    * it is a SEPARATE store: BM25 serving never pays for positions, and
    * a deployment that doesn't serve phrase queries never builds it.
    */
  def positionsApplyBatch(upserts: DataFrame, deleteIds: DataFrame,
      batchId: Long, positionsDir: String): Unit = {
    require(deleteIds.join(upserts.select(col("doc_id")), Seq("doc_id"))
        .isEmpty,
      "positionsApplyBatch: a doc_id appears in both upserts and " +
        "deleteIds of one batch — the in-batch tombstone would silently " +
        "lose to the upsert; pre-fold the changelog to one winner per " +
        "key (phraseIndexBatch does) or split across batches.")
    val live = graft.operators.Text.docPositions(upserts)
      .withColumn("live", lit(true))
    val dead = deleteIds.select(col("doc_id"),
      lit(null).cast("string").as("token"), lit(-1L).as("pos"),
      lit(false).as("live"))
    live.unionByName(dead).withColumn("b", lit(batchId))
      .write.mode("overwrite").parquet(s"$positionsDir/b=$batchId")
    ()
  }

  /** CDC → phrase-index integration ([[bm25IndexBatch]]'s twin). */
  def phraseIndexBatch(changelog: DataFrame, batchId: Long,
      positionsDir: String): Unit = {
    val winners = graft.operators.Cdc.latestWithTombstonesBy(
      changelog, Seq("id"))
    positionsApplyBatch(
      winners.filter(col("live")).select(col("id").as("doc_id"), col("text")),
      winners.filter(!col("live")).select(col("id").as("doc_id")),
      batchId, positionsDir)
  }

  def positionsStream(docChangelogStream: DataFrame, positionsDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docChangelogStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      phraseIndexBatch(batch.toDF, batchId, positionsDir)
    }

  /** Consumer view: each doc's HIGHEST epoch's positional rows, dead
    * docs dropped after the fold (the [[readPostings]] contract). */
  def readPositions(spark: org.apache.spark.sql.SparkSession,
      positionsDir: String): DataFrame = {
    val paths = bandBatchDirs(spark, positionsDir).map(_._2)
    require(paths.nonEmpty, s"no positional batches under $positionsDir")
    graft.operators.Text.foldWinnerBatch(spark.read.parquet(paths: _*))
      .drop("b", "live")
  }

  /** Phrase matching over the maintained index — the serving path,
    * scoring through the identical shared tail as batch x4w. The winner
    * fold is term-bounded exactly like [[servedBm25]]'s
    * (META rows ride along for winner determination only;
    * [[graft.operators.Text.phraseFromPositions]] drops them itself). */
  def servedPhrase(spark: org.apache.spark.sql.SparkSession,
      positionsDir: String, phrase: Seq[String]): DataFrame = {
    val paths = bandBatchDirs(spark, positionsDir).map(_._2)
    require(paths.nonEmpty, s"no positional batches under $positionsDir")
    graft.operators.Text.phraseFromPositions(
      graft.operators.Text.foldWinnerBatchForTerms(
        spark.read.parquet(paths: _*), phrase).drop("b", "live"),
      phrase)
  }

  def compactPositions(spark: org.apache.spark.sql.SparkSession,
      positionsDir: String, upTo: Long): Unit =
    compactStore(spark, positionsDir, upTo,
      graft.operators.Text.foldWinnerBatch)

  // ------------------------------- T20 durable streaming heavy hitters
  /** T20 — heavy hitters over an UNBOUNDED token stream with O(k) state:
    * each micro-batch reduces to a ≤(k−1)-counter Misra–Gries summary
    * (the batch Aggregator, map-side combined — the vocabulary never
    * shuffles), and the stored summary merges with the batch's under
    * the mergeable-summaries rule — the SAME `merge` the Aggregator
    * runs between partitions, so the stream path cannot drift from the
    * batch path; it IS the batch code applied one level up. The MG
    * theorem survives arbitrary merge trees: estimates only
    * undercount, by at most N/k total, so every token with true count
    * > N/k is present in the summary after ANY number of epochs —
    * streaming-vocabulary tracking (hot URLs, emerging tokens) whose
    * state stays ≤ k−1 counters forever.
    *
    * Durability is [[SnapshotStore]]'s pointer protocol (the T14
    * discipline): the merged summary commits as version=batchId; a
    * crash replay merges the batch's summary against strictly-before
    * state (`readBefore`), so the running total N is never
    * double-counted and the recommitted summary satisfies the same
    * bound. (Replay idempotence is at the CONTRACT level, not the byte
    * level: MG estimates are partition-order-dependent — the x4l
    * documented property — and a replayed batch may repartition; the
    * store's one-committed-summary-per-version makes the estimate
    * variance invisible to readers.) The driver-side merge is the
    * bounded-materialization tier by construction: ≤ 2(k−1) counters
    * ever cross the wire.
    *
    * `tokens` must carry one string column `token`; the summary stores
    * (token, cnt) plus the running total as `n_total` on every row.
    */
  def heavyHittersBatch(tokens: DataFrame, batchId: Long, root: String,
      k: Int): Unit = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val agg = graft.functions.MisraGries.mg(k)
    val batchSummary = tokens.select(col("token").as[String])
      .select(agg.toColumn).head()
    val batchN = tokens.count()
    val (priorCounters, priorN) =
      SnapshotStore.readBefore(spark, root, batchId) match {
        case Some(df) =>
          val rows = df.select(col("token"), col("cnt"), col("n_total"))
            .as[(String, Long, Long)].collect()
          (rows.map(r => r._1 -> r._2).toMap,
            rows.headOption.map(_._3).getOrElse(0L))
        case None => (Map.empty[String, Long], 0L)
      }
    val merged = agg.merge(
      graft.functions.MisraGries.Buf(priorCounters),
      graft.functions.MisraGries.Buf(batchSummary)).counters
    val n = priorN + batchN
    SnapshotStore.commit(
      merged.toSeq.sortBy(_._1).toDF("token", "cnt")
        .withColumn("n_total", lit(n)).coalesce(1),
      root, batchId)
  }

  def heavyHittersStream(tokenStream: DataFrame, root: String, k: Int)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    tokenStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      heavyHittersBatch(batch.toDF, batchId, root, k)
    }

  /** The committed summary: (token, cnt) estimates + total stream count
    * `n_total`. Estimates undercount by ≤ n_total/k in sum.
    */
  def readHeavyHitters(spark: org.apache.spark.sql.SparkSession,
      root: String): DataFrame =
    SnapshotStore.read(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed summary under $root"))

  // --------------------- T31 durable streaming anomaly moments (q36 twin)
  /** T31 — q36's streaming half: per-user exact integer moments
    * (n, Σv, Σv², max|v| for the overflow guard) maintained ADDITIVELY
    * (sums; max|v| by max) through the versioned store (the
    * T14 aggregate-maintenance shape) — moments are the z-test's
    * sufficient statistics and merge by plain BIGINT addition, so the
    * committed state after any batch split equals the all-at-once
    * aggregation exactly, and flagging events against it
    * ([[flagOutliers]]) runs the IDENTICAL
    * [[graft.operators.Relational.outlierTest]] predicate as batch q36 —
    * flags against full-history state match the batch operator by
    * construction (spec). Per batch: one map-side-combined groupBy over
    * the increment, a #users-row union + re-sum against committed state,
    * an epoch-keyed commit; crash replay reads strictly-before state.
    * The serving join is user-keyed; committed state is user-count-
    * proportional, never event-proportional.
    */
  def momentsBatch(ev: DataFrame, batchId: Long, root: String): Unit = {
    val spark = ev.sparkSession
    val delta = graft.operators.Relational.momentsByKey(ev)
    val merged = SnapshotStore.readBefore(spark, root, batchId) match {
      case Some(p) => p.unionByName(delta).groupBy(col("user_id"))
        .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
          sum(col("q")).as("q"), max(col("m")).as("m"))
      case None => delta
    }
    // re-guard the MERGED state: each increment can pass the headroom
    // bound while the lifetime sum crosses it — the commit that crosses
    // THROWS (and commits nothing) instead of storing wrap-prone moments
    SnapshotStore.commit(
      graft.operators.Relational.guardMoments(merged), root, batchId)
  }

  def momentsStream(evStream: DataFrame, root: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    evStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      momentsBatch(batch.toDF, batchId, root)
    }

  def readMoments(spark: org.apache.spark.sql.SparkSession,
      root: String): DataFrame =
    SnapshotStore.read(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed moments under $root"))

  /** Flag a (possibly historical) event set against the COMMITTED
    * per-user moments — the serving read of the T31 store. With the
    * store fed by the same events, output ≡ batch q36 exactly. */
  def flagOutliers(ev: DataFrame, root: String): DataFrame =
    graft.operators.Relational.flagAgainst(
      ev, readMoments(ev.sparkSession, root))

  // ------------------- T32 durable graph edge/degree store (x7q's durable half)
  /** T32 — the graph analytics serving store: the symmetric edge set and
    * its degree table maintained through the per-epoch `b=<id>` layout
    * (the T30 discipline applied to the graph). Each batch symmetrizes
    * its edge increment, anti-joins against the STRICTLY-BEFORE folded
    * edge set (cross-batch re-sends are no-ops — the x7p/T13 idempotent
    * protocol), and writes only the FRESH edges plus their degree
    * DELTAS under its own epoch dir — increment-sized writes, never a
    * store rewrite.
    *
    * RETRACTIONS are first-class (the delete half of the reference's
    * envelope op set, op ∈ {c,u,d,r} — `README.md:331` — propagates to
    * every derived store, not just snapshots): edge rows carry a weight
    * `w` (+1 insert, −1 delete tombstone), and a delete batch
    * ([[graphEdgesDeleteBatch]]) semi-joins its symmetrized increment
    * against the strictly-before folded PRESENT set — deletes of absent
    * edges are no-ops, so cross-batch re-sent deletes vanish — then
    * writes only the hit edges as tombstones plus NEGATIVE degree
    * deltas. The per-edge lifetime weight sum is therefore an invariant
    * in {0, 1} (insert only when absent: 0→1; delete only when present:
    * 1→0); the read fold checks it and THROWS on any other value — a
    * torn protocol, not data.
    *
    * Reads: the edge set folds the epoch union per (src, dst) by weight
    * sum and keeps w = 1 — one map-side-combinable aggregation whose
    * post-[[compactGraph]] cost degenerates to the old plain-union scan
    * (compaction clears tombstones, so the steady-state store is
    * insert-only again); degrees re-sum the per-epoch deltas (BIGINT
    * addition — order- and split-invariant, the T31 merge rule) over
    * #epochs × touched-nodes rows, never a groupBy over |E|, keeping
    * nodes with deg > 0 and THROWING on a negative lifetime sum.
    * [[servedPageRank]] then runs the IDENTICAL q34
    * integer recurrence over the maintained state
    * (`Graph.pageRank(presymmetrized = true, degIn = …)`), so
    * store-served ≡ batch-derived exactly (spec; `x7q_incr_pagerank`
    * oracle-checks the same fold in-plan against q34Sql). Replay: a
    * batch's write derives only from its own rows + strictly-before
    * state and overwrites its own subdirectory ([[nearDupBatch]]
    * contract). [[compactGraph]] merges epochs ≤ upTo through the
    * shared staged protocol: edges concatenate (already disjoint),
    * degree deltas re-sum — reads identical before and after.
    */
  /** Symmetrize an edge increment: both directions, self-loops excluded
    * (the [[graft.operators.Graph.pageRank]] graph semantics), distinct. */
  private def symmetrizeEdges(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()

  /** The PRESENT edge set folded from the weighted epoch rows: per-edge
    * lifetime weight sum, which the insert/delete protocol pins to
    * {0, 1} — any other value is a torn protocol and THROWS. */
  private def foldEdgeEpochs(epochs: DataFrame): DataFrame =
    epochs.groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .filter(graft.functions.Guards.assertFilter(col("w").isin(0L, 1L),
        "graph edge store: per-edge weight sum outside {0,1} — an " +
          "insert of a present edge or a delete of an absent one " +
          "reached the store; the batch protocol guarantees neither " +
          "can, so this store is corrupt"))
      .filter(col("w") === 1L)
      .select(col("src"), col("dst"))

  /** The strictly-before present set (empty frame with the edge schema
    * when no prior epoch exists). */
  private def priorGraphEdges(spark: org.apache.spark.sql.SparkSession,
      graphDir: String, batchId: Long): Option[DataFrame] = {
    val priorDirs = bandBatchDirs(spark, s"$graphDir/edges")
      .filter(_._1 < batchId).map(_._2)
    if (priorDirs.isEmpty) None
    else Some(foldEdgeEpochs(spark.read.parquet(priorDirs: _*)))
  }

  def graphEdgesBatch(edges: DataFrame, batchId: Long,
      graphDir: String): Unit = {
    val spark = edges.sparkSession
    val sym = symmetrizeEdges(edges)
    val fresh = priorGraphEdges(spark, graphDir, batchId)
      .map(present => sym.join(present, Seq("src", "dst"), "left_anti"))
      .getOrElse(sym)
      .localCheckpoint() // read twice: edge write + degree delta
    fresh.select(col("src"), col("dst"), lit(1L).as("w"))
      .write.mode("overwrite").parquet(s"$graphDir/edges/b=$batchId")
    fresh.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .write.mode("overwrite").parquet(s"$graphDir/deg/b=$batchId")
    ()
  }

  /** T32 delete half: retract edges from the maintained store. The
    * increment symmetrizes exactly like an insert (one logical
    * undirected delete retires both directed rows), semi-joins against
    * the strictly-before PRESENT set — absent deletes (including
    * cross-batch re-sent deletes) are no-ops — and writes only the hit
    * edges as w = −1 tombstones plus NEGATIVE degree deltas under its
    * own epoch dir. Replay derives from strictly-before state and
    * overwrites its own dir (the insert batch's discipline), so
    * re-delivery reproduces its bytes; a later re-INSERT of a deleted
    * edge is fresh again by the weight fold (0 → 1).
    */
  def graphEdgesDeleteBatch(deletes: DataFrame, batchId: Long,
      graphDir: String): Unit = {
    val spark = deletes.sparkSession
    val sym = symmetrizeEdges(deletes)
    val hit = priorGraphEdges(spark, graphDir, batchId)
      .map(present => sym.join(present, Seq("src", "dst"), "left_semi"))
      .getOrElse(sym.limit(0))
      .localCheckpoint() // read twice: tombstone write + degree delta
    hit.select(col("src"), col("dst"), lit(-1L).as("w"))
      .write.mode("overwrite").parquet(s"$graphDir/edges/b=$batchId")
    hit.groupBy(col("src")).agg((-count(lit(1))).as("deg"))
      .write.mode("overwrite").parquet(s"$graphDir/deg/b=$batchId")
    ()
  }

  /** T32 mixed-op batch (src, dst, op): op "u" rows fold as edge
    * inserts, op "d" rows as retractions, in ONE epoch commit. The two
    * halves are disjoint by construction (fresh = absent, hit =
    * present) EXCEPT when one batch carries both ops for the same
    * undirected edge — the same-edge ambiguity the T36
    * [[hierarchyOpsBatch]] rejects (a micro-batch carries no
    * intra-batch order, so "insert then delete" and "delete then
    * insert" would commit different stores from the same batch) — so
    * that THROWS before anything commits.
    */
  def graphEdgesOpsBatch(ops: DataFrame, batchId: Long,
      graphDir: String): Unit = {
    val spark = ops.sparkSession
    val opsW = org.apache.spark.sql.expressions.Window
      .partitionBy(least(col("src"), col("dst")),
        greatest(col("src"), col("dst")))
    val o = ops.select(col("src"), col("dst"), col("op"))
      .filter(graft.functions.Guards.assertFilter(col("op").isin("u", "d"),
        "graphEdgesOpsBatch: unknown op (expected 'u' or 'd') — refusing " +
          "to commit an epoch that silently drops a changelog operation"))
      .withColumn("nops", size(collect_set(col("op")).over(opsW)))
      .filter(graft.functions.Guards.assertFilter(col("nops") === lit(1),
        "graphEdgesOpsBatch: an undirected edge carries both an insert " +
          "and a delete in one batch — unordered within a micro-batch, " +
          "so the fold would be ambiguous; sequence the ops into " +
          "separate batches"))
      .localCheckpoint()
    val present = priorGraphEdges(spark, graphDir, batchId)
    val symU = symmetrizeEdges(o.filter(col("op") === "u"))
    val symD = symmetrizeEdges(o.filter(col("op") === "d"))
    val fresh = present
      .map(p => symU.join(p, Seq("src", "dst"), "left_anti"))
      .getOrElse(symU)
    val hit = present
      .map(p => symD.join(p, Seq("src", "dst"), "left_semi"))
      .getOrElse(symD.limit(0))
    val epoch = fresh.select(col("src"), col("dst"), lit(1L).as("w"))
      .unionByName(hit.select(col("src"), col("dst"), lit(-1L).as("w")))
      .localCheckpoint() // read twice: edge write + degree delta
    epoch.write.mode("overwrite").parquet(s"$graphDir/edges/b=$batchId")
    epoch.groupBy(col("src")).agg(sum(col("w")).as("deg"))
      .write.mode("overwrite").parquet(s"$graphDir/deg/b=$batchId")
    ()
  }

  def graphEdgesStream(edgeStream: DataFrame, graphDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    edgeStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graphEdgesBatch(batch.toDF, batchId, graphDir)
    }

  def graphEdgesOpsStream(opsStream: DataFrame, graphDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    opsStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graphEdgesOpsBatch(batch.toDF, batchId, graphDir)
    }

  /** The committed symmetric edge set: weight fold over the epoch union
    * (keeps w = 1, THROWS outside {0,1}); after compaction the store is
    * tombstone-free so the fold degenerates to a scan-shaped groupBy
    * with one row per group. */
  def readGraphEdges(spark: org.apache.spark.sql.SparkSession,
      graphDir: String): DataFrame = {
    val paths = bandBatchDirs(spark, s"$graphDir/edges").map(_._2)
    require(paths.nonEmpty, s"no committed edges under $graphDir")
    foldEdgeEpochs(spark.read.parquet(paths: _*))
  }

  /** The maintained out-degree table: per-epoch deltas re-summed —
    * additively exact, equal to the edge-derived counts by construction
    * (every fresh edge contributes exactly one +1 delta and every
    * retired edge exactly one −1). Nodes swept to degree 0 leave the
    * served table; a NEGATIVE lifetime sum is a torn protocol and
    * THROWS. */
  def readGraphDegrees(spark: org.apache.spark.sql.SparkSession,
      graphDir: String): DataFrame = {
    val paths = bandBatchDirs(spark, s"$graphDir/deg").map(_._2)
    require(paths.nonEmpty, s"no committed degrees under $graphDir")
    spark.read.parquet(paths: _*)
      .groupBy(col("src")).agg(sum(col("deg")).as("deg"))
      .filter(graft.functions.Guards.assertFilter(col("deg") >= 0L,
        "graph degree store: negative lifetime degree sum — a delete " +
          "delta without its matching insert reached the store; the " +
          "batch protocol guarantees it cannot, so this store is corrupt"))
      .filter(col("deg") > 0L)
  }

  /** PageRank served from the maintained stores — the refresh path that
    * skips the per-run edge re-derivation (x7q's point, one level up:
    * durable across sessions, not just across a fold loop). */
  def servedPageRank(spark: org.apache.spark.sql.SparkSession,
      graphDir: String, iters: Int = graft.operators.Graph.prIters,
      scale: Long = graft.operators.Graph.prScale,
      topK: Int = graft.operators.Graph.prTopK): DataFrame =
    graft.operators.Graph.pageRank(readGraphEdges(spark, graphDir),
      iters, scale, topK, presymmetrized = true,
      degIn = Some(readGraphDegrees(spark, graphDir)))

  /** Compact both halves of the graph store through the shared staged
    * protocol: the edge half CLEARS TOMBSTONES (weight fold → keep
    * w = 1, re-written as w = +1 rows so the compacted store is
    * schema-uniform and the post-compaction read fold is one row per
    * group); the degree half re-sums deltas, dropping nodes swept to 0
    * and THROWING on negatives. Quiescent-barrier requirement as
    * [[compactBandStore]]. */
  def compactGraph(spark: org.apache.spark.sql.SparkSession,
      graphDir: String, upTo: Long): Unit = {
    compactStore(spark, s"$graphDir/edges", upTo,
      df => foldEdgeEpochs(df)
        .select(col("src"), col("dst"), lit(1L).as("w")))
    compactStore(spark, s"$graphDir/deg", upTo,
      df => df.groupBy(col("src")).agg(sum(col("deg")).as("deg"))
        .filter(graft.functions.Guards.assertFilter(col("deg") >= 0L,
          "graph degree store compaction: negative lifetime degree sum " +
            "— torn protocol; refusing to compact a corrupt store"))
        .filter(col("deg") > 0L))
  }

  // ------------------- T36 durable hierarchy closure (q32b's durable half)
  /** T36 — the maintained hierarchy closure as a DURABLE versioned
    * store: parent-pointer upserts (org moves, category re-files, BOM
    * revisions) stream in; each batch folds through
    * [[graft.operators.Graph.hierarchyApply]] — affected-subtree
    * recompute against the stored closure, never a full-forest re-walk
    * — and commits the merged closure as a [[SnapshotStore]] version.
    * Crash replay derives from strictly-before state and overwrites its
    * own version (the T31 protocol), so re-delivery is a no-op; a
    * cycle-introducing upsert THROWS inside the fold and the failed
    * commit leaves the store at its prior version (readers never see a
    * corrupt closure).
    */
  /** Shared T36 fold scaffold: read the strictly-before closure (empty
    * seed on the first batch), apply `f`, commit as this batch's version.
    */
  private def foldClosure(spark: org.apache.spark.sql.SparkSession,
      batchId: Long, root: String)(f: DataFrame => DataFrame): Unit = {
    val prior = SnapshotStore.readBefore(spark, root, batchId)
      .getOrElse(graft.operators.Graph.emptyClosure(spark))
    SnapshotStore.commit(f(prior), root, batchId)
  }

  def hierarchyBatch(upserts: DataFrame, batchId: Long,
      root: String): Unit =
    foldClosure(upserts.sparkSession, batchId, root)(
      graft.operators.Graph.hierarchyApply(_, upserts))

  def hierarchyStream(upsertStream: DataFrame, root: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    upsertStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      hierarchyBatch(batch.toDF, batchId, root)
    }

  /** T36 delete half: SUBTREE removals (node column) fold through
    * [[graft.operators.Graph.hierarchyDelete]] and commit as the next
    * store version — the [[hierarchyBatch]] replay discipline (derive
    * from strictly-before state, overwrite own version), and absent
    * deletes are no-ops so a replayed batch reproduces its bytes.
    */
  def hierarchyDeleteBatch(deletes: DataFrame, batchId: Long,
      root: String): Unit =
    foldClosure(deletes.sparkSession, batchId, root)(
      graft.operators.Graph.hierarchyDelete(_, deletes))

  /** T36 mixed-op batch (node, parent, op): op "u" rows fold as
    * parent-pointer upserts, THEN op "d" rows as subtree deletes.
    * Upserts-first is the DEFINED order — a micro-batch carries no
    * intra-batch order, so the fold must pick one and document it;
    * deletes are the batch's final word (an upsert into a subtree the
    * same batch deletes joins it and dies with it, rather than
    * dangling). A node carrying BOTH ops in one batch is the same-node
    * ambiguity [[graft.operators.Graph.hierarchyApply]] rejects — its
    * upsert would be dead on arrival while looking accepted — so it
    * THROWS before anything commits.
    */
  def hierarchyOpsBatch(ops: DataFrame, batchId: Long,
      root: String): Unit = {
    val opsW =
      org.apache.spark.sql.expressions.Window.partitionBy(col("node"))
    val o = ops.select(col("node"), col("parent"), col("op"))
      // an op outside the {u, d} vocabulary must THROW, not vanish: a
      // silently-dropped row commits a version that lost a changelog
      // operation and replay reproduces the loss — the one failure mode
      // every other guard in this module (both-ops, conflicting
      // pointers, cycles, dangling parents) exists to prevent
      .filter(graft.functions.Guards.assertFilter(col("op").isin("u", "d"),
        "hierarchyOpsBatch: unknown op (expected 'u' or 'd') — refusing " +
          "to commit a version that silently drops a changelog operation"))
      .withColumn("nops", size(collect_set(col("op")).over(opsW)))
      .filter(graft.functions.Guards.assertFilter(col("nops") === lit(1),
        "hierarchyOpsBatch: a node carries both an upsert and a " +
          "delete in one batch — the upsert would be dead on arrival; " +
          "sequence the ops into separate batches"))
      .localCheckpoint()
    val dels = o.filter(col("op") === "d").select(col("node"))
    foldClosure(ops.sparkSession, batchId, root) { prior =>
      val upserted = graft.operators.Graph.hierarchyApply(prior,
        o.filter(col("op") === "u").select(col("node"), col("parent")))
      // hierarchyDelete references its closure argument twice and the
      // commit executes the plan once more — checkpoint the merge so the
      // upsert fold runs once; a delete-less batch skips the explode
      // entirely
      if (dels.isEmpty) upserted
      else graft.operators.Graph.hierarchyDelete(
        upserted.localCheckpoint(), dels)
    }
  }

  def hierarchyOpsStream(opsStream: DataFrame, root: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    opsStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      hierarchyOpsBatch(batch.toDF, batchId, root)
    }

  /** The committed closure (None before the first batch commits). */
  def readHierarchy(spark: org.apache.spark.sql.SparkSession,
      root: String): Option[DataFrame] =
    SnapshotStore.read(spark, root)

  // ------------------- T33 durable leakage-split registry (x6h's sticky half)
  /** T33 — the STICKY train/val split registry: x6h's group-aware split
    * maintained as documents stream in. The batch split (x6h) hashes the
    * FINAL cluster representative — correct for a one-shot corpus build,
    * but wrong as a living registry: when later increments merge two
    * clusters, the min-label representative changes and a re-hash would
    * silently MOVE already-assigned documents across the train/val
    * boundary — retroactive leakage, since a moved val document may
    * already have been evaluated against a model trained while it sat in
    * train. The registry therefore makes assignment WRITE-ONCE: each doc
    * is split by the coin of its cluster representative AS OF arrival
    * (the T17 cluster store at the registry batch's own epoch;
    * singletons coin their own id) and never rewritten. A later merge
    * that unites differently-split docs is surfaced — not papered over —
    * by [[splitContamination]]: per CURRENT cluster, the train/val
    * membership counts where both sides are nonzero. The consumer
    * quarantines those clusters (drop from val, or from both) — an
    * explicit, auditable decision instead of a silent migration.
    *
    * Store protocol — identical to T30/T32: per-epoch `b=<id>` dirs,
    * each batch writes only its FRESH docs (anti-join on doc_id against
    * strictly-before epochs; re-sent docs are no-ops), replay derives
    * from own rows + strictly-before state and overwrites its own dir —
    * PLUS a per-batch `ccepoch/b=<id>` manifest recording the cluster
    * epoch the batch assigned with, because the cluster store advances
    * under an independent checkpoint and replay must fold the recorded
    * prefix, not "whatever is committed now" (see the inline comment).
    * Reads are the plain union (epochs disjoint by construction).
    * Scale: per-batch cost is increment-sized (the cluster-map probe
    * broadcasts); the contamination audit is one groupBy over the
    * bounded cluster map joined to the registry — never corpus², and
    * the registry itself never rewrites.
    */
  def splitRegistryBatch(newDocs: DataFrame, batchId: Long,
      regDir: String, clusterDir: String,
      valPct: Int = graft.operators.Curation.splitValPct): Unit = {
    val spark = newDocs.sparkSession
    val priorDirs = bandBatchDirs(spark, regDir)
      .filter(_._1 < batchId).map(_._2)
    val fresh = (if (priorDirs.isEmpty) newDocs.select(col("doc_id"))
      else newDocs.select(col("doc_id")).join(
        spark.read.parquet(priorDirs: _*).select(col("doc_id")),
        Seq("doc_id"), "left_anti"))
    // cluster state AS OF this epoch — made REPLAY-STABLE by a recorded
    // manifest. A bare "committed cluster batches ≤ batchId" filter is
    // not enough: the cluster store is maintained by an INDEPENDENT
    // streaming query with its own checkpoint, so a cluster epoch
    // ≤ batchId can commit AFTER this registry batch first ran; a crash
    // replay would then fold newer merges and assign DIFFERENT grp/split
    // bytes to the same docs — the retroactive train/val migration T33
    // exists to prevent. First execution snapshots the cluster epoch it
    // assigns with into `ccepoch/b=<id>` BEFORE the data write (the
    // decision commits first, so a crash between the two writes replays
    // deterministically); replay folds exactly the recorded prefix and
    // reproduces the batch dir byte-identically.
    val manifest = s"$regDir/ccepoch/b=$batchId"
    val manifestPath = new org.apache.hadoop.fs.Path(manifest)
    val fs = manifestPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the manifest is authoritative only once its write COMMITTED: a
    // crash mid-write leaves a partial directory, and a bare exists()
    // check would treat it as committed — the read then throws on every
    // replay and wedges the stream. Gate on the committer's _SUCCESS
    // marker instead; a partial dir fails the gate and is healed by the
    // mode("overwrite") rewrite below. Re-deriving is sound there
    // because the manifest commits BEFORE the data write: a partial
    // manifest means no registry data was ever written under the old
    // decision, so adopting a fresher cluster prefix commits a new
    // decision, not a contradiction of an applied one.
    val committed = fs.exists(
      new org.apache.hadoop.fs.Path(manifestPath, "_SUCCESS"))
    val ccEpoch: Long =
      if (committed)
        spark.read.parquet(manifest).head().getLong(0)
      else {
        val eps = bandBatchDirs(spark, clusterDir).map(_._1)
          .filter(_ <= batchId)
        val e = if (eps.isEmpty) Long.MinValue else eps.max
        spark.range(1).select(lit(e).as("cc_epoch"))
          .coalesce(1).write.mode("overwrite").parquet(manifest)
        e
      }
    val ccDirs = bandBatchDirs(spark, clusterDir)
      .filter(_._1 <= ccEpoch).map(_._2)
    val cc =
      if (ccDirs.isEmpty)
        fresh.limit(0).select(col("doc_id").as("node"),
          col("doc_id").as("cluster"))
      else foldClusterMap(spark.read.parquet(ccDirs: _*))
    fresh.join(broadcast(cc), fresh("doc_id") === cc("node"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("grp"))
      .select(col("doc_id"), col("grp"),
        graft.operators.Curation.splitOf(col("grp"), valPct).as("split"))
      .write.mode("overwrite").parquet(s"$regDir/b=$batchId")
    ()
  }

  def splitRegistryStream(docStream: DataFrame, regDir: String,
      clusterDir: String,
      valPct: Int = graft.operators.Curation.splitValPct)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      splitRegistryBatch(batch.toDF, batchId, regDir, clusterDir, valPct)
    }

  /** The committed write-once assignments: (doc_id, grp-at-assignment,
    * split). Epochs are disjoint → plain union, no fold window. */
  def readSplits(spark: org.apache.spark.sql.SparkSession,
      regDir: String): DataFrame = {
    val paths = bandBatchDirs(spark, regDir).map(_._2)
    require(paths.nonEmpty, s"no committed splits under $regDir")
    spark.read.parquet(paths: _*)
  }

  /** Clusters whose CURRENT membership mixes train and val assignments —
    * the quarantine list a consumer must act on after merges. Output:
    * (cluster, n_train, n_val), both nonzero. Unclustered docs cannot
    * contaminate (their group is themselves). */
  def splitContamination(spark: org.apache.spark.sql.SparkSession,
      regDir: String, clusterDir: String): DataFrame = {
    val assigned = readSplits(spark, regDir)
    val cc = readClusterMap(spark, clusterDir)
    assigned.join(cc, assigned("doc_id") === cc("node"))
      .groupBy(col("cluster"))
      .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"))
      .filter(col("n_train") > 0 && col("n_val") > 0)
  }

  // ---------------- T34 streaming erasure propagation (C26's durable half)
  /** T34 — ERASURE PROPAGATION through the maintained stores: C26 sweeps
    * a batch changelog, but a right-to-be-forgotten request arriving on a
    * LIVE pipeline has two more obligations the batch sweep cannot meet:
    * (1) every DURABLE store already derived from the log (the T23 SCD2
    * history, the T6 merged snapshot) still holds the subject's PII and
    * must be redacted IN PLACE — a full rebuild from the swept log
    * rescans the world; (2) events for the subject that arrive AFTER the
    * request (stragglers, upstream replays) must never land with PII
    * again. Three pieces close both:
    *
    *   - [[erasureLedgerBatch]] folds requests into a durable id ledger
    *     (versioned [[SnapshotStore]], request-count-bounded — the only
    *     state erasure needs to remember forever);
    *   - [[redactIncoming]] wraps [[graft.operators.Cdc.erasureSweep]]
    *     over the ledger: composed in front of any store sink, it makes
    *     post-request arrivals PII-free at ingest (broadcast probe +
    *     projection, no shuffle of the batch);
    *   - [[erasureApplyStore]] redacts a partitioned store in place:
    *     only the buckets holding erased keys are read and rewritten
    *     (the C20-repair discipline — 0.1% of subjects ⇒ ~0.1% of the
    *     keyspace touched), committed as a normal epoch so readers see
    *     an atomic pointer flip and crash replay re-derives from
    *     strictly-before state.
    *
    * Structure survives exactly as in C26: keys, intervals, lsns, and
    * tombstone markers are untouched — only the PII attribute columns
    * null out, so every downstream fold, audit, and join keeps its
    * cardinality. The apply epoch must come from the same monotone
    * sequence as the store's writer (in a deployment the requests ride
    * the same changelog stream, so foreachBatch supplies it).
    */
  def erasureLedgerBatch(requests: DataFrame, batchId: Long,
      ledgerRoot: String): Unit = {
    val spark = requests.sparkSession
    val ids = requests.select(col("id")).distinct()
    val merged = SnapshotStore.readBefore(spark, ledgerRoot, batchId) match {
      case Some(p) => p.unionByName(ids).distinct()
      case None => ids
    }
    // the ledger is erasure-request-bounded: one file per version
    SnapshotStore.commit(merged.coalesce(1), ledgerRoot, batchId)
  }

  /** The durable erased-key set (None before any request committed). */
  def readErased(spark: org.apache.spark.sql.SparkSession,
      ledgerRoot: String): Option[DataFrame] =
    SnapshotStore.read(spark, ledgerRoot)

  /** Ingest-side guard: redact an incoming changelog batch against the
    * ledger so post-request events never reintroduce PII. Pass-through
    * until the first request commits.
    */
  def redactIncoming(batch: DataFrame, ledgerRoot: String): DataFrame =
    readErased(batch.sparkSession, ledgerRoot) match {
      case Some(erased) =>
        graft.operators.Cdc.erasureSweep(batch, erased).drop("redacted")
      case None => batch
    }

  /** Redact `piiCols` to null for the ledger's keys across one
    * partitioned store, touching only the buckets that hold them. No-op
    * before any request commits. Idempotent: redacting redacted rows
    * changes nothing, and a replay of `epoch` re-derives from
    * strictly-before state and overwrites its own version dirs.
    */
  def erasureApplyStore(spark: org.apache.spark.sql.SparkSession,
      storeRoot: String, epoch: Long, piiCols: Seq[String],
      ledgerRoot: String, keyCol: String = "id"): Unit =
    readErased(spark, ledgerRoot).foreach { erased =>
      val buckets = PartitionedSnapshotStore.bucketCount(spark, storeRoot)
        .getOrElse(sys.error(s"no bucket count under $storeRoot"))
      val bcol = PartitionedSnapshotStore.bucketColName
      val req = erased.select(col("id").as("__erased")).distinct()
        .withColumn(bcol,
          PartitionedSnapshotStore.bucketOf(col("__erased"), buckets))
      val affected = req.select(col(bcol)).distinct()
      PartitionedSnapshotStore.readBefore(spark, storeRoot, epoch).foreach { p =>
        val touched = p.withColumn(bcol,
            PartitionedSnapshotStore.bucketOf(col(keyCol), buckets))
          .join(broadcast(affected), bcol)
        val marked = touched.join(
          broadcast(req.select(col("__erased"))),
          col(keyCol) === col("__erased"), "left")
        val redacted = piiCols.foldLeft(marked) { (df, c) =>
          df.withColumn(c, when(col("__erased").isNotNull,
            lit(null).cast(df.schema(c).dataType)).otherwise(col(c)))
        }.drop("__erased")
        PartitionedSnapshotStore.commit(redacted, storeRoot, epoch)
      }
    }

  /** Erasure propagation into the SEARCH-SERVING stores — the second
    * half of GDPR completeness: [[erasureApplyStore]] redacts the
    * snapshot-shaped stores, but a forgotten document's CONTENT also
    * lives on in every derived search structure — its BM25 postings
    * (T30), positional rows (T35), ANN encoding (T16/T18), MinHash
    * bands and discovered pairs (T13), and exact shingle sets (T25).
    * One ledger read drives all of them:
    *
    *   - postings / positions / vector index already speak per-key
    *     tombstones (their winner folds were built for document CDC),
    *     so erasure IS a delete epoch: the doc leaves serving
    *     immediately, and the respective compaction drops its rows
    *     physically;
    *   - bands / pairs / shingles have immutable content-derived rows,
    *     so erasure writes their [[retireDocsBatch]] dead-set markers:
    *     reads and probes drop the doc at once (it can no longer form
    *     new pairs either), and compaction removes its rows physically.
    *
    * Idempotent and replayable like every epoch write here: each store
    * write derives only from the ledger + its own epoch id; re-sending
    * an already-erased id re-tombstones / re-marks, which reads fold to
    * the same view. The epoch must come from the same monotone sequence
    * as each store's writer (the [[erasureApplyStore]] contract).
    */
  def erasureApplySearchStores(spark: org.apache.spark.sql.SparkSession,
      epoch: Long, ledgerRoot: String,
      postingsDir: Option[String] = None,
      positionsDir: Option[String] = None,
      vectorIndex: Option[(String, Array[Array[Float]],
        Array[Array[Array[Float]]])] = None,
      bandDir: Option[String] = None,
      pairDirs: Seq[String] = Nil,
      shingleDir: Option[String] = None,
      graphDir: Option[String] = None): Unit =
    readErased(spark, ledgerRoot).foreach { erased =>
      val ids = erased.select(col("id").as("doc_id")).distinct()
        .localCheckpoint() // probed once per targeted store
      val noUpserts = ids.limit(0).withColumn("text", lit(""))
      postingsDir.foreach(d => postingsApplyBatch(noUpserts, ids, epoch, d))
      positionsDir.foreach(d => positionsApplyBatch(noUpserts, ids, epoch, d))
      vectorIndex.foreach { case (d, coarse, books) =>
        vectorIndexApplyBatch(
          ids.limit(0).select(col("doc_id").as("vec_id")).withColumn(
            "embedding", lit(null).cast("array<float>")),
          ids.select(col("doc_id").as("vec_id")), epoch, d, coarse, books)
      }
      bandDir.foreach(d => retireDocsBatch(ids, epoch, d))
      shingleDir.foreach(d => retireDocsBatch(ids, epoch, d))
      pairDirs.foreach(d => retireDocsBatch(ids, epoch, d))
      // the T32 co-occurrence graph: an erased doc's node must leave —
      // its INCIDENT edges become a delete batch (one directed row per
      // undirected edge suffices; the delete path symmetrizes), its
      // degree sweeps to 0, partners' degrees decrement additively.
      // Incident edges derive from the STRICTLY-BEFORE present set, not
      // the current one — deriving from a view that includes this
      // epoch's own tombstones would make a crash replay see a smaller
      // incident set and commit different bytes
      graphDir.foreach { d =>
        priorGraphEdges(spark, d, epoch).foreach { present =>
          val incident = present.join(
            broadcast(ids.select(col("doc_id").as("src"))),
            Seq("src"), "left_semi")
          graphEdgesDeleteBatch(incident, epoch, d)
        }
      }
    }

  // ------------------------- T23 incremental SCD2 history maintenance
  /** T23 — the OTHER classic CDC materialization (C4 keeps latest
    * state; SCD2 keeps every version with its validity interval),
    * maintained incrementally through the partitioned store. The
    * insight that makes this exact rather than approximate: the STORED
    * history is a lossless compression of the key's event stream —
    * every version row re-expands to an upsert at `valid_from`, and
    * every delete persists as a ZERO-WIDTH marker row (valid_to =
    * valid_from, null attributes) that re-expands to its `d` event. The
    * marker is load-bearing: the random-split property test caught that
    * a gap-based encoding (infer deletes from valid_to ≠ next
    * valid_from) silently LOSES a dangling delete — one whose key has
    * no earlier live version in the store yet because the create is
    * still in flight in a later batch — and the fold then resurrects
    * the row the delete should have killed. With markers, each epoch
    * rebuilds ONLY the touched buckets' histories from compact state +
    * the increment and re-runs the same per-key window fold as the
    * batch operator, so late events (an lsn older than the key's open
    * interval) land exactly where a close-and-append form would corrupt
    * the history. [[readScd2]] hides the markers. Apply cost: the
    * touched buckets' histories, never the table; same crash calculus
    * as every keyed-merge sink (strictly-before read, epoch-keyed
    * commit).
    */
  def scd2Batch(batch: DataFrame, batchId: Long, root: String,
      buckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    val bcol = PartitionedSnapshotStore.bucketColName
    PartitionedSnapshotStore.ensureBucketCount(spark, root, buckets)
    val ev = batch
      .withColumn("id", coalesce(col("after.id"), col("before.id")))
      .select(col("id"), col("op"), col("source.lsn").as("lsn"),
        col("after.email").as("email"))
      .withColumn(bcol, PartitionedSnapshotStore.bucketOf(col("id"), buckets))
    val affected = ev.select(col(bcol)).distinct()
    val prior = PartitionedSnapshotStore.readBefore(spark, root, batchId)
      .map(_.withColumn(bcol,
          PartitionedSnapshotStore.bucketOf(col("id"), buckets))
        .join(broadcast(affected), bcol))
    // re-expand stored rows to events: version rows are upserts at
    // valid_from, zero-width marker rows are the deletes themselves
    val priorEvents = prior.map { h =>
      h.select(col(bcol), col("id"),
        when(col("valid_to") <=> col("valid_from"), lit("d"))
          .otherwise(lit("u")).as("op"),
        col("valid_from").as("lsn"), col("email"))
    }
    val all = priorEvents.map(_.unionByName(ev)).getOrElse(ev)
    // deterministic (id, lsn) dedup: replays and producer double-sends
    // collapse to one event, never a zero-width interval
    val dedup = all.groupBy(col(bcol), col("id"), col("lsn"))
      .agg(max(struct(col("op"), col("email"))).as("s"))
      .select(col(bcol), col("id"), col("s.op").as("op"), col("lsn"),
        col("s.email").as("email"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("lsn").asc)
    val next = dedup
      .withColumn("valid_to", lead(col("lsn"), 1).over(w))
      // deletes persist as zero-width markers (valid_to = own lsn, null
      // attributes) so a dangling delete survives the compact state
      .withColumn("valid_to",
        when(col("op") === "d", col("lsn")).otherwise(col("valid_to")))
      .withColumn("email",
        when(col("op") === "d", lit(null).cast("string"))
          .otherwise(col("email")))
      .select(col(bcol), col("id"), col("lsn").as("valid_from"),
        col("valid_to"), col("email"))
    PartitionedSnapshotStore.commit(next, root, batchId)
  }

  def scd2ForeachBatch(events: Dataset[graft.Schemas.CdcEvent], root: String,
      buckets: Int = 16)
      : org.apache.spark.sql.streaming.DataStreamWriter[graft.Schemas.CdcEvent] =
    events.writeStream.foreachBatch {
      (batch: Dataset[graft.Schemas.CdcEvent], batchId: Long) =>
      scd2Batch(batch.toDF, batchId, root, buckets)
    }

  /** The committed history (every version of every key with its
    * validity interval; open versions have null valid_to). Zero-width
    * delete markers are storage detail, not history — hidden here.
    */
  def readScd2(spark: org.apache.spark.sql.SparkSession,
      root: String): Option[DataFrame] =
    PartitionedSnapshotStore.read(spark, root)
      .map(_.filter(!(col("valid_to") <=> col("valid_from"))))

  // ---------------------- T24 continuous replica audit (C20 streaming)
  /** T24 — C20 as a monitoring LOOP instead of a quarterly full
    * compare: the producer publishes its own nBuckets-row checksum
    * table per epoch (tiny — `Cdc.bucketChecksums` over its state,
    * riding the same channel as the data), and after applying the
    * epoch the consumer audits its replica VIEW against it and commits
    * the per-bucket verdicts to an alert store. Divergence surfaces
    * one epoch after it happens, at the bucket granularity the repair
    * path ([[graft.operators.Cdc.repairFromAudit]]) consumes directly.
    * The alert store is itself versioned, so "when did we diverge" is
    * a readBefore walk, not archaeology. Cost per epoch: one replica
    * scan (map-side combined to nBuckets rows) + an nBuckets-row join.
    */
  def auditReplicaBatch(srcChecksums: DataFrame, replicaView: DataFrame,
      batchId: Long, alertRoot: String, keys: Seq[String],
      nBuckets: Int): Unit = {
    val verdicts = graft.operators.Cdc.reconcileChecksumTables(
        srcChecksums,
        graft.operators.Cdc.bucketChecksums(replicaView, keys, nBuckets))
      .withColumn("epoch", lit(batchId))
    SnapshotStore.commit(verdicts.coalesce(1), alertRoot, batchId)
  }

  /** Latest verdicts (filter `!is_match` for the alerts). */
  def readAuditVerdicts(spark: org.apache.spark.sql.SparkSession,
      alertRoot: String): Option[DataFrame] =
    SnapshotStore.read(spark, alertRoot)

  // ----------- T27 streaming temporal enrichment join (C22 streaming)
  /** T27 — the canonical production CDC CONSUMER: a fact stream
    * enriched with the dimension attributes valid AT THE FACT'S OWN
    * TIME, read from the SCD2 history T23 maintains. C22 answers this
    * for a batch fact table; real fact streams (orders, clicks,
    * payments) arrive continuously while the dimension history advances
    * underneath — so each micro-batch joins against the COMMITTED
    * history as of its own read (the pointer protocol makes that a
    * consistent snapshot, never a half-applied epoch), equi-key plus
    * the interval residual — Catalyst plans SMJ/SHJ on the key, never a
    * cartesian, the C22 plan shape exactly. Facts with no valid version
    * (out-of-history times, unknown keys) carry nulls rather than
    * dropping — the left-join audit trail.
    *
    * Consistency contract: enrichment is AS-OF the batch's committed
    * history — a dimension update that lands after the fact's batch was
    * enriched does NOT retro-enrich (that is C22's batch re-run; the
    * spec drives dimensions fully first, making stream ≡ batch exact).
    * Output lands in batchId-keyed overwrite dirs — the T13 idempotent
    * replay protocol: a re-delivered batch rewrites its own dir
    * byte-identically because the history it reads is versioned.
    *
    * Scale: per batch, one broadcast-or-shuffle equi-join of the batch
    * against the history's touched keys; the history is bucketed by key
    * (PartitionedSnapshotStore), so a cluster deployment prunes to the
    * buckets the batch's keys hash into.
    */
  def enrichFactsBatch(facts: DataFrame, batchId: Long, scd2Root: String,
      outDir: String, keyCol: String = "custkey",
      timeCol: String = "flsn"): Unit = {
    val spark = facts.sparkSession
    val enriched = readScd2(spark, scd2Root) match {
      case Some(hist) =>
        facts.join(hist,
          facts(keyCol) === hist("id") &&
            facts(timeCol) >= hist("valid_from") &&
            (hist("valid_to").isNull || facts(timeCol) < hist("valid_to")),
          "left")
          .select(facts.columns.map(facts(_)) :+ hist("email"): _*)
      case None => facts.withColumn("email", lit(null).cast("string"))
    }
    enriched.write.mode("overwrite").parquet(s"$outDir/b=$batchId")
  }

  def enrichFactsStream(factStream: DataFrame, scd2Root: String,
      outDir: String, keyCol: String = "custkey", timeCol: String = "flsn")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    factStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      enrichFactsBatch(batch.toDF, batchId, scd2Root, outDir, keyCol, timeCol)
    }

  /** Every enriched fact across all committed batches. */
  def readEnrichedFacts(spark: org.apache.spark.sql.SparkSession,
      outDir: String): DataFrame =
    readBatchStore(spark, outDir, "enriched-fact")

  // ------------- T28 exactly-once outbox publisher (C23 streaming)
  /** T28 — C23's outbox router under AT-LEAST-ONCE delivery with an
    * EXACTLY-ONCE publish guarantee: foreachBatch re-delivers on
    * failure, and a replayed or overlapping batch must not re-publish a
    * domain event (the whole point of the outbox pattern is that
    * downstream consumers see each event once). The dedup ledger is
    * O(1), not a published-id set: outbox lsns arrive in order across
    * batches (the reference's single-partition topic semantics —
    * `docker-compose.yml:36` — and any per-partition Kafka consumer),
    * so "already published" is exactly "lsn ≤ the committed high-water
    * mark". Per batch: route inserts ([[graft.operators.Cdc
    * .outboxRoute]] — purges never publish), keep lsn > hwm (in-batch
    * duplicates collapse on lsn), append to a batchId-keyed overwrite
    * dir, commit max(lsn) as the new hwm through the versioned store.
    * Replay derives from strictly-before state → identical publish set
    * → same dir overwritten: exactly-once survives both re-delivered
    * batches AND overlapping re-sends inside later batches. The ordered-
    * arrival ASSUMPTION is audited per batch (skipped lsns must exist in
    * the published store, else THROW — see the inline note), so a
    * reordered source degrades to a loud failure, not at-most-once.
    *
    * Scale: the ledger is ONE row; the batch pass is a filter + distinct
    * on the increment. (A multi-partition source keys the hwm by
    * partition — same shape, nPartitions rows.)
    */
  def outboxPublishBatch(outbox: DataFrame, batchId: Long, root: String,
      outDir: String, topicPrefix: String = "outbox.event",
      auditOrdering: Boolean = true): Unit = {
    val spark = outbox.sparkSession
    import spark.implicits._
    val hwm: Long = SnapshotStore.readBefore(spark, root, batchId) match {
      case Some(df) => df.select(col("hwm")).as[Long].collect()
        .headOption.getOrElse(Long.MinValue)
      case None => Long.MinValue
    }
    val routed = graft.operators.Cdc.outboxRoute(outbox, topicPrefix)
      .localCheckpoint() // read twice: fresh split + ordering audit
    val fresh = routed
      .filter(col("lsn") > hwm)
      .dropDuplicates("lsn")
      .localCheckpoint() // read twice: publish + new hwm
    // ORDERING AUDIT: "lsn ≤ hwm ⇒ already published" is the load-bearing
    // assumption of the O(1) ledger — under reordered delivery it silently
    // degrades exactly-once to at-most-once (a never-published low lsn is
    // dropped as a duplicate). Enforce it: every skipped lsn must exist in
    // the published store, else THROW. Cost: the probe side is only the
    // batch's skipped lsns (empty outside replay/overlap); the store side
    // is a scan of published epochs — increment-sized stores fine; a
    // deployment whose store outgrows this audit disables it after its
    // broker guarantees per-partition order (`auditOrdering = false`).
    if (auditOrdering && hwm > Long.MinValue) {
      val skipped = routed.filter(col("lsn") <= hwm)
        .select(col("lsn")).distinct()
      val missing = skipped.join(
        readPublished(spark, outDir).select(col("lsn")), Seq("lsn"),
        "left_anti")
      if (!missing.isEmpty) throw new IllegalStateException(
        "outboxPublishBatch: out-of-order delivery — lsn(s) at or below " +
          "the committed high-water mark were never published and would " +
          "be silently dropped; restore ordered delivery or key the hwm " +
          "by source partition.")
    }
    fresh.write.mode("overwrite").parquet(s"$outDir/b=$batchId")
    val newHwm = Option(fresh.agg(max(col("lsn"))).head().get(0))
      .map(_.asInstanceOf[Long]).map(math.max(_, hwm)).getOrElse(hwm)
    SnapshotStore.commit(Seq(newHwm).toDF("hwm").coalesce(1), root, batchId)
  }

  def outboxPublishStream(outboxStream: DataFrame, root: String,
      outDir: String, topicPrefix: String = "outbox.event")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    outboxStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      outboxPublishBatch(batch.toDF, batchId, root, outDir, topicPrefix)
    }

  /** Every published record across all committed batches — each event
    * lsn appears exactly once by the hwm contract.
    */
  def readPublished(spark: org.apache.spark.sql.SparkSession,
      outDir: String): DataFrame =
    readBatchStore(spark, outDir, "published")

  // ------------- T29 bucketed sketch store (per-day HLL, range-union reads)
  /** T29 — the BUCKETED form of the durable sketch tier: one HLL sketch
    * PER TIME BUCKET (day), maintained through the versioned store, so
    * any trailing-window distinct count — q33's DAU/WAU pair at
    * unbounded scale — reads as a UNION OF SKETCHES over the bucket
    * range instead of a rescan of raw events. This is the documented
    * trade in q33's scaladoc made concrete: exact rolling distinct costs
    * a 7×-amplified shuffle per refresh and cannot decompose
    * incrementally (sets don't subtract), while per-bucket sketches
    * merge in O(#buckets × sketch bytes) for ANY window placement, with
    * T21's ~1.6% error at lgK=12.
    *
    * Per batch: ONE codegen'd `hll_sketch_agg` pass grouped by bucket
    * (map-side merged), then per-bucket `hll_union` against the
    * committed sketch table — state is O(#buckets × 2^lgK bytes),
    * additions are register-max so replay recommits BYTE-identical rows
    * (the T21 contract, per bucket). The strictly-before read is what
    * carries that contract: re-unioning already-included data into a
    * sketch is semantically idempotent but NOT byte-canonical in the
    * DataSketches serialization (the HIP accumulator moves), so a
    * replay that merged against its own epoch's output would commit
    * different bytes for identical estimates. Reads union the committed rows
    * with `hll_union_agg` — nothing rescans events, and a dashboard
    * asking for any [d−w, d] window touches w rows.
    *
    * `events` must carry (`bucket`: long, `item`: string-castable).
    */
  def bucketSketchBatch(events: DataFrame, batchId: Long, root: String,
      lgK: Int = 12): Unit = {
    val spark = events.sparkSession
    val batchSk = events
      .groupBy(col("bucket"))
      .agg(expr(s"hll_sketch_agg(CAST(item AS STRING), $lgK)").as("sk"))
    val merged = SnapshotStore.readBefore(spark, root, batchId) match {
      case Some(prior) =>
        prior.select(col("bucket"), col("sketch").as("prior_sk"))
          .join(batchSk, Seq("bucket"), "full_outer")
          .select(col("bucket"),
            when(col("prior_sk").isNull, col("sk"))
              .when(col("sk").isNull, col("prior_sk"))
              .otherwise(expr("hll_union(prior_sk, sk)")).as("sketch"))
      case None => batchSk.select(col("bucket"), col("sk").as("sketch"))
    }
    SnapshotStore.commit(merged.orderBy(col("bucket")).coalesce(1),
      root, batchId)
  }

  def bucketSketchStream(eventStream: DataFrame, root: String, lgK: Int = 12)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    eventStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      bucketSketchBatch(batch.toDF, batchId, root, lgK)
    }

  /** Distinct-count estimate over any bucket range [lo, hi] — a union of
    * ≤ (hi−lo+1) committed sketch rows; 0 for an empty range or
    * never-fed store.
    */
  def readRangeDistinct(spark: org.apache.spark.sql.SparkSession,
      root: String, lo: Long, hi: Long): Long =
    SnapshotStore.read(spark, root) match {
      case Some(df) =>
        val in = df.filter(col("bucket") >= lo && col("bucket") <= hi)
        if (in.isEmpty) 0L
        else in.agg(expr(
          "CAST(hll_sketch_estimate(hll_union_agg(sketch)) AS BIGINT)"))
          .head().getLong(0)
      case None => 0L
    }

  // ---------------------- T21 durable streaming distinct count (HLL union)
  /** T21 — durable approximate distinct counting over an unbounded
    * stream: the T20 shape with a DataSketches HLL sketch as the
    * mergeable summary (Spark's `hll_sketch_agg` / `hll_union` /
    * `hll_sketch_estimate`, the SPARK-16484 lineage). Per batch, ONE
    * codegen'd aggregation pass reduces the increment to a ≤ ~2^lgK-byte
    * sketch (internally merged map-side under the same union rule), and
    * the committed sketch merges with it through the versioned store's
    * pointer protocol — state is O(2^lgK) bytes forever, the classic
    * "how many distinct users/tokens/URLs has this stream ever seen"
    * without storing the key set. Replay derives from strictly-before
    * state (`readBefore`), and — unlike T20's partition-order-dependent
    * MG estimates — HLL register merges are order-insensitive, so a
    * replayed batch recommits a BYTE-identical sketch. The q9d oracle
    * query is the batch twin of exactly this union rule.
    */
  def distinctCountBatch(items: DataFrame, batchId: Long, root: String,
      itemCol: String = "item", lgK: Int = 12): Unit = {
    val spark = items.sparkSession
    import spark.implicits._
    val batchSk: Option[Array[Byte]] = Option(
      items.select(expr(s"hll_sketch_agg(`$itemCol`, $lgK)").as("sk"))
        .head().getAs[Array[Byte]]("sk"))
    val priorSk: Option[Array[Byte]] =
      SnapshotStore.readBefore(spark, root, batchId)
        .flatMap(_.collect().headOption)
        .flatMap(r => Option(r.getAs[Array[Byte]]("sketch")))
    val merged: Option[Array[Byte]] = (priorSk, batchSk) match {
      case (Some(p), Some(b)) =>
        // one-row plan: the union itself is the engine's own expression,
        // not a reimplementation
        Some(Seq((p, b)).toDF("a", "b")
          .select(expr("hll_union(a, b)").as("u"))
          .head().getAs[Array[Byte]]("u"))
      case (p, b) => b.orElse(p)
    }
    SnapshotStore.commit(
      merged.map(m => Seq(Tuple1(m)).toDF("sketch"))
        .getOrElse(Seq.empty[Tuple1[Array[Byte]]].toDF("sketch"))
        .coalesce(1),
      root, batchId)
  }

  def distinctCountStream(itemStream: DataFrame, root: String,
      itemCol: String = "item", lgK: Int = 12)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    itemStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      distinctCountBatch(batch.toDF, batchId, root, itemCol, lgK)
    }

  /** The committed estimate (0 for a never-fed stream). Relative error
    * ~1.04/√2^lgK (≈1.6% at the default lgK=12).
    */
  def readDistinctCount(spark: org.apache.spark.sql.SparkSession,
      root: String): Long =
    SnapshotStore.read(spark, root) match {
      case Some(df) if !df.isEmpty =>
        df.select(expr("CAST(hll_sketch_estimate(sketch) AS BIGINT)").as("n"))
          .head().getLong(0)
      case _ => 0L
    }

  /** The raw committed sketch bytes — for the replay byte-identity
    * contract and for cross-store unions (a fleet of per-shard streams
    * each committing its own sketch unions into a global count with
    * `hll_union_agg`, no re-scan).
    */
  def readDistinctSketch(spark: org.apache.spark.sql.SparkSession,
      root: String): Option[Array[Byte]] =
    SnapshotStore.read(spark, root)
      .flatMap(_.collect().headOption)
      .flatMap(r => Option(r.getAs[Array[Byte]]("sketch")))

  // ------------------- T22 durable streaming frequency oracle (CMS merge)
  /** T22 — durable point-frequency estimation, completing the streaming
    * sketch tier: MG heavy hitters undercount-bounded (T20), HLL
    * distinct counts (T21), and now a Count–Min grid answering "how
    * often has item x occurred on this stream, ever" for ANY x, with
    * the x4m overcount-only contract (est ≥ true; est ≤ true + ε·N
    * w.h.p.) surviving every merge — CMS merge is elementwise counter
    * addition, so the committed grid after any epoch sequence equals
    * the single-pass grid over the concatenated stream EXACTLY. Per
    * batch: one codegen'd `count_min_sketch` aggregation (map-side
    * merged), then the committed ~10 KB sketch merges with the batch's
    * via Spark's own `CountMinSketch.mergeInPlace` (same eps/confidence/
    * seed ⇒ same grid shape — the store carries one sketch config for
    * its lifetime, like `_BUCKETS`). Replay derives from strictly-before
    * state and counter addition is deterministic, so a re-delivered
    * batch recommits BYTE-identical state (the T21 contract, stronger
    * than T20's). Reads probe the grid with the codegen'd `cms_probe`
    * expression — the sketch is a plan literal, no broadcast, no join.
    */
  def cmsBatch(items: DataFrame, batchId: Long, root: String,
      itemCol: String = "item", eps: Double = 0.01,
      confidence: Double = 0.99, seed: Int = 42): Unit = {
    val spark = items.sparkSession
    import spark.implicits._
    val batchSk: Option[Array[Byte]] = Option(
      items.agg(count_min_sketch(col(itemCol), lit(eps), lit(confidence),
        lit(seed)).as("s")).head().getAs[Array[Byte]]("s"))
    val priorSk: Option[Array[Byte]] =
      SnapshotStore.readBefore(spark, root, batchId)
        .flatMap(_.collect().headOption)
        .flatMap(r => Option(r.getAs[Array[Byte]]("sketch")))
    val merged: Option[Array[Byte]] = (priorSk, batchSk) match {
      case (Some(p), Some(b)) =>
        val acc = org.apache.spark.util.sketch.CountMinSketch.readFrom(p)
        acc.mergeInPlace(
          org.apache.spark.util.sketch.CountMinSketch.readFrom(b))
        val bos = new java.io.ByteArrayOutputStream()
        acc.writeTo(bos)
        Some(bos.toByteArray)
      case (p, b) => b.orElse(p)
    }
    SnapshotStore.commit(
      merged.map(m => Seq(Tuple1(m)).toDF("sketch"))
        .getOrElse(Seq.empty[Tuple1[Array[Byte]]].toDF("sketch"))
        .coalesce(1),
      root, batchId)
  }

  def cmsStream(itemStream: DataFrame, root: String,
      itemCol: String = "item", eps: Double = 0.01,
      confidence: Double = 0.99, seed: Int = 42)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    itemStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      cmsBatch(batch.toDF, batchId, root, itemCol, eps, confidence, seed)
    }

  /** Probe the committed grid for each row of `probes`: adds an `est`
    * column via the codegen'd `cms_probe` expression (grid as plan
    * literal — the probe side can be a billion-row vocabulary, nothing
    * broadcasts or joins). A never-fed store estimates 0 everywhere.
    */
  def readCmsEstimates(spark: org.apache.spark.sql.SparkSession,
      root: String, probes: DataFrame,
      itemCol: String = "item"): DataFrame =
    readCmsSketch(spark, root) match {
      case Some(bytes) =>
        val grid = graft.functions.CountMinProbe.parse(bytes)
        probes.withColumn("est",
          graft.functions.CountMinProbe.probe(grid, col(itemCol)))
      case None => probes.withColumn("est", lit(0L))
    }

  def readCmsSketch(spark: org.apache.spark.sql.SparkSession,
      root: String): Option[Array[Byte]] =
    SnapshotStore.read(spark, root)
      .flatMap(_.collect().headOption)
      .flatMap(r => Option(r.getAs[Array[Byte]]("sketch")))

  // -------------------- T26 durable streaming quantiles (Q-digest merge)
  /** T26 — durable QUANTILE estimation, the last member of the streaming
    * sketch tier (T20 heavy hitters, T21 distinct, T22 frequency —
    * this answers "what is the p99 of everything this stream has ever
    * carried"). The summary is a [[graft.functions.QDigest]]: a
    * DETERMINISTIC mergeable quantile digest over a fixed 2^16 integer
    * universe, rank error ≤ log2(U)·n/k after ANY merge tree
    * (thresholds scale with n, so the digest invariant survives epoch
    * folding — see QDigest's scaladoc).
    *
    * Per batch: one map-side-combined `groupBy(v).count()` reduces the
    * increment to per-leaf counts — ≤ U = 65536 rows by construction, a
    * CONSTANT bound independent of batch size (the bounded-
    * materialization tier; c.f. T22's ~10 KB grid) — compressed
    * driver-side to ≤ 3k nodes and merged with the committed digest
    * under the store's pointer protocol. Count addition and the sorted
    * compress are deterministic, so a replayed batch recommits
    * BYTE-identical state (the T21/T22 contract). The committed NODE
    * MAP after an epoch sequence is not in general byte-equal to the
    * single-pass digest (compression decisions depend on intermediate
    * thresholds), but both satisfy the same rank bound and hold the
    * same total — which is the digest's contract, and what the spec
    * asserts.
    *
    * `values` must carry one long column `v` (caller maps its domain
    * into [0, U); [[QDigest.leaf]] clamps). The q8g batch twin checks
    * the same digest's rank bound against exact SQL quantiles
    * cross-engine.
    */
  def quantileBatch(values: DataFrame, batchId: Long, root: String,
      k: Int = 512): Unit = {
    val spark = values.sparkSession
    import spark.implicits._
    val Q = graft.functions.QDigest
    // sum on collision: out-of-domain values CLAMP to the edge leaves
    // (QDigest.leaf), so two distinct v can share a leaf — a plain
    // .toMap would keep only one row (collect order — nondeterministic),
    // losing counts and breaking the byte-identical replay contract
    val leafCounts: Map[Long, Long] = values
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .select(col("v"), col("c")).as[(Long, Long)].collect()
      .groupMapReduce { case (v, _) => Q.leaf(v) } { case (_, c) => c }(_ + _)
    val batchN = leafCounts.valuesIterator.sum
    val (priorDigest, priorN) =
      SnapshotStore.readBefore(spark, root, batchId) match {
        case Some(df) =>
          val rows = df.select(col("node"), col("cnt"), col("n_total"))
            .as[(Long, Long, Long)].collect()
          (rows.map(r => r._1 -> r._2).toMap,
            rows.headOption.map(_._3).getOrElse(0L))
        case None => (Map.empty[Long, Long], 0L)
      }
    val n = priorN + batchN
    val merged = Q.merge(priorDigest, leafCounts, n, k)
    SnapshotStore.commit(
      merged.toSeq.sorted.toDF("node", "cnt")
        .withColumn("n_total", lit(n)).coalesce(1),
      root, batchId)
  }

  def quantileStream(valueStream: DataFrame, root: String, k: Int = 512)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    valueStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      quantileBatch(batch.toDF, batchId, root, k)
    }

  /** The committed digest as (nodes map, n_total); empty for a never-fed
    * stream.
    */
  def readQuantileDigest(spark: org.apache.spark.sql.SparkSession,
      root: String): (Map[Long, Long], Long) = {
    import spark.implicits._
    SnapshotStore.read(spark, root) match {
      case Some(df) if !df.isEmpty =>
        val rows = df.select(col("node"), col("cnt"), col("n_total"))
          .as[(Long, Long, Long)].collect()
        (rows.map(r => r._1 -> r._2).toMap,
          rows.headOption.map(_._3).getOrElse(0L))
      case _ => (Map.empty[Long, Long], 0L)
    }
  }

  // ------------------------------ T18 index generation retrain + cutover
  /** T18 — the ACTION the quantization-drift monitor
    * ([[graft.operators.Vectors.pqReconstructionError]]) schedules: when
    * drifted increments push reconstruction error past threshold, the
    * quantizer models must be REFIT and the corpus re-encoded — but a
    * serving index cannot be rebuilt in place (readers would see old
    * codes scored against new codebooks: silent garbage, not an error).
    * A GENERATION bundles everything that must stay mutually consistent
    * — coarse centroids, PQ codebooks, and the batchId-keyed index
    * encoded against exactly those models — under one `g=<n>` directory:
    *
    * {{{
    *   root/g=<n>/models/coarse     (cid, vector) parquet
    *   root/g=<n>/models/books      (subspace, code, vector) parquet
    *   root/g=<n>/index/b=<batch>   the T16 store, THIS generation's codes
    *   root/_LATEST                 committed generation number
    * }}}
    *
    * The cutover is [[SnapshotStore.commitPointer]]'s atomic small-object
    * write: the next generation is fit, fully encoded, and seeded while
    * generation n serves unperturbed; flipping `_LATEST` is the commit
    * point; [[gcGenerations]] keeps the predecessor as the reader grace
    * window (a reader that resolved gen n before the flip finishes its
    * query against files that still exist). A crash mid-build leaves a
    * dangling uncommitted `g=<n+1>` and a fully-served gen n — repaired
    * by re-running the retrain; the same crash calculus as
    * [[SnapshotStore]], because it IS that protocol, one level up.
    *
    * Scale: the refit itself is the bounded-sample fit + one full-corpus
    * encode pass (per-row expression work) — the expensive, rare path;
    * this module makes it SAFE, not cheap. Ongoing increments resolve
    * the generation per micro-batch ([[vectorIndexStreamGen]]), so a
    * swap between batches redirects the stream automatically; the
    * retrain must run at a quiescent barrier (no in-flight batch), the
    * compaction discipline.
    */
  def generationDir(root: String, gen: Long): String = s"$root/g=$gen"

  /** Persist the frozen models so serving, later increments, and audits
    * read the EXACT floats the index was encoded with (re-fitting "the
    * same" model is not the same model).
    */
  def writeGenerationModels(spark: org.apache.spark.sql.SparkSession,
      root: String, gen: Long, coarse: Array[Array[Float]],
      books: Array[Array[Array[Float]]]): Unit = {
    import spark.implicits._
    coarse.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cid", "vector").coalesce(1)
      .write.mode("overwrite")
      .parquet(s"${generationDir(root, gen)}/models/coarse")
    books.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (v, c) => (j, c, v.toSeq) } }.toSeq
      .toDF("subspace", "code", "vector").coalesce(1)
      .write.mode("overwrite")
      .parquet(s"${generationDir(root, gen)}/models/books")
    ()
  }

  def readGenerationModels(spark: org.apache.spark.sql.SparkSession,
      root: String, gen: Long)
      : (Array[Array[Float]], Array[Array[Array[Float]]]) = {
    val coarse = spark.read
      .parquet(s"${generationDir(root, gen)}/models/coarse")
      .orderBy(col("cid")).collect()
      .map(r => r.getSeq[Float](1).toArray)
    val books = spark.read
      .parquet(s"${generationDir(root, gen)}/models/books")
      .orderBy(col("subspace"), col("code")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2)).toArray
    (coarse, books)
  }

  /** Build generation `gen` from `corpus` and ATOMICALLY cut serving
    * over to it: fit fresh models, persist them, seed the generation's
    * index with the full corpus encoded against them, then flip the
    * pointer. Everything before the flip is invisible to readers.
    */
  def retrainGeneration(corpus: DataFrame, root: String, gen: Long,
      nlist: Int = 16, m: Int = 8, ksub: Int = 16, iters: Int = 3): Unit = {
    val spark = corpus.sparkSession
    val coarse = graft.operators.Vectors.kmeansCentroids(corpus, nlist, iters)
    val books = graft.operators.Vectors.pqCodebooks(corpus, m, ksub, iters)
    writeGenerationModels(spark, root, gen, coarse, books)
    seedVectorIndex(corpus, s"${generationDir(root, gen)}/index",
      coarse, books)
    SnapshotStore.commitPointer(spark, root, gen)
  }

  def currentGeneration(spark: org.apache.spark.sql.SparkSession,
      root: String): Option[Long] =
    SnapshotStore.latestVersion(spark, root)

  /** Drop committed-over generations, keeping `current` and its
    * predecessor (the reader grace window).
    */
  def gcGenerations(spark: org.apache.spark.sql.SparkSession,
      root: String, current: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens =
      if (!fs.exists(p)) Seq.empty[Long]
      else fs.listStatus(p).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("g="))
        .flatMap(_.stripPrefix("g=").toLongOption)
    val keep = gens.filter(_ <= current).sorted.takeRight(2).toSet
    gens.filter(g => g <= current && !keep(g)).foreach { g =>
      fs.delete(new org.apache.hadoop.fs.Path(generationDir(root, g)), true)
    }
  }

  /** One consistent serving view: resolve the pointer ONCE, then read
    * models and folded index from that generation — a swap between the
    * resolve and the reads cannot tear the pair, because a generation
    * directory is immutable-once-committed except for its own index
    * increments (encoded against the same models by construction).
    */
  def readServingIndex(spark: org.apache.spark.sql.SparkSession,
      root: String): (Long, Array[Array[Float]], Array[Array[Array[Float]]],
      DataFrame) = {
    val gen = currentGeneration(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed generation under $root"))
    val (coarse, books) = readGenerationModels(spark, root, gen)
    (gen, coarse, books,
      readVectorIndex(spark, s"${generationDir(root, gen)}/index"))
  }

  /** Generation-aware T16 increment stream: each micro-batch resolves
    * the CURRENT generation and encodes against ITS models into ITS
    * index — after a retrain cutover, the next batch lands in the new
    * generation with no coordination beyond the pointer read. (An
    * increment arriving during the grace window may land in the OLD
    * generation's index: harmless — that generation still serves until
    * gc, and the retrain corpus for the new generation already folded
    * the store as of the barrier.)
    */
  def vectorIndexStreamGen(embStream: DataFrame, root: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    embStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      val spark = batch.sparkSession
      val gen = currentGeneration(spark, root).getOrElse(
        throw new IllegalStateException(
          s"no committed generation under $root — seed with retrainGeneration first"))
      val (coarse, books) = readGenerationModels(spark, root, gen)
      vectorIndexBatch(batch.toDF, batchId,
        s"${generationDir(root, gen)}/index", coarse, books)
    }

  // ----------------------------- T17 incremental cluster-map maintenance
  /** T17 — incremental near-dup CLUSTER maintenance: T13 discovers pairs
    * incrementally, but turning pairs into dedup decisions needs
    * connected components (x7), and recomputing CC over the full pair
    * graph per crawl increment rescans the world. Each micro-batch of
    * newly-discovered pairs advances a durable flat label map by
    * [[graft.operators.Graph.incrementDelta]] — CC runs on the
    * increment-sized label graph only, and the delta (new nodes +
    * members of merged clusters) is written under
    * `clusterDir/b=<batchId>`, rows tagged with the batch id.
    * [[readClusterMap]] folds latest-batch-wins per node: exactly the
    * T16 layout, so the store inherits its compaction and as-of
    * machinery unchanged.
    *
    * Because min-label CC is arrival-order-independent, the folded map
    * is IDENTICAL to `Graph.connectedComponents` over every pair seen —
    * the T17 spec asserts equality and `x7j_incr_clusters` oracle-checks
    * the same fold inline against DuckDB's transitive closure.
    *
    * IDEMPOTENT REPLAY, the [[nearDupBatch]] contract: "prior" is the
    * fold of batch dirs strictly below the current id, and the batch's
    * write overwrites its own subdirectory — an at-least-once replay
    * recomputes the identical delta from identical inputs.
    */
  def clusterIndexBatch(pairs: DataFrame, batchId: Long,
      clusterDir: String): Unit = {
    val spark = pairs.sparkSession
    val priorPaths = bandBatchDirs(spark, clusterDir)
      .collect { case (id, p) if id < batchId => p }
    val prior =
      if (priorPaths.isEmpty) graft.operators.Graph.emptyLabels(pairs)
      else foldClusterMap(spark.read.parquet(priorPaths: _*))
    graft.operators.Graph.incrementDelta(prior, pairs)
      .withColumn("b", lit(batchId))
      .write.mode("overwrite").parquet(s"$clusterDir/b=$batchId")
    ()
  }

  def clusterIndexStream(pairStream: DataFrame, clusterDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    pairStream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      clusterIndexBatch(batch.toDF, batchId, clusterDir)
    }

  /** The latest-batch-wins fold shared by the read view, the prior of
    * the next batch, and compaction. A node appears at most once per
    * batch dir, so the winner is unique.
    */
  private def foldClusterMap(df: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("node")).orderBy(col("b").desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "b")
  }

  /** Consumer view of the incremental cluster map: one (node, cluster)
    * row per node ever seen in a pair — byte-equal to
    * `Graph.connectedComponents` over all discovered pairs.
    */
  def readClusterMap(spark: org.apache.spark.sql.SparkSession,
      clusterDir: String): DataFrame = {
    val paths = bandBatchDirs(spark, clusterDir).map(_._2)
    require(paths.nonEmpty, s"no cluster batches under $clusterDir")
    foldClusterMap(spark.read.parquet(paths: _*))
  }

  /** Compact the cluster store: merge batch dirs ≤ `upTo` into one,
    * dropping shadowed label rows (a node relabeled by a later merge
    * supersedes every earlier row). Surviving rows keep their `b` tag —
    * the fold keys on the COLUMN — so reads and subsequent batch priors
    * are identical before and after. Same staged protocol and
    * quiescent-barrier requirement as [[compactBandStore]].
    */
  def compactClusterIndex(spark: org.apache.spark.sql.SparkSession,
      clusterDir: String, upTo: Long): Unit =
    compactStore(spark, clusterDir, upTo, df => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("node")).orderBy(col("b").desc)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    })

  // ------------------------------------------- T12 / C14 streaming gate
  /** One unit of the cross-table transaction gate's input stream: either a
    * data event of `table` (table + event set) or a Debezium-style
    * transaction END marker carrying the commit's total event count
    * (endCount set) — the union of every captured table's topic plus the
    * transaction-metadata topic, as one typed stream.
    */
  case class TxInput(txId: String, table: Option[String],
      event: Option[graft.Schemas.CdcEvent], endCount: Option[Long])

  /** A data event released by the gate, still tagged with its table and
    * transaction so a downstream per-table fold can route it.
    */
  case class GatedEvent(table: String, txId: String,
      event: graft.Schemas.CdcEvent)

  case class TxGateState(expected: Option[Long], buffered: List[GatedEvent])

  /** C14 under Structured Streaming: hold every data event until its
    * transaction is COMPLETE across all captured tables, then release the
    * whole commit at once — the streaming twin of
    * `Cdc.multiTableCompleteTx`'s batch cutoff. Completeness is the
    * Debezium transaction-metadata contract: the END marker's event_count
    * equals the number of data events stamped with that transaction id
    * (across every table's topic). Until both the marker AND all its
    * events have arrived — in any interleaving, marker first or last —
    * nothing of the commit is visible downstream; afterwards, all of it
    * is, in one micro-batch, so a consumer folding the released stream
    * per table can never observe a commit half-applied (the torn-joint
    * state the batch C14 spec demonstrates).
    *
    * Scale: keyed by transaction id — shards across executors like every
    * other stateful op here. State per OPEN transaction is its buffered
    * events plus one counter: the bare minimum ANY cross-table atomicity
    * gate must hold (you cannot release what you have not seen), and it
    * frees the moment the commit releases. Released events emit sorted by
    * (table, lsn) so downstream folds see a deterministic order.
    * Redelivered events (at-least-once source) dedup by (table, lsn)
    * identity so they can never satisfy the marker's count in place of a
    * missing distinct event. This combinator keeps NoTimeout (pure
    * mechanism); [[txGateExpiring]] is the production variant that
    * spills state that cannot complete to a dead-letter stream.
    */
  def txGateKey(txId: String, in: Iterator[TxInput],
      state: GroupState[TxGateState]): Iterator[GatedEvent] = {
    val ins = in.toList
    gateStep(txId, state.getOption.getOrElse(TxGateState(None, Nil)),
      ins.flatMap(i => for { t <- i.table; e <- i.event } yield GatedEvent(t, txId, e)),
      ins.flatMap(_.endCount)) match {
      case Right(released) => state.remove(); released.iterator
      case Left(next) => state.update(next); Iterator.empty
    }
  }

  /** The gate's pure state transition, shared by the NoTimeout and the
    * expiring forms so they cannot drift: Right(released) when the
    * commit completed, Left(next buffered state) otherwise.
    *
    * Dedup is by event identity, not raw count: the production source is
    * at-least-once Kafka, and a REDELIVERED event must not satisfy the
    * marker's count while a distinct event is still missing — that would
    * release exactly the torn cross-table state this gate exists to
    * prevent. Identity is (table, lsn, ts_ms, op), NOT (table, lsn)
    * alone: a source that omits lsn (or reuses one across a tx's events
    * on the same table) would otherwise collapse distinct events into
    * one buffered entry and stall the transaction forever — silent data
    * withholding. A redelivery replays the same message bytes, so all
    * four fields match; distinct events sharing all four (same table,
    * absent lsn, same millisecond, same op) are indistinguishable
    * without a payload hash — the residual risk is confined to lsn-less
    * sources and documented here.
    */
  private def gateStep(txId: String, st0: TxGateState,
      fresh: Seq[GatedEvent], endCounts: Seq[Long])
      : Either[TxGateState, Seq[GatedEvent]] = {
    val expected = endCounts.lastOption.orElse(st0.expected)
    def ident(g: GatedEvent) =
      (g.table, g.event.source.lsn, g.event.ts_ms, g.event.op)
    val have = st0.buffered.map(ident).to(scala.collection.mutable.Set)
    val buffered = st0.buffered ++ fresh.filter(g => have.add(ident(g)))
    if (expected.exists(_ <= buffered.size))
      Right(buffered.sortBy(g => (g.table,
        g.event.source.lsn.getOrElse(Long.MinValue), g.event.ts_ms)))
    else Left(TxGateState(expected, buffered))
  }

  def txGate(inputs: Dataset[TxInput]): Dataset[GatedEvent] = {
    val spark = inputs.sparkSession
    import spark.implicits._
    inputs
      .groupByKey(_.txId)
      .flatMapGroupsWithState[TxGateState, GatedEvent](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(txGateKey)
  }

  /** [[TxInput]] plus the record's event time (the Kafka record
    * timestamp / envelope ts_ms), which drives the watermark that
    * expires abandoned transactions in [[txGateExpiring]].
    */
  case class TxInputT(ts: java.sql.Timestamp, txId: String,
      table: Option[String], event: Option[graft.Schemas.CdcEvent],
      endCount: Option[Long])

  /** One output row of the expiring gate: `kind` is `"release"` for a
    * completed commit's events and `"deadletter"` for an expired
    * (abandoned) transaction's buffered events — route the latter to
    * the C8 dead-letter sink; they carry everything needed for
    * offline repair (tx id, table, full envelope).
    */
  case class GatedOut(kind: String, table: String, txId: String,
      event: graft.Schemas.CdcEvent)

  /** T12 with bounded state — the production form of [[txGate]] (whose
    * own scaladoc promised this): a transaction whose END marker never
    * arrives (producer crash mid-commit, an aborted tx whose marker was
    * filtered, the expected-less stub a post-release redelivery
    * re-creates) would otherwise buffer its events FOREVER. Here every
    * state update arms an event-time timer `graceMs` past the current
    * watermark; a transaction that makes no progress while the
    * watermark advances past its timer EXPIRES: its buffered events
    * emit as `kind="deadletter"` (nothing of the commit is ever
    * released half-applied — the gate's invariant survives expiry) and
    * the state frees. Completed commits release exactly as in
    * [[txGate]], tagged `kind="release"` — the shared [[gateStep]]
    * transition guarantees the two forms cannot drift.
    *
    * Event-time, not processing-time: expiry is then deterministic
    * under replay (a crash-recovered query re-derives the same
    * watermark from the same data and expires the same transactions),
    * which a wall-clock timer cannot promise.
    */
  def txGateExpiring(inputs: Dataset[TxInputT],
      delay: String = "10 minutes",
      graceMs: Long = 60L * 60 * 1000): Dataset[GatedOut] = {
    val spark = inputs.sparkSession
    import spark.implicits._
    def key(txId: String, in: Iterator[TxInputT],
        state: GroupState[TxGateState]): Iterator[GatedOut] = {
      if (state.hasTimedOut) {
        val st = state.get
        state.remove()
        st.buffered.sortBy(g => (g.table,
          g.event.source.lsn.getOrElse(Long.MinValue), g.event.ts_ms))
          .map(g => GatedOut("deadletter", g.table, txId, g.event)).iterator
      } else {
        val ins = in.toList
        gateStep(txId, state.getOption.getOrElse(TxGateState(None, Nil)),
          ins.flatMap(i =>
            for { t <- i.table; e <- i.event } yield GatedEvent(t, txId, e)),
          ins.flatMap(_.endCount)) match {
          case Right(released) =>
            state.remove()
            released.map(g => GatedOut("release", g.table, txId, g.event)).iterator
          case Left(next) =>
            state.update(next)
            // re-armed on every batch that touches this tx: expiry means
            // "no progress for graceMs of event time", not a hard TTL
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + graceMs)
            Iterator.empty
        }
      }
    }
    inputs.withWatermark("ts", delay)
      .groupByKey(_.txId)
      .flatMapGroupsWithState[TxGateState, GatedOut](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(key)
  }

  /** T9 — streaming schema-drift alerts: emit one row the FIRST time each
    * (table, payload-shape) appears on the wire — the page a replica
    * pipeline wants the moment upstream DDL lands, not at the next batch
    * audit. The shape key is the sorted field set of the `after` object
    * (same extraction as the batch `Cdc.payloadSchemaVersions`); novelty
    * detection is Spark's stateful streaming dropDuplicates keyed by
    * (tbl, fields). State is bounded by #tables × #schema-versions —
    * inherently tiny, so no watermark eviction is needed.
    *
    * `raw` must carry (tbl, lsn, raw) with `raw` the envelope JSON string.
    */
  def schemaDriftStream(raw: DataFrame): DataFrame =
    raw.select(col("tbl"), col("lsn"),
      array_join(array_sort(json_object_keys(
        get_json_object(col("raw"), "$.after"))), ",").as("fields"))
      .dropDuplicates("tbl", "fields")

  /** T10 — stream-stream interval join: match each left event to right
    * events with the same key arriving within `[left.ts, left.ts + window]`
    * event time — the "order ↔ payment within an hour" shape. BOTH sides
    * carry watermarks and the join condition bounds event-time distance in
    * both directions, which is exactly what lets Spark expire buffered
    * state: a buffered left row can stop waiting once the right watermark
    * passes `l_ts + window`, and vice versa. Without the time bound the
    * join would buffer both streams forever.
    *
    * Inner join ⇒ output rows emit as soon as both sides arrive; state per
    * key is bounded by (watermark delay + window) of traffic, partitioned
    * by key — shards across executors at any scale.
    *
    * Left must carry (l_key, l_ts, …), right (r_key, r_ts, …); the
    * returned frame joins on `l_key = r_key AND r_ts ∈ [l_ts, l_ts +
    * window]`.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      delay: String = "10 minutes", window: String = "1 hour"): DataFrame =
    left.withWatermark("l_ts", delay)
      .join(right.withWatermark("r_ts", delay),
        expr(s"l_key = r_key AND r_ts >= l_ts AND r_ts <= l_ts + INTERVAL $window"))

  def readSnapshot(spark: org.apache.spark.sql.SparkSession,
      snapshotRoot: String): DataFrame = {
    val committed = SnapshotStore.read(spark, snapshotRoot)
      .getOrElse(sys.error(s"no committed snapshot under $snapshotRoot"))
    committed.filter(org.apache.spark.sql.functions.col("live")).drop("live")
  }
}
