package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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
object Streams {

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

  def foldKey(id: Long, events: Iterator[CdcEvent],
      state: GroupState[SnapState]): Iterator[SnapUpdate] = {
    val incoming = events.toSeq
    if (incoming.isEmpty) Iterator.empty
    else {
      val prior = state.getOption
      val best = incoming.maxBy(e => e.source.lsn.getOrElse(Long.MinValue))
      val bestLsn = best.source.lsn.getOrElse(Long.MinValue)
      if (prior.exists(_.lsn >= bestLsn)) Iterator.empty // stale / out-of-order
      else {
        val next = if (best.op == "d")
          SnapState(bestLsn, live = false, None, None, None)
        else {
          val row = best.after.getOrElse(CdcRow(id, None, None, None))
          SnapState(bestLsn, live = true, row.first_name, row.last_name, row.email)
        }
        state.update(next)
        Iterator.single(SnapUpdate(id, next.live, next.lsn,
          next.first_name, next.last_name, next.email))
      }
    }
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

  /** T6-alt — snapshot via foreachBatch + idempotent overwrite: each
    * micro-batch folds the batch's events with the previously materialized
    * snapshot (read back from parquet) and overwrites it atomically. Simpler
    * operational model than state stores — the snapshot IS the checkpoint —
    * at the cost of rewriting the table per epoch; right when the snapshot
    * is small relative to the stream (a dimension table fed by CDC).
    */
  def snapshotForeachBatch(events: Dataset[CdcEvent], snapshotPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[CdcEvent] = {
    val spark = events.sparkSession
    events.writeStream.foreachBatch { (batch: Dataset[CdcEvent], _: Long) =>
      import org.apache.spark.sql.functions._
      val incoming = graft.operators.Cdc.snapshotWithTombstones(batch.toDF)
      val merged = if (new java.io.File(snapshotPath).exists()) {
        val prior = spark.read.parquet(snapshotPath)
        prior.withColumn("__src", lit(0))
          .unionByName(incoming.withColumn("__src", lit(1)))
      } else incoming.withColumn("__src", lit(1))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("lsn").desc, col("__src").desc)
      // KEEP tombstones (live=false) in the persisted state: a delete must
      // retain its winning lsn across epochs, or a redelivered older update
      // in a later batch would resurrect the deleted row. Consumers read
      // the snapshot with readSnapshot (live rows only).
      val next = merged.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .drop("rn", "__src")
      // stage-then-swap: write staged, move current aside, move staged in,
      // then drop the old generation — every step checked so a failed move
      // never leaves the snapshot deleted. Production would use a
      // versioned/table format instead of directory renames.
      val staged = new java.io.File(snapshotPath + ".staging")
      val old = new java.io.File(snapshotPath + ".old")
      next.write.mode("overwrite").parquet(staged.getPath)
      if (old.exists()) scala.reflect.io.Directory(old).deleteRecursively()
      val tgt = new java.io.File(snapshotPath)
      if (tgt.exists() && !tgt.renameTo(old))
        sys.error(s"snapshot swap: could not move $tgt aside")
      if (!staged.renameTo(tgt)) {
        old.renameTo(tgt) // restore the prior generation before failing
        sys.error(s"snapshot swap: could not move $staged into place")
      }
      if (old.exists()) scala.reflect.io.Directory(old).deleteRecursively()
      ()
    }
  }

  /** Consumer view of a foreachBatch-maintained snapshot: live rows only
    * (the persisted table also carries tombstones — state, not output).
    */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession,
      snapshotPath: String): DataFrame =
    spark.read.parquet(snapshotPath)
      .filter(org.apache.spark.sql.functions.col("live"))
      .drop("live")
}
