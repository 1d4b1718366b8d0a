package graft

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of staged intermediates.
  *
  * A staged table is a deterministic intermediate that several catalog
  * queries share — the synthetic CDC changelog (all cdc_* queries), the
  * per-document shingle set (x2 / x2c / x6), the verified near-dup pair
  * table (x2c and the x6 curation anti-join). Staging = materialize once
  * per (session, scale-dir) via `localCheckpoint()` (block-manager rows,
  * lineage truncated) and hand every consumer the same DataFrame, exactly
  * like a session-lifetime materialized view.
  *
  * This is also the correct 100 TB shape: a production pipeline writes the
  * changelog/shingle/pair tables once per ingest epoch and fans queries out
  * from the staged copy, rather than re-deriving them per query. On a
  * cluster the `localCheckpoint` staging becomes a parquet/Delta write —
  * the topology (one producer pass, N cheap consumers) is identical.
  *
  * Memory: entries are keyed, so the footprint is bounded by the number of
  * DISTINCT staged tables (single-digit, each ≤ tens of MB at bench scale),
  * not by the number of queries run. `clear(spark)` unpersists everything
  * for teardown.
  */
object Staged {
  private val cache = TrieMap[(Int, String), DataFrame]()

  private def sid(spark: SparkSession): Int = System.identityHashCode(spark)

  /** The staged table for `key`, building + checkpointing it on first use. */
  def apply(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.getOrElseUpdate((sid(spark), key), build.localCheckpoint())

  /** Drop every entry staged for `spark` and free its checkpoint blocks. */
  def clear(spark: SparkSession): Unit = {
    cache.keys.filter(_._1 == sid(spark)).foreach(cache.remove)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
