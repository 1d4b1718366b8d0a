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
  * not by the number of queries run. `clear(spark)` unpersists only the
  * checkpoint blocks THIS registry created for that session — a user's own
  * `cache()`d DataFrames in a shared session are untouched.
  */
object Staged {
  private case class Entry(df: DataFrame, rddIds: Set[Int])
  // keyed by the session REFERENCE (SparkSession keeps default identity
  // equality) — unique among live sessions, unlike identityHashCode, which
  // is neither unique nor stable across GC; entries of stopped sessions
  // are evicted opportunistically so nothing is pinned forever
  private val cache = TrieMap[(SparkSession, String), Entry]()
  private val buildSeconds = TrieMap[String, Double]()
  // one accumulator per OPEN build frame (builds nest: minhash_bands
  // builds from the staged shingle table) — lets each entry record its
  // SELF time, not children-inclusive time, so the bench attribution
  // doesn't double-charge a nested build to whichever parent ran first
  private var openChildSeconds = List.empty[Double]

  /** SELF seconds spent materializing each staged table in this JVM
    * (nested builds are charged to their own key, not the parent) — the
    * producer-pass cost that makes a bench cold pass exceed its steady
    * pass. Exposed so the bench can attribute a cold-total regression to
    * the specific staged table that got slower.
    */
  def timings: Map[String, Double] = buildSeconds.toMap

  private def evictStopped(): Unit =
    cache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }

  /** The staged table for `key`, building + checkpointing it on first use.
    * Synchronized so the before/after persistent-RDD diff that attributes
    * checkpoint blocks to this entry can't interleave with another build
    * (reentrant, so staged tables can build from other staged tables).
    */
  def apply(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    synchronized {
      evictStopped()
      cache.getOrElseUpdate((spark, key), {
        val t0 = System.nanoTime()
        openChildSeconds = 0.0 :: openChildSeconds
        try {
          val before = spark.sparkContext.getPersistentRDDs.keySet
          // producer stages run here, inside whichever registered query
          // first consumed the entry — attribute their task-binary
          // WARNs to the staged key, not that consumer (save/restore,
          // so nested staged builds attribute to their own keys)
          val ck = TaskBinaryAudit.withQuery(s"staging:$key") {
            build.localCheckpoint() // eager: materializes here
          }
          val added = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
          Entry(ck, added.toSet)
        } finally { // also on build failure, so the frame stack can't leak
          val elapsed = (System.nanoTime() - t0) / 1e9
          val children = openChildSeconds.head
          openChildSeconds = openChildSeconds.tail
          if (openChildSeconds.nonEmpty) // charge our whole span to the parent
            openChildSeconds = (openChildSeconds.head + elapsed) :: openChildSeconds.tail
          buildSeconds.put(key, elapsed - children)
        }
      }).df
    }

  /** Drop every entry staged for `spark` and free exactly the checkpoint
    * blocks those entries created — never foreign persisted RDDs (a user's
    * own `cache()`d DataFrames in a shared session are untouched).
    */
  def clear(spark: SparkSession): Unit = synchronized {
    val persistent = spark.sparkContext.getPersistentRDDs
    cache.filterInPlace { case ((s, _), e) =>
      val own = s eq spark
      if (own) e.rddIds.foreach(id => persistent.get(id).foreach(_.unpersist(false)))
      !own
    }
    evictStopped()
  }
}
