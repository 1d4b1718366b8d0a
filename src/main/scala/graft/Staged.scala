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

  /** Materialize a staged frame at the SESSION-CONFIGURED durability
    * level — the §5 fault-tolerance seam for the 100 TB story:
    *
    *  - `local` (default): `localCheckpoint()` — non-replicated executor
    *    blocks, lineage truncated. Fastest; correct for single-process
    *    local mode (this repo's bench/verify drivers), where executor
    *    loss IS process loss. On a real cluster an executor failure
    *    makes a local checkpoint unrecomputable.
    *  - `reliable`: `checkpoint()` — rows written to the context's
    *    checkpoint dir (HDFS/object store on a cluster), recoverable
    *    across executor loss. Requires `sparkContext.setCheckpointDir`.
    *
    * Set via session conf `spark.graft.staged.materialization`. A
    * cluster deployment would set `reliable` (or replace staging with
    * parquet/Delta table writes — the scaladoc'd production topology);
    * the default keeps local runs fast and the bench comparable.
    */
  private def materializeFrame(df: DataFrame): DataFrame =
    df.sparkSession.conf
      .get("spark.graft.staged.materialization", "local") match {
      case "local"    => df.localCheckpoint()
      case "reliable" => df.checkpoint()
      case other => throw new IllegalArgumentException(
        s"spark.graft.staged.materialization=$other " +
          "(expected 'local' or 'reliable')")
    }

  /** The staged table for `key`, building + checkpointing it on first use.
    * Synchronized so the before/after persistent-RDD diff that attributes
    * checkpoint blocks to this entry can't interleave with another build
    * (reentrant, so staged tables can build from other staged tables).
    */
  def apply(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    materialized(spark, key)(materializeFrame(build))

  /** Core registration: `mk` must RETURN AN ALREADY-CHECKPOINTED frame
    * (evaluated inside the bookkeeping so producer stages are timed and
    * their checkpoint blocks attributed to this entry). [[apply]] is the
    * plain `build.localCheckpoint()` form; [[partitioned]] layers a
    * layout-preserving second pass.
    */
  private def materialized(spark: SparkSession, key: String)
      (mk: => DataFrame): DataFrame =
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
            mk // eager: materializes here
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

  /** [[apply]] for a staged table consumers repeatedly join/group on
    * `layoutCols`: the entry is stored HASH-PARTITIONED (at the session's
    * `spark.sql.shuffle.partitions` — scale-parameterized, never a
    * constant) and sorted by those columns, and the captured `LogicalRDD`
    * keeps that layout, so consumers keyed on it plan ZERO exchanges over
    * the staged scan — the session-staging analogue of a bucketed table
    * (guide §2.4). Two materialization passes:
    *
    *  1. `build.localCheckpoint()` at full speed (AQE on — runtime
    *     broadcast conversion + partition coalescing for the producer);
    *  2. a trivial scan→exchange→sort relayout of the checkpointed rows
    *     with AQE OFF — under AQE the executed plan reports
    *     `UnknownPartitioning` to `Dataset.localCheckpoint` and the
    *     layout would be lost (measured on q34_pagerank: 27 hash
    *     exchanges in the finalized plan, none elided; with the capture
    *     intact: 6). AQE adds nothing to a single-exchange relayout, and
    *     the session flag is save/restored around just that pass.
    */
  def partitioned(spark: SparkSession, key: String, layoutCols: Seq[String])
      (build: => DataFrame): DataFrame =
    materialized(spark, key) {
      // track the pass-1 checkpoint's blocks so they can be freed once
      // the relaid-out copy is materialized — leaving them persisted
      // doubled the block-manager footprint of every partitioned staged
      // table for the whole session (r17 ADVICE). The snapshot is taken
      // AFTER evaluating the build expression: constructing the frame
      // may itself stage nested entries or checkpoint internal fold
      // leaves (x7q_stores builds copurchase_edges and the maintenance
      // fold's fresh-sets inside this frame) whose blocks other
      // consumers still need — only the flat checkpoint's own blocks
      // may be freed.
      val built = build
      val beforeFlat = spark.sparkContext.getPersistentRDDs.keySet
      val flat = materializeFrame(built)
      val flatIds = spark.sparkContext.getPersistentRDDs.keySet
        .diff(beforeFlat)
      val flag = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(flag)
      // NOTE: this flips session-global conf for the relayout pass;
      // Staged's synchronization only excludes other Staged builds, so
      // the registry assumes no CONCURRENT query is being planned on
      // the same session during a first-touch staging build (true of
      // the bench/verify drivers, which run queries sequentially). A
      // multi-threaded caller should pre-build staged tables before
      // fanning out.
      spark.conf.set(flag, "false")
      try {
        val cols = layoutCols.map(org.apache.spark.sql.functions.col)
        val out = materializeFrame(flat
          .repartition(spark.sessionState.conf.numShufflePartitions,
            cols: _*)
          .sortWithinPartitions(cols: _*)) // eager: materialized + truncated
        // the relaid-out blocks are self-contained now — free pass 1's
        val persistent = spark.sparkContext.getPersistentRDDs
        flatIds.foreach(id => persistent.get(id).foreach(_.unpersist(false)))
        out
      } finally spark.conf.set(flag, prev)
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
