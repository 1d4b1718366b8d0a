package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed-merge variant of [[SnapshotStore]]: the snapshot lives in `p=<b>`
  * hash partitions of the primary key, and an epoch rewrites ONLY the
  * partitions its batch touched — the production CDC-apply shape at 100 TB,
  * where a micro-batch's keys land in a handful of partitions and a
  * full-table overwrite per epoch would rewrite terabytes to apply
  * kilobytes (the reference's "maintaining data replicas" purpose,
  * ez-cdc README.md:62-63).
  *
  * Layout under `root`:
  * {{{
  *   root/p=<bucket>/v=<epoch>/   that bucket's rows as of that epoch
  *   root/_LATEST                 committed epoch pointer (atomic write)
  * }}}
  *
  * A bucket's current data under committed epoch E is its LARGEST staged
  * version ≤ E; untouched buckets simply keep serving an older version
  * directory. Commit stays atomic across buckets because an epoch is
  * published by the single root pointer: (1) stage every affected bucket's
  * new `v=<epoch>` directory (readers ignore them — the pointer still
  * names the prior epoch); (2) write `_LATEST` (the commit point, one
  * atomic small-object write, reusing [[SnapshotStore.commitPointer]]);
  * (3) GC each affected bucket down to its two newest committed versions
  * (reader grace window). A crash between (1) and (2) leaves dangling
  * bucket versions above the pointer and a fully readable prior epoch;
  * the checkpoint replay of the same epoch overwrites them.
  */
object PartitionedSnapshotStore {
  val bucketColName = "__bucket"

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bucketDir(root: String, b: Int) = new Path(root, s"p=$b")
  private def versionDir(root: String, b: Int, v: Long) =
    new Path(bucketDir(root, b), s"v=$v")

  /** Deterministic key → partition assignment (plain modulus: portable,
    * stable across engines and releases — unlike hash(), whose seed/algo is
    * an implementation detail).
    */
  def bucketOf(id: org.apache.spark.sql.Column, buckets: Int): org.apache.spark.sql.Column =
    pmod(id, lit(buckets)).cast("int")

  /** Composite-key bucket assignment: a single numeric key keeps the
    * plain-modulus placement ([[bucketOf]] — existing stores stay
    * readable); a key tuple hashes with xxhash64 (fixed seed, stable
    * across Spark releases — the documented 64-bit xxHash of the
    * canonical row encoding) then takes the modulus. The same
    * modulus-stability contract applies: every writer over the store's
    * lifetime must use the same key columns AND bucket count.
    */
  def bucketOfKeys(keys: Seq[org.apache.spark.sql.Column],
      buckets: Int): org.apache.spark.sql.Column =
    if (keys.size == 1) bucketOf(keys.head, buckets)
    else pmod(xxhash64(keys: _*), lit(buckets)).cast("int")

  private def listBuckets(spark: SparkSession, root: String): Seq[Int] = {
    val f = fs(spark, root)
    val r = new Path(root)
    if (!f.exists(r)) Seq.empty
    else f.listStatus(r).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("p=")).map(_.stripPrefix("p=").toInt)
  }

  private def bucketVersions(spark: SparkSession, root: String, b: Int): Seq[Long] = {
    val f = fs(spark, root)
    val d = bucketDir(root, b)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong)
  }

  /** Per-bucket data directories as of `maxEpoch` (inclusive): each bucket
    * resolves independently to its largest version ≤ maxEpoch.
    */
  private def resolvePaths(spark: SparkSession, root: String,
      maxEpoch: Long): Seq[String] =
    listBuckets(spark, root).flatMap { b =>
      bucketVersions(spark, root, b).filter(_ <= maxEpoch).maxOption
        .map(v => versionDir(root, b, v).toString)
    }

  /** Stage + commit an epoch touching only `merged`'s buckets. `merged`
    * must carry [[bucketColName]]; one write job stages all affected
    * buckets (a hash-partitioned parquet write), then each staged
    * directory is moved under its bucket and the root pointer publishes
    * the epoch.
    */
  def commit(merged: DataFrame, root: String, epoch: Long): Unit = {
    val spark = merged.sparkSession
    val f = fs(spark, root)
    val staging = new Path(root, s"_stage_v=$epoch")
    merged.write.mode("overwrite")
      .partitionBy(bucketColName).parquet(staging.toString)
    val staged = f.listStatus(staging).toSeq
      .filter(_.getPath.getName.startsWith(s"$bucketColName="))
    staged.foreach { st =>
      val b = st.getPath.getName.stripPrefix(s"$bucketColName=").toInt
      f.mkdirs(bucketDir(root, b))
      val dest = versionDir(root, b, epoch)
      if (f.exists(dest)) f.delete(dest, true) // crash-replay of this epoch
      f.rename(st.getPath, dest)
    }
    f.delete(staging, true)
    SnapshotStore.commitPointer(spark, root, epoch)
    // GC: per affected bucket keep the two newest versions ≤ epoch
    staged.map(_.getPath.getName.stripPrefix(s"$bucketColName=").toInt)
      .foreach { b =>
        val vs = bucketVersions(spark, root, b).filter(_ <= epoch).sorted
        vs.dropRight(2).foreach(v => f.delete(versionDir(root, b, v), true))
      }
  }

  /** Read a set of bucket-version directories as ONE frame, tolerant of
    * SCHEMA VINTAGES: buckets written before an upstream schema change
    * (C15 world) may lack newer columns (additive DDL) or carry a
    * NARROWER type for one (int32 era of a column later ALTERed to
    * int64). Parquet's mergeSchema handles only the additive case — it
    * refuses to merge int32 with int64 footers — so paths are grouped by
    * their actual file schema (one driver-side footer read per bucket;
    * bucket count is bounded config, never data-proportional) into one
    * scan relation per VINTAGE, then unioned by name with analyzer type
    * widening. One vintage — the steady state — is exactly a single
    * multi-path scan; a rolling migration adds one relation per live
    * vintage (2–3), not per bucket.
    */
  private def readVintages(spark: SparkSession,
      paths: Seq[String]): DataFrame = {
    val byVintage = paths
      .map(p => spark.read.parquet(p).schema.toDDL -> p)
      .groupBy(_._1).values.toSeq
      .map(_.map(_._2).sorted)
      .sortBy(_.head) // deterministic union (and output column) order
    byVintage
      .map(ps => spark.read.parquet(ps: _*))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** The committed snapshot (all buckets at their committed versions). */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    SnapshotStore.latestVersion(spark, root).flatMap { e =>
      val paths = resolvePaths(spark, root, e)
      if (paths.isEmpty) None
      else Some(readVintages(spark, paths))
    }

  /** Offline REBUCKET migration — the escape hatch from the "modulus
    * is forever" contract ([[ensureBucketCount]]): a store sized for
    * last year's keyspace eventually needs more buckets, and the
    * modulus cannot change in place (keys would split across two
    * placements). The migration is the T18 generation pattern one
    * level up: read the COMMITTED state of `oldRoot`, rewrite it under
    * a fresh `newRoot` with the new modulus as the seed epoch
    * (`seedEpoch` = −1, strictly before any stream batch id, so the
    * first post-cutover micro-batch's strictly-before read sees the
    * migrated state), copy nothing else — the consumer swap (pointing
    * readers and the sink at `newRoot`) is the cutover, and the old
    * store is never touched, remaining the rollback. Must run at a
    * quiescent barrier: an epoch committed to `oldRoot` after the copy
    * starts is not migrated.
    */
  def rebucket(spark: SparkSession, oldRoot: String, newRoot: String,
      newN: Int, keyCols: Seq[String], seedEpoch: Long = -1L): Unit = {
    val state = read(spark, oldRoot).getOrElse(
      throw new IllegalStateException(s"no committed state under $oldRoot"))
    ensureBucketCount(spark, newRoot, newN)
    commit(state.withColumn(bucketColName,
      bucketOfKeys(keyCols.map(state(_)), newN)), newRoot, seedEpoch)
  }

  /** Point lookup — the replica SERVING path ("maintaining data
    * replicas", the reference's own motivation): resolve the committed
    * rows for a bounded key set by reading ONLY the buckets those keys
    * hash to. The store's layout IS the index: the key recomputes its
    * bucket with the same persisted modulus every writer used (which is
    * why `_BUCKETS` is load-bearing, [[ensureBucketCount]]), so a keyed
    * GET against a 16k-bucket 100 TB replica opens one bucket's latest
    * version directory — a directory listing plus a few file reads —
    * instead of scanning the table. `keys` must be a BOUNDED lookup set
    * (that is what a point lookup is); its distinct buckets round-trip
    * the driver to prune the path list, then the stored rows semi-join
    * the broadcast key set so only matching keys survive. Tombstone
    * rows (live=false) are returned as stored — the caller applies the
    * same fold-then-filter its full-read path uses.
    */
  def lookup(spark: SparkSession, root: String, keys: DataFrame,
      keyCols: Seq[String]): Option[DataFrame] = {
    val n = bucketCount(spark, root).getOrElse(
      throw new IllegalStateException(s"no _BUCKETS under $root"))
    val wanted: Set[Int] = keys
      .select(bucketOfKeys(keyCols.map(keys(_)), n).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    SnapshotStore.latestVersion(spark, root).flatMap { e =>
      val paths = listBuckets(spark, root).filter(wanted)
        .flatMap { b =>
          bucketVersions(spark, root, b).filter(_ <= e).maxOption
            .map(v => versionDir(root, b, v).toString)
        }
      if (paths.isEmpty) None
      else Some(readVintages(spark, paths)
        .join(org.apache.spark.sql.functions.broadcast(
          keys.select(keyCols.map(keys(_)): _*).distinct()),
          keyCols, "left_semi"))
    }
  }

  /** The store's key→bucket modulus is LOAD-BEARING for correctness: a
    * key's prior row is found by recomputing its bucket, so every writer
    * across the store's lifetime must use the same count. It is persisted
    * once (`_BUCKETS`) and validated on every sink start — a restart with
    * a different configured count fails loudly instead of silently
    * splitting keys across two placements (stale row in the old bucket +
    * new winner in the new one = a duplicated key on read).
    */
  def ensureBucketCount(spark: SparkSession, root: String, n: Int): Unit = {
    val f = fs(spark, root)
    val p = new Path(root, "_BUCKETS")
    bucketCount(spark, root) match {
      case Some(existing) =>
        require(existing == n,
          s"store at $root was created with $existing buckets; got $n")
      case None =>
        f.mkdirs(new Path(root))
        val out = f.create(p, true)
        try out.write(n.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  def bucketCount(spark: SparkSession, root: String): Option[Int] = {
    val f = fs(spark, root)
    val p = new Path(root, "_BUCKETS")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        .trim.toIntOption
      finally in.close()
    }
  }

  /** Compaction: rewrite every bucket's CURRENT data as a fresh
    * single-file version under a new epoch and commit it — the
    * small-files repair for a long-running keyed-merge replica, where
    * each bucket accumulates one (possibly tiny, shuffle-partitioned)
    * version dir per epoch that touched it. Data is unchanged; only the
    * layout is. Runs through the normal commit path, so it inherits its
    * atomicity (pointer publish) and GC — and because GC keeps the
    * pre-compaction version as the grace window, an in-flight reader is
    * never broken.
    */
  def compact(spark: SparkSession, root: String, epoch: Long,
      keyCols: Seq[String] = Seq("id")): Unit = {
    import org.apache.spark.sql.functions.col
    val n = bucketCount(spark, root).getOrElse(
      sys.error(s"no _BUCKETS metadata under $root"))
    val current = read(spark, root).getOrElse(
      sys.error(s"nothing committed under $root"))
    val compacted = current
      .withColumn(bucketColName, bucketOfKeys(keyCols.map(col), n))
      .repartition(col(bucketColName))
    commit(compacted, root, epoch)
  }

  /** The snapshot an epoch writing `epoch` must merge against: each
    * bucket's largest version STRICTLY below `epoch` — correct both in
    * normal operation (pointer < epoch) and on crash replay where the
    * pointer already names `epoch` but this epoch's directories are about
    * to be overwritten.
    */
  def readBefore(spark: SparkSession, root: String,
      epoch: Long): Option[DataFrame] = {
    val paths = resolvePaths(spark, root, epoch - 1)
    if (paths.isEmpty) None
    else Some(readVintages(spark, paths))
  }

  /** Time travel: the snapshot as of committed epoch `epoch` — each bucket
    * at its largest version ≤ epoch, the natural by-product of the
    * untouched-buckets-keep-old-versions layout. Returns None when `epoch`
    * is above the committed pointer (not yet readable) or below the
    * retention window: per-bucket GC keeps only the two newest committed
    * versions, so a bucket with versions but none ≤ epoch means the
    * requested epoch has been collected (production retention would be
    * time-based). The refusal is conservative — a bucket first created
    * after `epoch` is indistinguishable from a collected one post-GC, so
    * it also refuses rather than silently serving a partial snapshot.
    */
  def readAsOf(spark: SparkSession, root: String,
      epoch: Long): Option[DataFrame] =
    SnapshotStore.latestVersion(spark, root).flatMap { committed =>
      if (epoch > committed) None
      else {
        val buckets = listBuckets(spark, root)
        val resolved = buckets.flatMap { b =>
          bucketVersions(spark, root, b).filter(_ <= epoch).maxOption
            .map(v => versionDir(root, b, v).toString)
        }
        if (resolved.size < buckets.size || resolved.isEmpty) None
        else Some(readVintages(spark, resolved))
      }
    }
}
