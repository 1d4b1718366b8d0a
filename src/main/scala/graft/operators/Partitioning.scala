package graft.operators

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Partitioning strategies for 100 TB operation (SURVEY.md §4.3; builder
  * mandate "partitioning & shuffle"). These are the levers a cluster
  * deployment applies around the operator catalog; each has a plan-level
  * test in PartitioningSpec proving the property it claims (no Exchange /
  * identical results), so the techniques are demonstrated, not asserted.
  */
object Partitioning {

  /** Skew-safe join: replicate the (small) build side `salts` times and
    * scatter the skewed probe side across the replicas, so one hot key
    * spreads over `salts` tasks instead of one straggler. Result-identical
    * to the plain join (each probe row meets its key's build rows exactly
    * once, under exactly one salt).
    *
    * Complements AQE's runtime skew-join splitting
    * (spark.sql.adaptive.skewJoin.enabled): salting also covers hash
    * aggregations and works when statistics arrive too late for AQE.
    */
  def saltedEquiJoin(skewed: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val saltedProbe = skewed.withColumn("__salt",
      (pmod(xxhash64(monotonically_increasing_id()), lit(salts))).cast("int"))
    val replicatedBuild = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedProbe.join(replicatedBuild, Seq(key, "__salt")).drop("__salt")
  }

  /** Bucketed write: pre-shuffle a table ONCE at write time so every
    * subsequent equi-join/aggregation on the bucket key is co-located and
    * shuffle-free. The 100 TB pattern for repeatedly joined fact tables.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two co-bucketed tables — planner elides both Exchanges. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Range repartitioning for ordered workloads (time-series scans, window
    * functions over long histories): ranges give each task a contiguous
    * key span, enabling partition pruning on sorted output files.
    */
  def rangePartitionByTime(df: DataFrame, tsCol: String,
      partitions: Int): DataFrame =
    df.repartitionByRange(partitions, col(tsCol))

  /** Block-partitioned all-pairs: every unordered pair of rows exactly
    * once, with NO broadcast of the full table and bounded per-task
    * memory — the scalable replacement for `broadcast(df)` pair joins.
    *
    * Rows are hashed into `numBlocks` blocks; each side is replicated to
    * the block PAIRS it participates in (x in block b → all (b, j), j ≥ b;
    * y in block b → all (i, b), i ≤ b) and the join runs on the (i, j)
    * key, so each of the B(B+1)/2 block-pair tasks holds exactly two
    * blocks (≈ 2n/B rows) and computes their cross product locally. Total
    * shuffle volume is n·(B+1) rows against the broadcast variant's
    * n·numTasks; per-task memory is O(n/B) instead of O(n). Diagonal
    * blocks emit `id_a < id_b`; off-diagonal blocks emit every cross pair
    * (each unordered pair has exactly one home block pair), so no pair is
    * produced twice. Output: the two full rows as structs `a` and `b`
    * (orientation arbitrary off-diagonal — canonicalize downstream with
    * least/greatest if needed).
    *
    * Choose B ≈ sqrt(2·cluster cores) for full fan-out: B(B+1)/2 tasks.
    */
  /** Z-order (Morton) curve value: interleave the low `bits` bits of two
    * dimension keys so that rows close in BOTH dimensions get close
    * z-values. Sorting / range-partitioning a table by z-value gives every
    * output file a bounded span in every interleaved dimension, so file-
    * level min/max statistics prune multi-dimensional predicates — the
    * standard data-skipping layout for 100 TB scans filtered on more than
    * one column (a single-column sort clusters only its own column).
    * Pure integer bit arithmetic (shift/and/add over disjoint bits) —
    * codegen'd in Spark and mirrored exactly by the oracle.
    */
  def zValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column =
    (0 until bits).map(i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
      .reduceLeft(_ + _)

  /** Scalable global ordinal assignment (dense ranks 1..n in a total
    * order) WITHOUT a single-task global window: `row_number() OVER
    * (ORDER BY …)` funnels every row through one task — the classic
    * driver-shaped bottleneck for vocabulary building / id densification
    * at corpus scale. Two-phase instead:
    *
    *  1. range-repartition + sort locally on the sort key, rank within
    *     each partition (the per-partition window shards);
    *  2. count rows per partition (tiny: one row per partition), prefix-sum
    *     those counts, and broadcast-join the offsets back:
    *     ordinal = partition offset + local rank.
    *
    * Output ordinals depend only on the total order — partition boundaries
    * cancel out — so results are deterministic for a unique sort key
    * regardless of the range sampler's split choices. The only global step
    * is the prefix sum over `numParts` counters.
    *
    * @param sortCols total order (MUST be unique — ties would make ranks
    *                 nondeterministic in any formulation).
    */
  def ordinalIds(df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column],
      idName: String, numParts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val local = df.repartitionByRange(numParts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__pr", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(sortCols: _*)).cast("long"))
    val offsets = local.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(
        Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(idName, col("__off") + col("__pr"))
      .drop("__pid", "__pr", "__off")
  }

  // ------------------------------------------------- partitioned layout
  /** Day-partitioned on-disk copy of `events` (hive-style `day=YYYY-MM-DD`
    * directories, one file per day via a pre-write repartition on the
    * partition key) — the single most common 100 TB scan layout: a query
    * filtering on `day` lists only the matching directories, so scan cost
    * is proportional to the days touched, not the table. Written once per
    * (JVM, sf dir) under java.io.tmpdir. Cross-JVM reuse is safe because
    * the cache path encodes BOTH the full source dir (sanitized — not a
    * hashCode, which can collide) and a fingerprint of the source parquet
    * (name/size/mtime): a regenerated fixture changes the fingerprint and
    * gets a fresh layout instead of serving stale data. Creation goes
    * through a unique temp dir + atomic rename-into-place, so two
    * first-run JVMs (e.g. test + bench) can race without either reading a
    * half-written layout — the loser discards its copy.
    */
  private val dayLayouts = TrieMap[String, String]()
  def eventsByDay(spark: SparkSession, dir: String): DataFrame = {
    val path = dayLayouts.getOrElseUpdate(dir, synchronized {
      val src = new java.io.File(dir, "events.parquet")
      val parts = (if (src.isDirectory) src.listFiles.toSeq else Seq(src))
        .filter(_.isFile).map(f => (f.getName, f.length, f.lastModified))
      // a real digest of the (name, size, mtime) triples — a 32-bit
      // hashCode could collide across fixture regenerations and silently
      // serve the previous fixture's layout
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(parts.sorted.mkString("|").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
      val sane = dir.replaceAll("[^A-Za-z0-9._-]", "_")
      val p = s"${sys.props("java.io.tmpdir")}/graft_events_day_${sane}_$fp"
      val dest = new java.io.File(p)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm); f.delete(); ()
      }
      if (!new java.io.File(dest, "_SUCCESS").isFile) {
        // crashed-writer debris (dest without _SUCCESS) self-heals: remove
        // it so the rename below can land, instead of every future JVM
        // re-writing the layout and leaking a tmp copy
        if (dest.exists()) rm(dest)
        val tmp = new java.io.File(
          p + "_tmp_" + java.util.UUID.randomUUID.toString.take(8))
        Tables.events(spark, dir)
          .withColumn("day", to_date(col("ts")))
          .repartition(col("day")) // one output file per day directory
          .write.mode(SaveMode.Overwrite).partitionBy("day")
          .parquet(tmp.getAbsolutePath)
        if (tmp.renameTo(dest)) p
        else if (new java.io.File(dest, "_SUCCESS").isFile) {
          // lost the race to an equivalent complete layout — drop ours
          rm(tmp)
          p
        } else {
          // rename blocked by something else entirely (permissions, a
          // racing writer's incomplete dest): serve this JVM from its own
          // complete copy rather than fail
          tmp.getAbsolutePath
        }
      } else p
    })
    spark.read.parquet(path)
  }

  /** Q29 — the pruning contract as a driver query: scan the day-partitioned
    * layout for ONE day and aggregate. PartitioningSpec asserts the plan
    * carries PartitionFilters and reads exactly one of the 30 day files;
    * the oracle recomputes from the flat table (same rows either way).
    */
  val q29PartitionPrune: (SparkSession, String) => DataFrame = (spark, dir) =>
    eventsByDay(spark, dir)
      .filter(col("day") === to_date(lit("2024-01-05")))
      .groupBy(col("day").cast("string").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("day"), col("event_type"))
  val q29Sql: String =
    """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
      | CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
      |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-05'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q29_partition_prune" -> q29PartitionPrune)
  val oracle: Map[String, String] = Map("q29_partition_prune" -> q29Sql)

  def blockedAllPairs(df: DataFrame, idCol: String, numBlocks: Int): DataFrame =
    blockedAllPairsWithin(df, Nil, idCol, numBlocks)

  /** [[blockedAllPairs]] restricted to pairs AGREEING on `groupCols` — the
    * cluster-scoped all-pairs (e.g. SemDeDup within coarse cells): the join
    * key becomes (group, i, j), so compute is Σ_g |g|² instead of n², and
    * a single huge group still block-shards across B(B+1)/2 tasks instead
    * of landing on the one task a plain group-keyed self-join would give
    * it. Empty `groupCols` degenerates to the global form.
    */
  def blockedAllPairsWithin(df: DataFrame, groupCols: Seq[String],
      idCol: String, numBlocks: Int): DataFrame = {
    val spark = df.sparkSession
    val blocks = df
      .select((struct(col("*")).as("r") +: pmod(hash(col(idCol)), lit(numBlocks)).as("blk") +:
        groupCols.map(g => col(g).as(s"__g_$g"))): _*)
    // block-pair index built from ONE range (no join): id → (id/B, id%B)
    val bp = spark.range(numBlocks.toLong * numBlocks)
      .select((col("id") / numBlocks).cast("int").as("i"),
        (col("id") % numBlocks).cast("int").as("j"))
      .filter(col("i") <= col("j"))
    val keyCols = groupCols.map(g => s"__g_$g") ++ Seq("i", "j")
    val xs = blocks.join(broadcast(bp), col("blk") === col("i"))
      .select((col("r").as("a") +: keyCols.map(col)): _*)
    val ys = blocks.join(broadcast(bp), col("blk") === col("j"))
      .select((col("r").as("b") +: keyCols.map(col)): _*)
    xs.join(ys, keyCols)
      .filter(col("i") =!= col("j") ||
        col("a").getField(idCol) < col("b").getField(idCol))
      .select(col("a"), col("b"))
  }
}
