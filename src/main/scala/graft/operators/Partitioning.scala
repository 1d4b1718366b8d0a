package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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
  def blockedAllPairs(df: DataFrame, idCol: String, numBlocks: Int): DataFrame = {
    val spark = df.sparkSession
    val blocks = df
      .select(struct(col("*")).as("r"),
        pmod(hash(col(idCol)), lit(numBlocks)).as("blk"))
    // block-pair index built from ONE range (no join): id → (id/B, id%B)
    val bp = spark.range(numBlocks.toLong * numBlocks)
      .select((col("id") / numBlocks).cast("int").as("i"),
        (col("id") % numBlocks).cast("int").as("j"))
      .filter(col("i") <= col("j"))
    val xs = blocks.join(broadcast(bp), col("blk") === col("i"))
      .select(col("r").as("a"), col("i"), col("j"))
    val ys = blocks.join(broadcast(bp), col("blk") === col("j"))
      .select(col("r").as("b"), col("i"), col("j"))
    xs.join(ys, Seq("i", "j"))
      .filter(col("i") =!= col("j") ||
        col("a").getField(idCol) < col("b").getField(idCol))
      .select(col("a"), col("b"))
  }
}
