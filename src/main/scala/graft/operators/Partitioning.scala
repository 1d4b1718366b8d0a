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
}
