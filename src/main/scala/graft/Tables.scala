package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Loaders for the driver-provided parquet fixtures (see TESTDATA.md /
  * FIXTURES.md). Every query receives the scale-factor directory and reads
  * only the tables and columns it needs, so Catalyst can push projection
  * and predicates into the parquet scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Session-scoped memo of the RESOLVED BASE RELATIONS: every
  // `spark.read.parquet` call re-lists the directory and re-reads
  // footers to infer the schema — pure driver-side metadata work
  // (~30-80 ms per table on this host) that the catalog re-paid inside
  // EVERY query construction (q27 alone loaded five tables = ~0.4 s of
  // its wall). A DataFrame is an immutable plan, so handing every
  // consumer the same resolved relation is exactly what a metastore
  // catalog entry does; the fixture dirs are immutable for a session's
  // lifetime (the Staged/memoSchema contract). Entries of stopped
  // sessions are evicted opportunistically; nothing persists across
  // JVMs.
  private val relations = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    relations.filterInPlace { case ((s, _, _), _) =>
      !s.sparkContext.isStopped }
    relations.getOrElseUpdate((spark, dir, name), {
      // events.parquet carries TIMESTAMP(NANOS), which Spark 4 rejects
      // unless read as a raw nanos long (legacy conf). Runtime-settable;
      // idempotent; must be set before the first resolve.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
    })
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** events.ts has shipped in two physical forms across fixture
    * generations: TIMESTAMP(NANOS) (read as a nanos long — see [[load]])
    * and TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Both are handled by
    * dtype dispatch so either fixture vintage loads. All engine logic
    * works on millisecond epoch longs (floor division here, `epoch_ms` in
    * the oracle SQL) so both engines compare identical integers
    * (SURVEY.md §7.4); integer division is mandatory on the nanos form
    * (~1.7e18 ns exceeds double's 2^53 exact range). A TimestampType `ts`
    * is (re)constructed for operators that need a real timestamp
    * (window(), watermarks) — NTZ casts interpret the wall clock in the
    * session timezone, which every entrypoint pins to UTC to match the
    * oracle's naive-as-UTC epoch_ms.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ms", expr("ts DIV 1000000"))
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ms", unix_millis(col("ts")))
    }
  }
}

/** Shared expression helpers kept portable with the DuckDB oracle. */
object Portable {
  /** Exact dot product of two float-array columns as a single generated
    * left-associative chain of double ops. IEEE doubles make this
    * bit-identical across engines (same values, same operation order), so
    * results need no rounding/tolerance. Codegen-friendly: the whole chain
    * stays inside WholeStageCodegen, unlike `aggregate()` higher-order
    * functions which are interpreted per element.
    */
  def dot(a: Column, b: Column, dim: Int): Column =
    (1 to dim)
      .map(i => element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .reduceLeft(_ + _)

  /** Oracle-side twin of [[dot]]: identical association order. */
  def dotSql(a: String, b: String, dim: Int): String =
    (1 to dim)
      .map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")
}
