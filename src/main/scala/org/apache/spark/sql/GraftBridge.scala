package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column↔Expression converters (the
  * Spark 4 "classic" API). Standard technique for external Catalyst
  * extensions: these helpers are public API in spirit (every native
  * function uses them) but scoped `private[sql]`.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a hand-constructed logical plan (the entry
    * point every DataFrame API method uses internally).
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Re-tag a batch DataFrame as a STREAMING one — what a V1 streaming
    * `Source.getBatch` must return (`MicroBatchExecution` asserts
    * `batch.isStreaming`). The plan stays lazy: `toRdd` captures the
    * physical plan, rows materialize when the micro-batch runs. This is
    * exactly `FileStreamSource.getBatch`'s construction (public Spark
    * source, FileStreamSource.scala), reachable only from the sql
    * package — hence the bridge.
    */
  def streamingDataFrame(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** Re-wrap the DataFrame a V1 `Sink.addBatch` receives as a plain
    * BATCH frame a normal write path can consume — the exact
    * `ForeachBatchSink` construction (public Spark source): execute the
    * incremental plan once, DEFENSIVELY COPY each row (the scan reuses
    * one UnsafeRow buffer; a shuffle downstream would otherwise buffer
    * aliased rows), and rebuild over the materialized RDD.
    */
  def sinkBatchDataFrame(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd.map(_.copy()), df.schema, isStreaming = false)
  }
}
