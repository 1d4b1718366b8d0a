package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Cdc, Curation, Graph, Lake, Mixing, Partitioning, Relational, Scrub, Text, Vectors}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here: a batch
  * DataFrame form in [[queries]] and, where ANSI-SQL-expressible, a DuckDB
  * oracle twin in [[oracleSql]] (column names and ordering match exactly —
  * the driver hash-compares values sorted by column name).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Cdc.cdcSnapshot(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Cdc.queries ++ Text.queries ++ Vectors.queries ++
      Curation.queries ++ Graph.queries ++ Mixing.queries ++ Scrub.queries ++
      Partitioning.queries ++ Lake.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Cdc.oracle ++ Text.oracle ++ Vectors.oracle ++
      Curation.oracle ++ Graph.oracle ++ Mixing.oracle ++ Scrub.oracle ++
      Partitioning.oracle ++ Lake.oracle
}
