package graft

import org.apache.spark.sql.types._

/** Debezium-style CDC envelope schema, transcribed from the reference's
  * logged self-describing message (ez-cdc `README.md:331`) and source table
  * DDL (`postgres/init.sql:2-7`): row struct `{id, first_name, last_name,
  * email}` with nullable before/after images (REPLICA IDENTITY FULL,
  * `init.sql:10`), provenance `source` struct, `op ∈ {c,u,d,r}`
  * (`snapshot` enum at `README.md:331` implies the full set), and envelope
  * `ts_ms`.
  *
  * `id` is widened int32 → int64: at 100 TB scale serial keys outgrow
  * int32, and the fixture keys are int64 already.
  */
object Schemas {
  val rowType: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("first_name", StringType, nullable = true),
    StructField("last_name", StringType, nullable = true),
    StructField("email", StringType, nullable = true)))

  val sourceType: StructType = StructType(Seq(
    StructField("version", StringType, nullable = false),
    StructField("connector", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("snapshot", StringType, nullable = true),
    StructField("db", StringType, nullable = false),
    StructField("schema", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("txId", LongType, nullable = true),
    StructField("lsn", LongType, nullable = true),
    StructField("xmin", LongType, nullable = true)))

  val transactionType: StructType = StructType(Seq(
    StructField("id", StringType, nullable = true),
    StructField("total_order", LongType, nullable = true),
    StructField("data_collection_order", LongType, nullable = true)))

  val envelopeType: StructType = StructType(Seq(
    StructField("before", rowType, nullable = true),
    StructField("after", rowType, nullable = true),
    StructField("source", sourceType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("transaction", transactionType, nullable = true)))

  /** Typed forms for Dataset / MemoryStream (streaming tests). */
  case class CdcRow(id: Long, first_name: Option[String],
      last_name: Option[String], email: Option[String])
  case class CdcSource(version: String, connector: String, name: String,
      ts_ms: Long, snapshot: Option[String], db: String, schema: String,
      table: String, txId: Option[Long], lsn: Option[Long], xmin: Option[Long])
  case class CdcEvent(before: Option[CdcRow], after: Option[CdcRow],
      source: CdcSource, op: String, ts_ms: Long)
}
