package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row
import graft.Schemas

/** Source/sink surface (SURVEY.md §2.2 S1–S5). The capture side of the
  * reference (Postgres WAL → Debezium) stays external by design; this is
  * the ingestion boundary where its Kafka topic (`main.py:21-26`, topic
  * naming `README.md:173`) meets Spark.
  */
object CdcSources {

  /** S2 — Kafka envelope stream: subscribe to a Debezium topic and parse
    * the self-describing JSON envelopes. The null guard drops tombstones
    * before the parse (`main.py:42` semantics). Requires the Kafka
    * connector on the classpath at runtime; streaming-semantics tests
    * substitute MemoryStream, and `KafkaWireSpec` exercises THIS path
    * live over a real broker whenever its availability gate opens
    * (GRAFT_KAFKA_BOOTSTRAP + connector present — neither ships in this
    * environment, so it cancels here).
    *
    * Exactly-once: pair with a checkpointed sink — the replacement for the
    * reference consumer's at-least-once autocommit (`main.py:52-53`).
    */
  def kafkaEnvelopeStream(spark: SparkSession, bootstrap: String,
      topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest") // R3: replay initial snapshot
      .load()
      .select(col("value").cast("string").as("value"),
        col("timestamp").as("kafka_ts")) // R8 metadata extraction
      .filter(col("value").isNotNull)    // C8 tombstone guard
      .select(from_json(col("value"), Schemas.envelopeType).as("e"), col("kafka_ts"))
      .select(col("e.*"), col("kafka_ts"))

  /** S3 — JSON-lines changelog (batch): the same envelope wire format read
    * from files, e.g. an archived topic dump.
    */
  def jsonChangelog(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.envelopeType).json(path)

  /** S4 — console sink (the reference's log sink, `main.py:47`). */
  def consoleSink(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.format("console").outputMode("append")

  /** R4 — envelope serialization to the Kafka wire shape: one (key, value)
    * string row per event. key = the primary key (Debezium keys records by
    * PK so log compaction keeps the latest per row, `README.md:173` topic
    * contract); value = the self-describing JSON envelope, the exact format
    * [[kafkaEnvelopeStream]] / `graft.operators.Cdc.parseEnvelope` read
    * back — the round trip is spec-verified (wire → parse ≡ identity).
    */
  def envelopeWire(changelog: DataFrame): DataFrame =
    changelog.select(
      coalesce(col("after.id"), col("before.id")).cast("string").as("key"),
      to_json(struct(col("before"), col("after"), col("source"),
        col("op"), col("ts_ms"), col("transaction"))).as("value"))

  /** R4 — Kafka envelope sink: re-emit envelopes to a topic (the reference
    * publish path, `README.md:173`). Requires the Kafka connector + broker
    * at runtime; the serialization half is [[envelopeWire]], which tests
    * cover via the memory-sink round trip (no broker in this environment).
    */
  def kafkaEnvelopeSink(changelog: DataFrame, bootstrap: String, topic: String,
      checkpoint: String): DataStreamWriter[Row] =
    envelopeWire(changelog).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")

  /** S5 — checkpointed parquet sink: exactly-once per epoch. */
  def parquetSink(df: DataFrame, path: String, checkpoint: String,
      intervalMs: Long = 5000): DataStreamWriter[Row] =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(intervalMs))
      .outputMode("append")
}
