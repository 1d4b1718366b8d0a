package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.CdcSources

/** S2/R4 LIVE wire integration — the real `format("kafka")` path behind
  * an availability gate. This environment ships no broker and no
  * spark-sql-kafka connector jar, so the suite CANCELS (assume) unless
  * `GRAFT_KAFKA_BOOTSTRAP=host:port` names a reachable broker AND the
  * connector class is on the classpath; everywhere else the wire
  * serialization halves stay covered broker-free (the envelopeWire
  * round-trip spec) and streaming semantics via the MemoryStream
  * stand-in. When the gate opens, the loop closes over the real wire:
  * envelopes batch-write to a fresh topic through the same (key, value)
  * shape [[CdcSources.kafkaEnvelopeSink]] emits, and
  * [[CdcSources.kafkaEnvelopeStream]] (subscribe, earliest offsets,
  * tombstone guard, envelope parse) must read back the identical event
  * set.
  */
class KafkaWireSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Cancel unless a connector and a reachable broker exist. */
  private def gate(): String = {
    val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")
    assume(bootstrap.isDefined,
      "no broker configured — set GRAFT_KAFKA_BOOTSTRAP=host:port")
    assume(scala.util.Try(Class.forName(
        "org.apache.spark.sql.kafka010.KafkaSourceProvider")).isSuccess,
      "spark-sql-kafka connector not on the classpath")
    val hp = bootstrap.get.split(":")
    val reachable = scala.util.Try {
      val s = new java.net.Socket()
      try s.connect(
        new java.net.InetSocketAddress(hp(0), hp(1).toInt), 2000)
      finally s.close()
    }.isSuccess
    assume(reachable, s"broker ${bootstrap.get} not reachable")
    bootstrap.get
  }

  test("kafka wire round trip: envelopes written to a topic parse back identically through kafkaEnvelopeStream") {
    val bootstrap = gate()
    val topic = s"graft-wire-${java.util.UUID.randomUUID().toString.take(8)}"
    val chg = graft.operators.Cdc.changelog(spark, TestSpark.sf)
      .limit(20).localCheckpoint()
    CdcSources.envelopeWire(chg).write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .save()
    val q = CdcSources.kafkaEnvelopeStream(spark, bootstrap, topic)
      .writeStream.format("memory").queryName("kwire")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("kwire").toString)
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("kwire")
        .select(col("op"), col("source.lsn").as("lsn"),
          col("after.email").as("em"))
        .as[(String, Long, Option[String])].collect().toSeq.sorted
      val want = chg
        .select(col("op"), col("source.lsn").as("lsn"),
          col("after.email").as("em"))
        .as[(String, Long, Option[String])].collect().toSeq.sorted
      assert(got === want)
    } finally q.stop()
  }
}
