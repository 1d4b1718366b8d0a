package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import graft.Schemas.{CdcEvent, CdcRow, CdcSource}
import graft.streaming.Streams
import graft.streaming.Streams.{GatedEvent, TxGateState, TxInput}

/** Property-based invariants for the T12 cross-table transaction gate
  * (`Streams.txGateKey`), driven as a pure state machine via Spark's
  * `TestGroupState` — no streaming query needed, so hundreds of random
  * interleavings are cheap:
  *
  * For ANY assignment of a transaction's events to two tables, ANY global
  * interleaving of events and END markers, and ANY split of that stream
  * into micro-batches:
  *   1. nothing of a transaction is released before the batch in which
  *      BOTH its END marker and its last data event have arrived;
  *   2. in exactly that batch, ALL of its events release at once, sorted
  *      by (table, lsn);
  *   3. every event releases exactly once, and the gate's state for the
  *      transaction is freed on release.
  */
object TxGatePropertySpec extends Properties("TxGate") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  def src(lsn: Long) = CdcSource("v", "postgresql", "cdctest", lsn, None,
    "cdctest", "public", "t", None, Some(lsn), None)

  case class TxCase(txId: String, events: List[(String, Long)]) // (table, lsn)

  val genTx: Gen[Int => TxCase] = for {
    n <- Gen.choose(1, 6)
    tables <- Gen.listOfN(n, Gen.oneOf("customers", "orders"))
  } yield (i: Int) =>
    TxCase(s"tx-$i", tables.zipWithIndex.map { case (t, j) => (t, i * 100L + j) })

  val genCase: Gen[(List[TxCase], List[List[TxInput]])] = for {
    k <- Gen.choose(1, 4)
    mk <- Gen.listOfN(k, genTx)
    txs = mk.zipWithIndex.map { case (f, i) => f(i) }
    inputs = txs.flatMap { tx =>
      tx.events.map { case (t, lsn) =>
        TxInput(tx.txId, Some(t),
          Some(CdcEvent(None, Some(CdcRow(lsn, None, None, None)),
            src(lsn), "c", lsn)), None)
      } :+ TxInput(tx.txId, None, None, Some(tx.events.size.toLong))
    }
    // at-least-once source: redeliver a random subset of data events — a
    // duplicate must never satisfy the marker's count in place of a
    // missing distinct event, nor release anything twice
    dups <- Gen.someOf(inputs.filter(_.event.isDefined))
    shuffled <- Gen.const(inputs ++ dups).flatMap(l =>
      Gen.listOfN(l.size, Gen.choose(0, Int.MaxValue)).map(ks =>
        l.zip(ks).sortBy(p => (p._2, p._1.hashCode)).map(_._1)))
    nBatches <- Gen.choose(1, 5)
    cuts <- Gen.listOfN(nBatches - 1, Gen.choose(0, shuffled.size))
  } yield {
    val bounds = (0 +: cuts.sorted :+ shuffled.size).distinct.sorted
    (txs, bounds.zip(bounds.tail).map { case (a, b) => shuffled.slice(a, b) })
  }

  property("all-or-nothing release at the exact completion batch; exactly once") =
    forAll(genCase) { case (txs, batches) =>
      // drive txGateKey per (tx, batch) through TestGroupState
      var states = Map.empty[String, TxGateState]
      val releasedPerBatch: Seq[Map[String, Seq[GatedEvent]]] =
        batches.map { batch =>
          batch.groupBy(_.txId).map { case (txId, ins) =>
            val st = TestGroupState.create[TxGateState](
              org.apache.spark.api.java.Optional.fromNullable(states.get(txId).orNull),
              GroupStateTimeout.NoTimeout, 0L,
              org.apache.spark.api.java.Optional.absent[Long](),
              hasTimedOut = false)
            val out = Streams.txGateKey(txId, ins.iterator, st).toSeq
            states =
              if (st.isRemoved || !st.exists) states - txId
              else states + (txId -> st.get)
            txId -> out
          }
        }
      val props = txs.map { tx =>
        // completion batch: first batch by which the marker AND all
        // DISTINCT events have arrived (redeliveries must not count)
        val seen = batches.scanLeft((Set.empty[(String, Long)], false)) {
          case ((s, m), batch) =>
            val mine = batch.filter(_.txId == tx.txId)
            (s ++ mine.flatMap(i =>
               i.event.map(e => (i.table.get, e.source.lsn.get))),
             m || mine.exists(_.endCount.isDefined))
        }.tail
        val expectedBatch = seen.indexWhere { case (s, m) => m && s.size == tx.events.size }
        val perBatch = releasedPerBatch.map(_.getOrElse(tx.txId, Nil))
        val releasedAt = perBatch.indexWhere(_.nonEmpty)
        val all = perBatch.flatten
        (Prop(releasedAt == expectedBatch) :| s"${tx.txId} released at $releasedAt, expected $expectedBatch") &&
        (Prop(all.size == tx.events.size) :| s"${tx.txId} exactly-once violated: ${all.size}") &&
        (Prop(all == all.sortBy(g => (g.table, g.event.source.lsn.get))) :| s"${tx.txId} order") &&
        (Prop(all.map(g => (g.table, g.event.source.lsn.get)).toSet == tx.events.toSet) :| s"${tx.txId} content") &&
        // state freed on release; a POST-release redelivery may leave an
        // inert expected-less stub (timeout policy's job), never live state
        (Prop(states.get(tx.txId).forall(_.expected.isEmpty)) :| s"${tx.txId} live state not freed")
      }
      props.reduce(_ && _)
    }

  /** Regression: a source that omits lsn entirely (every event
    * `source.lsn = None`) must still complete — event identity falls back
    * to (table, lsn, ts_ms, op), so distinct events no longer collapse
    * into one buffered entry (which would leave the marker's count
    * forever unmet and withhold the transaction silently). Redeliveries
    * of the same lsn-less event must still dedup. */
  property("lsn-less events complete the transaction; redeliveries still dedup") =
    forAll(Gen.choose(2, 6), Gen.choose(0, 5)) { (n, dupSeed) =>
      val srcNoLsn = CdcSource("v", "mongodb", "cdctest", 0L, None,
        "cdctest", "public", "t", None, None, None)
      val events = (0 until n).map { j =>
        TxInput("tx-0", Some(if (j % 2 == 0) "customers" else "orders"),
          Some(CdcEvent(None, Some(CdcRow(j.toLong, None, None, None)),
            srcNoLsn, "c", 1000L + j)), None) // distinct ts_ms per event
      }
      // early deliveries of a strict subset (never the final event), so the
      // transaction cannot legitimately complete before r3
      val dups = events.take(dupSeed % n)
      val marker = TxInput("tx-0", None, None, Some(n.toLong))
      var states = Map.empty[String, TxGateState]
      def drive(batch: Seq[TxInput]): Seq[GatedEvent] = {
        val st = TestGroupState.create[TxGateState](
          org.apache.spark.api.java.Optional.fromNullable(states.get("tx-0").orNull),
          GroupStateTimeout.NoTimeout, 0L,
          org.apache.spark.api.java.Optional.absent[Long](),
          hasTimedOut = false)
        val out = Streams.txGateKey("tx-0", batch.iterator, st).toSeq
        states =
          if (st.isRemoved || !st.exists) states - "tx-0"
          else states + ("tx-0" -> st.get)
        out
      }
      // marker + redeliveries first, then all but one event, then the last:
      // nothing may release until the final distinct event arrives
      val r1 = drive(marker +: dups)
      val r2 = drive(events.dropRight(1))
      val r3 = drive(Seq(events.last))
      (Prop(r1.isEmpty && r2.isEmpty) :| "released before completion") &&
      (Prop(r3.size == n) :| s"released ${r3.size} of $n on completion") &&
      (Prop(r3.map(_.event.ts_ms).toSet == events.flatMap(_.event).map(_.ts_ms).toSet) :| "content")
    }
}
