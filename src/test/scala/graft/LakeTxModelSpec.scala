package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LakeFormat, LakeTx}

/** MODEL-BASED randomized equivalence for the TRANSACTION layer
  * ([[graft.sources.LakeTx]]), the two-table sibling of LakeModelSpec's
  * single-table sweep: a fixed-seed random sequence of multi-table
  * commitTx / exactly-once replay / member optimize / manifest-
  * coordinated vacuum / member checkpoint / transaction-aligned
  * consumer drains runs against BOTH the transactional root and a
  * trivial in-memory two-table fold. After every few operations each
  * member's manifest-pinned snapshot must equal its model exactly, and
  * a consumeChanges consumer folding the feed must reconstruct the
  * model AS OF its drained manifest — including re-bootstrapping from
  * the retention floor after a vacuum outran it (the loud-failure +
  * reseed path a lagging production consumer walks). Fixed seed:
  * failures reproduce deterministically.
  */
class LakeTxModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  type Model = scala.collection.mutable.Map[Long, (Long, Boolean, String)]

  test("40 random commitTx/replay/optimize/vacuum/checkpoint/drain ops track a two-table fold exactly") {
    val root = {
      val p = Files.createTempDirectory("lake_tx_model")
      p.toFile.deleteOnExit()
      p.toString
    }
    val tables = Seq("a", "b")
    val schema = Some(org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, lsn BIGINT, live BOOLEAN, v STRING"))
    tables.foreach(t => LakeFormat.create(spark, LakeTx.tableRoot(root, t),
      Seq("id"), statsCols = Seq("id"), schema = schema))
    LakeTx.init(spark, root, tables)

    val rnd = new scala.util.Random(1337)
    val model: Map[String, Model] =
      tables.map(_ -> scala.collection.mutable
        .Map.empty[Long, (Long, Boolean, String)]).toMap
    // manifestV -> LIVE projection (table -> key -> payload) at that
    // manifest, for transaction-aligned consumer verification
    val history = scala.collection.mutable.Map.empty[Long, Map[String, Map[Long, String]]]
    def liveProjection(): Map[String, Map[Long, String]] =
      tables.map(t => t -> model(t).collect {
        case (k, (_, true, v)) => k -> v }.toMap).toMap
    history(LakeTx.manifestVersion(spark, root)) = liveProjection()

    var lsn = 0L
    var txv = 0L
    var lastTx: Option[(Long, Map[String, Seq[(Long, Long, Boolean, String)]])] = None
    var manifestFloor = 0L
    val opsDone = scala.collection.mutable.ArrayBuffer.empty[String]

    def batchFor(t: String): Seq[(Long, Long, Boolean, String)] = {
      val n = 1 + rnd.nextInt(4)
      val keys = scala.collection.mutable.LinkedHashSet.empty[Long]
      while (keys.size < n) keys += rnd.nextInt(25).toLong
      keys.toSeq.map { k =>
        lsn += 1
        val l = if (rnd.nextInt(5) == 0 && model(t).contains(k))
          math.max(0L, model(t)(k)._1 - 1) else lsn // occasional stale event
        val live = rnd.nextInt(4) != 0
        (k, l, live, if (live) s"$t$l-$k" else null)
      }
    }

    def commitOp(): Unit = {
      val touched = rnd.nextInt(3) match {
        case 0 => Seq("a")
        case 1 => Seq("b")
        case _ => tables
      }
      txv += 1
      val batches = touched.map(t => t -> batchFor(t)).toMap
      val mv = LakeTx.commitTx(spark, root,
        batches.map { case (t, b) => t -> b.toDF("id", "lsn", "live", "v") },
        "model", txv)
      batches.foreach { case (t, b) =>
        b.foreach { case (k, l, live, v) =>
          if (model(t).get(k).forall(_._1 <= l)) model(t)(k) = (l, live, v)
        }
      }
      lastTx = Some((txv, batches))
      history(mv) = liveProjection()
    }

    def replayOp(): Unit = lastTx.foreach { case (tv, batches) =>
      val before = LakeTx.manifestVersion(spark, root)
      val mv = LakeTx.commitTx(spark, root,
        batches.map { case (t, b) => t -> b.toDF("id", "lsn", "live", "v") },
        "model", tv)
      assert(mv === before, "a full replay must not mint a manifest version")
    }

    // transaction-aligned consumer: folds the feed per drained manifest
    // and must match the model's live projection AT that manifest
    val consumerDir = Files.createTempDirectory("lake_tx_model_cons").toString
    val consumerState: Map[String, scala.collection.mutable.Map[Long, String]] =
      tables.map(_ -> scala.collection.mutable.Map.empty[Long, String]).toMap

    def drainOp(): Unit = {
      val off = LakeFormat.consumerOffset(spark, consumerDir).getOrElse(0L)
      if (off < manifestFloor) {
        // lagging past retention: the drain MUST fail loudly, then the
        // consumer re-bootstraps from the floor's full state — exactly
        // the documented production remedy
        intercept[Exception](
          LakeTx.consumeChanges(spark, root, consumerDir)((_, _, _) => ()))
        LakeFormat.commitConsumerOffset(spark, consumerDir, manifestFloor)
        tables.foreach { t =>
          consumerState(t).clear()
          consumerState(t) ++= history(manifestFloor)(t)
        }
      }
      var lastApplied = -1L
      LakeTx.consumeChanges(spark, root, consumerDir,
        maxManifests = 1 + rnd.nextInt(2)) { (t, batch, mv) =>
        batch.select("id", "_change_type", "v")
          .as[(Long, String, Option[String])].collect()
          .foreach {
            case (k, "d", _) => consumerState(t) -= k
            case (k, _, v)   => consumerState(t)(k) = v.orNull
          }
        lastApplied = mv
      }
      if (lastApplied >= 0) {
        val want = history(lastApplied)
        tables.foreach(t => assert(consumerState(t).toMap === want(t),
          s"consumer diverged at manifest $lastApplied after ${opsDone.mkString(",")}"))
      }
    }

    def check(): Unit = tables.foreach { t =>
      val got = LakeTx.snapshot(spark, root, t)
        .select("id", "lsn", "live", "v")
        .as[(Long, Long, Boolean, Option[String])].collect()
        .map { case (k, l, live, v) => k -> ((l, live, v.orNull)) }.toMap
      assert(got === model(t).toMap,
        s"table $t diverged from the model after ${opsDone.mkString(",")}")
    }

    (1 to 40).foreach { i =>
      val op = rnd.nextInt(10)
      opsDone += s"$i:$op"
      op match {
        case 0 | 1 | 2 | 3 | 4 => commitOp()
        case 5 => replayOp()
        case 6 =>
          val t = tables(rnd.nextInt(2))
          LakeFormat.optimize(spark, LakeTx.tableRoot(root, t),
            Seq(col("id")), targetFiles = 1 + rnd.nextInt(2))
          ()
        case 7 =>
          val keep = 1 + rnd.nextInt(3)
          LakeTx.vacuum(spark, root, keepManifests = keep, olderThanMs = 0L)
          manifestFloor = math.max(manifestFloor,
            LakeTx.manifestVersion(spark, root) - keep + 1)
        case 8 =>
          LakeFormat.checkpoint(spark, LakeTx.tableRoot(root, tables(rnd.nextInt(2))))
          ()
        case 9 => drainOp()
      }
      if (i % 5 == 0) check()
    }
    check()
    // the consumer catches up to the final state (drains are
    // rate-limited to 1-2 manifests each — loop to exhaustion)
    var guard = 0
    while (LakeFormat.consumerOffset(spark, consumerDir).getOrElse(0L) <
        LakeTx.manifestVersion(spark, root) && guard < 100) {
      drainOp(); guard += 1
    }
    val finalWant = liveProjection()
    tables.foreach(t => assert(consumerState(t).toMap === finalWant(t)))
  }
}
