package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.Schemas.{CdcEvent, CdcRow, CdcSource}
import graft.operators.Cdc

/** Property-based invariant (SURVEY.md §5.2.5): for ANY op sequence per
  * key, the distributed window fold (C4) equals a sequential last-writer
  * dictionary replay.
  */
object CdcPropertySpec extends Properties("CdcSnapshot") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = TestSpark.spark

  def src(lsn: Long) = CdcSource("v", "postgresql", "cdctest", lsn, None,
    "cdctest", "public", "customers", None, Some(lsn), None)

  val genOps: Gen[List[String]] = Gen.listOfN(6,
    Gen.frequency(3 -> "c", 4 -> "u", 2 -> "d", 1 -> "r")).map(l => if (l.isEmpty) List("c") else l)

  val genChangelog: Gen[Map[Long, List[String]]] =
    Gen.mapOfN(5, Gen.zip(Gen.choose(1L, 40L), genOps))

  def materialize(keyed: Map[Long, List[String]]): Seq[CdcEvent] =
    keyed.toSeq.flatMap { case (id, ops) =>
      ops.zipWithIndex.map { case (op, i) =>
        val lsn = id * 1000 + i
        val img = Some(CdcRow(id, Some(s"v$i"), Some("l"), Some(s"$id-$i@x")))
        op match {
          case "d" => CdcEvent(img, None, src(lsn), "d", lsn)
          case o => CdcEvent(None, img, src(lsn), o, lsn)
        }
      }
    }

  /** Sequential truth: last op per key wins (ops are lsn-ordered). */
  def replay(keyed: Map[Long, List[String]]): Map[Long, String] =
    keyed.flatMap { case (id, ops) =>
      val lastIdx = ops.length - 1
      if (ops(lastIdx) == "d") None else Some(id -> s"$id-$lastIdx@x")
    }

  property("window fold == sequential replay for random op sequences") =
    forAll(genChangelog) { keyed =>
      import spark.implicits._
      val events = materialize(keyed)
      Prop.collect(events.size) {
        if (events.isEmpty) Prop.passed
        else {
          val got = Cdc.snapshot(events.toDS.toDF).collect()
            .map(r => r.getLong(0) -> r.getString(3)).toMap
          val expected = replay(keyed)
          Prop(got == expected) :| s"got=$got expected=$expected"
        }
      }
    }

  property("set operations agree with Scala Set algebra on random key sets") =
    forAll(Gen.listOf(Gen.choose(0L, 30L)), Gen.listOf(Gen.choose(0L, 30L))) { (xs, ys) =>
      import spark.implicits._
      val a = xs.toDF("k"); val b = ys.toDF("k")
      val union = a.union(b).distinct().as[Long].collect().toSet
      val inter = a.intersect(b).as[Long].collect().toSet
      val except = a.except(b).as[Long].collect().toSet
      val (sa, sb) = (xs.toSet, ys.toSet)
      Prop(union == (sa | sb) && inter == (sa & sb) && except == (sa -- sb)) :|
        s"sets diverged: u=$union i=$inter e=$except"
    }

  property("snapshot is idempotent under event duplication (at-least-once)") =
    forAll(genChangelog) { keyed =>
      import spark.implicits._
      val events = materialize(keyed)
      if (events.isEmpty) Prop.passed
      else {
        val once = Cdc.snapshot(events.toDS.toDF).collect()
          .map(r => r.getLong(0) -> r.getString(3)).toMap
        val dup = Cdc.snapshot((events ++ events).toDS.toDF).collect()
          .map(r => r.getLong(0) -> r.getString(3)).toMap
        Prop(once == dup) :| s"dup delivery changed the snapshot"
      }
    }
}
