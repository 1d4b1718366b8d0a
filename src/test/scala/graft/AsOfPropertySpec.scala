package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.plans.AsOf

/** Property: for ANY random left/right event sets (small key domain to
  * force collisions, coarse ts domain to force exact-tie cases), the custom
  * AsOfJoinExec agrees with a naive in-memory reference implementation of
  * "greatest right ts <= left ts per key, ties by greatest id".
  */
object AsOfPropertySpec extends Properties("AsOfJoin") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  lazy val spark = TestSpark.spark

  val genRows: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(0, 25)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, 4L)   // small domain: heavy key collisions
      t <- Gen.choose(0L, 12L)  // coarse: frequent exact-ts ties
      id <- Gen.choose(0L, 1000L)
    } yield (k, t, id))
  } yield rows.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) } // unique ids

  def reference(left: List[(Long, Long, Long)],
      right: List[(Long, Long, Long)]): Map[Long, Option[Long]] =
    left.map { case (k, t, id) =>
      val matches = right.filter(r => r._1 == k && r._2 <= t)
      id -> (if (matches.isEmpty) None
             else Some(matches.maxBy(r => (r._2, r._3))._3)) // greatest ts, then id
    }.toMap

  property("custom operator == naive reference on random inputs with ties") =
    forAll(genRows, genRows) { (l, r) =>
      import spark.implicits._
      if (l.isEmpty) Prop.passed
      else {
        val lDf = l.toDF("user_id", "ts_ms", "lid")
        val rDf = r.toDF("user_id", "ts_ms", "rid")
        val got = AsOf.asofJoin(lDf, rDf, "user_id", "ts_ms", tieBreak = Some("rid"))
          .select(col("lid"), col("rid")).collect()
          .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1))))
          .toMap
        val expected = reference(l, r)
        Prop(got == expected) :| s"got=$got expected=$expected l=$l r=$r"
      }
    }
}
