package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property: the q36 overflow guard trips EXACTLY when a user's
  * n·max|v_c| exceeds the BIGINT headroom bound — adversarial magnitudes
  * fail loudly (where the unguarded z-test would wrap silently in Spark
  * while DuckDB throws, an engine asymmetry), and in-bound data passes
  * through the guard untouched.
  */
object OutlierGuardPropertySpec extends Properties("OutlierGuard") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  lazy val spark = TestSpark.spark

  // magnitudes straddle the bound from both sides: a benign band, and an
  // adversarial band where small n already crosses (or just misses) it
  val genCase: Gen[(Int, Long)] = for {
    n <- Gen.choose(1, 30)
    mag <- Gen.oneOf(Gen.choose(1L, 1000000L),
      Gen.choose(100000000L, 3000000000L))
  } yield (n, mag)

  property("guard trips iff n*max|v_c| > headroom") = forAll(genCase) {
    case (n, mag) =>
      import spark.implicits._
      val ev = (1 to n).map(i => (i.toLong, 1L, if (i == n) mag else 1L))
        .toDF("event_id", "user_id", "v_c")
      val res = scala.util.Try(
        graft.operators.Relational.outliersByKey(ev).collect())
      val overflowing =
        n.toLong * mag > graft.operators.Relational.q36Headroom
      res.isFailure == overflowing
  }
}
