package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitters summary (SURVEY.md §2.2 UDAF
  * surface): at most k-1 counters per buffer, one pass, map-side partial
  * aggregation — the frequent-tokens primitive for corpora whose
  * VOCABULARY is itself too large to shuffle (web-scale crawls: URLs,
  * typos, hashes make the distinct-token table billions of rows; exact
  * counting must shuffle all of it, this ships ≤ k-1 counters per
  * partition, period).
  *
  * Contract (the classic MG theorem, preserved under the mergeable-
  * summaries merge rule — pointwise sum, then subtract the k-th largest
  * and drop non-positive): estimates only UNDERCOUNT, by at most N/k
  * total, so every token with true frequency > N/k is guaranteed present
  * in the summary whatever the partitioning. x4l checks that guarantee
  * cross-engine as oracle booleans (the q9c/x3f bounded-sketch pattern);
  * the estimates themselves are partition-order-dependent and stay out
  * of compared output.
  */
object MisraGries {
  case class Buf(counters: Map[String, Long])

  class MGAgg(k: Int) extends Aggregator[String, Buf, Map[String, Long]] {
    require(k >= 2, "k must be at least 2")
    override def zero: Buf = Buf(Map.empty)

    override def reduce(b: Buf, x: String): Buf = {
      val c = b.counters
      if (c.contains(x)) Buf(c.updated(x, c(x) + 1L))
      else if (c.size < k - 1) Buf(c.updated(x, 1L))
      else // decrement-all step: the new item and one unit of every counter cancel
        Buf(c.collect { case (t, n) if n > 1L => t -> (n - 1L) })
    }

    override def merge(a: Buf, b: Buf): Buf = {
      val sum = (a.counters.keySet ++ b.counters.keySet).iterator
        .map(t => t -> (a.counters.getOrElse(t, 0L) + b.counters.getOrElse(t, 0L)))
        .toMap
      if (sum.size <= k - 1) Buf(sum)
      else {
        // subtract the k-th largest counter; ≤ k-1 stay strictly positive
        val kth = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k - 1)
        Buf(sum.collect { case (t, n) if n > kth => t -> (n - kth) })
      }
    }

    override def finish(b: Buf): Map[String, Long] = b.counters
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  def mg(k: Int): MGAgg = new MGAgg(k)
}
