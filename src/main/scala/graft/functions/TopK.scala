package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY.md §2.2 UDAF surface; §4.2 perf escape
  * hatch for X3).
  *
  * Why this beats the window row_number() formulation at scale: Spark runs
  * `Aggregator`s with map-side partial aggregation, so each input partition
  * ships at most k (sim, id) pairs to the shuffle — for brute-force
  * similarity search over N corpus vectors that is k rows per partition
  * instead of N candidate rows through a key-partitioned sort window.
  *
  * Ordering is total and deterministic: sim descending, id ascending on
  * ties — identical to the oracle's `ORDER BY sim DESC, vec_id`.
  */
object TopK {
  case class Hit(sim: Double, id: Long)
  case class Buf(hits: List[Hit])

  private val ord: Ordering[Hit] =
    Ordering.by[Hit, (Double, Long)](h => (-h.sim, h.id))

  class TopKAgg(k: Int) extends Aggregator[Hit, Buf, List[Hit]] {
    override def zero: Buf = Buf(Nil)
    private def trim(hits: List[Hit]): List[Hit] = hits.sorted(ord).take(k)
    override def reduce(b: Buf, h: Hit): Buf = Buf(trim(h :: b.hits))
    override def merge(a: Buf, b: Buf): Buf = Buf(trim(a.hits ::: b.hits))
    override def finish(b: Buf): List[Hit] = b.hits.sorted(ord)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[List[Hit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Hit]]()
  }

  def topK(k: Int): TopKAgg = new TopKAgg(k)
}
