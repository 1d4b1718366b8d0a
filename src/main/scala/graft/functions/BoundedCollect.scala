package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded list-collect: `collect_list` with a hard cap.
  *
  * Collects up to `max` values per group; a group that exceeds the cap
  * collapses to the empty list (tagged overflowed while aggregating). The
  * partial-aggregation buffer therefore never holds more than `max + 1`
  * elements ON ANY TASK, no matter how hot the key — the safe way to gather
  * per-key membership lists on skewed data, where a plain collect_list
  * would balloon one reducer.
  *
  * Used by the n-gram Jaccard candidate stage: group shingle → doc list,
  * drop lists over the document-frequency cap, explode the survivors into
  * candidate pairs. One shuffle replaces the count-join-selfjoin chain, and
  * the df cap is enforced during aggregation rather than after it.
  */
object BoundedCollect {
  /** (items, overflowed) — overflow is sticky through reduce/merge. */
  type Buf = (List[Long], Boolean)

  def boundedCollect(max: Int): Aggregator[Long, Buf, Seq[Long]] =
    new Aggregator[Long, Buf, Seq[Long]] {
      def zero: Buf = (Nil, false)
      def reduce(b: Buf, v: Long): Buf =
        if (b._2) b
        else if (b._1.length >= max) (Nil, true)
        else (v :: b._1, false)
      def merge(a: Buf, b: Buf): Buf =
        if (a._2 || b._2) (Nil, true)
        else if (a._1.length + b._1.length > max) (Nil, true)
        else (a._1 ::: b._1, false)
      def finish(b: Buf): Seq[Long] = if (b._2) Nil else b._1
      def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
      def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    }
}
