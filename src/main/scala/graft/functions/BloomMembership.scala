package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain,
  Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership via Spark's own codegen'd Catalyst
  * expressions ([[BloomFilterAggregate]] / [[BloomFilterMightContain]] —
  * the machinery behind runtime bloom join-filters, SPARK-32268),
  * bridged to Columns the same way `cms_probe` is. Completes the sketch
  * tier's membership edge: MG undercounts, CMS overcounts, HLL counts
  * distinct, GK ranks, Bloom answers "possibly-in / definitely-not-in"
  * with NO false negatives — the property that makes it safe for
  * decontamination (a miss is impossible; only over-removal is paid).
  *
  * Values hash through XxHash64 (seed 42, Spark's fixed default — the
  * hash the runtime-filter machinery itself uses), so the sketch is
  * deterministic and OR-merge across partitions is order-invariant
  * (a bit-set union is commutative): the same corpus always produces
  * the byte-identical sketch.
  */
object BloomMembership {

  /** Aggregate a column into a serialized Bloom filter (binary).
    * `expectedItems` sizes the hash count k = max(1, round(numBits /
    * expectedItems · ln 2)); `numBits` is the bit-array size — the
    * sketch is numBits/8 bytes, a bounded model artifact (the CMS-grid
    * class), never data-proportional.
    */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    GraftBridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(GraftBridge.expression(c))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe a serialized sketch: true = possibly present, false =
    * DEFINITELY absent. The sketch rides as a binary literal (broadcast
    * with the plan — numBits/8 bytes).
    */
  def mightContain(sketch: Array[Byte], c: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      new XxHash64(Seq(GraftBridge.expression(c)))))
}
