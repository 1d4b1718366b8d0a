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
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column = {
    // BloomFilterAggregate Math.min-CLAMPS both parameters against the
    // runtime-bloom-filter SQLConf maxima with no error (verified in the
    // Spark 4.1 source): a crawl-scale request silently builds a tiny
    // sketch whose false-positive rate approaches 1 — and a Bloom
    // decontamination consumer then removes ~the whole corpus. The "no
    // false negatives, bounded false positives" contract dies silently,
    // so fail loudly here instead.
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val maxItems = conf.getConf(
      org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_ITEMS)
    val maxBits = conf.getConf(
      org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_BITS)
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloomAgg: requested sketch (items=$expectedItems, bits=$numBits) " +
        s"exceeds Spark's limits (maxNumItems=$maxItems, " +
        s"maxNumBits=$maxBits) and would be SILENTLY clamped to a " +
        "near-useless false-positive rate — raise spark.sql.optimizer." +
        "runtime.bloomFilter.maxNumBits/maxNumItems to match the corpus")
    GraftBridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(GraftBridge.expression(c))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Probe a serialized sketch: true = possibly present, false =
    * DEFINITELY absent. The sketch rides as a binary literal (broadcast
    * with the plan — numBits/8 bytes).
    */
  def mightContain(sketch: Array[Byte], c: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      new XxHash64(Seq(GraftBridge.expression(c)))))

  /** Standard Bloom sizing: the minimum bit count holding the target
    * false-positive rate `p` for `n` inserted items —
    * m = ceil(−n·ln p ⁄ ln²2) — rounded up to a byte boundary (the
    * serialized sketch is whole bytes). Monotone in n and in 1/p. The
    * optimal hash count at this size, k = (m/n)·ln 2, is what
    * [[bloomAgg]] derives from (expectedItems = n, numBits = m), so
    * callers size with this and pass both through. ~1.44·log2(1/p)
    * bits/item: 19 bits at p = 1e-4, 24 at 1e-5 — the sketch stays a
    * bounded model artifact at any eval-suite scale.
    */
  def bitsFor(n: Long, p: Double): Long = {
    require(n > 0, s"bloom sizing needs n > 0, got $n")
    require(p > 0 && p < 1, s"bloom sizing needs 0 < p < 1, got $p")
    val ln2 = math.log(2.0)
    val m = math.ceil(-n.toDouble * math.log(p) / (ln2 * ln2)).toLong
    ((m + 7) / 8) * 8
  }
}
