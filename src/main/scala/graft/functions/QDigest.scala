package graft.functions

import scala.collection.mutable

/** Q-digest — the deterministic, mergeable quantile summary (Shrivastava,
  * Buragohain, Agrawal, Suri, "Medians and Beyond: New Aggregation
  * Techniques for Sensor Networks", SenSys'04) — the quantile member of
  * the durable sketch tier (T20 Misra–Gries heavy hitters, T21 HLL
  * distinct, T22 CMS frequency, T26 this).
  *
  * Structure: counts on nodes of the complete binary tree over a fixed
  * integer universe [0, U). Heap ids: root = 1, children of v are 2v and
  * 2v+1, leaf for value x is U + x. COMPRESS moves small sibling-pair
  * counts upward: bottom-up, a (left, right, parent) triple whose total is
  * ≤ ⌊n/k⌋ folds into the parent — so the digest holds ≤ 3k nodes, each
  * internal node's count is ≤ n/k (contributions from every merge are
  * each bounded by their own epoch's n_i/k, and thresholds scale with n,
  * so the invariant survives arbitrary merge trees — the mergeable-
  * summaries property), and a quantile read's rank error is at most
  * log2(U)·n/k (the stored strict ancestors of the true leaf's path are
  * the only uncertainty, one per level).
  *
  * Everything here is DRIVER-side arithmetic over ≤3k-node maps (the T20
  * "models are small" discipline); the distributed side only ever
  * produces per-leaf counts, which are bounded by U = 2^16 rows — a
  * constant, not data-proportional. All iteration orders are sorted, so
  * compress and serialization are DETERMINISTIC: the same inputs commit
  * byte-identical state (the T21/T22 replay contract, stronger than
  * T20's contract-level idempotence).
  */
object QDigest {
  val logU = 16
  val U: Long = 1L << logU // domain [0, U); heap ids 1 .. 2U-1

  /** Heap id of the leaf for domain value x (caller clamps x to [0, U)). */
  def leaf(x: Long): Long = U + math.min(math.max(x, 0L), U - 1)

  /** (lo, hi) domain range covered by heap node id. */
  def range(id: Long): (Long, Long) = {
    var v = id
    var width = 1L
    while (v < U) { v <<= 1; width <<= 1 } // descend to leftmost leaf
    val lo = v - U
    (lo, lo + width - 1)
  }

  /** Bottom-up deterministic compress at threshold ⌊n/k⌋ (≥1), run to
    * FIXPOINT: a single bottom-up sweep can leave a foldable triple
    * behind — when a pair's evaluation is blocked by its parent's count
    * and that parent later folds ITSELF upward, the pair becomes
    * foldable only in a subsequent sweep. Sweeping until no fold fires
    * makes compress idempotent, which is what lets an empty / replayed
    * epoch recommit byte-identical state (the T26 contract); each fold
    * strictly reduces the node count, so termination is immediate.
    */
  def compress(counts: collection.Map[Long, Long], n: Long,
      k: Int): Map[Long, Long] = {
    val thresh = math.max(1L, n / k)
    val cur = mutable.TreeMap.empty[Long, Long]
    counts.foreach { case (id, c) => if (c > 0)
      cur(id) = cur.getOrElse(id, 0L) + c }
    var changed = true
    while (changed) {
      changed = false
      for (level <- logU to 1 by -1) {
        val levelLo = 1L << level
        val levelHi = (1L << (level + 1)) - 1L
        val parents = cur.range(levelLo, levelHi + 1).keys
          .map(_ >> 1).toSeq.distinct // sorted: TreeMap range is ordered
        parents.foreach { p =>
          val cl = cur.getOrElse(2 * p, 0L)
          val cr = cur.getOrElse(2 * p + 1, 0L)
          val cp = cur.getOrElse(p, 0L)
          if (cl + cr + cp <= thresh && cl + cr > 0) {
            cur.remove(2 * p); cur.remove(2 * p + 1)
            cur(p) = cl + cr + cp
            changed = true
          }
        }
      }
    }
    cur.toMap
  }

  /** Merge two digests (count addition + recompress at the combined n). */
  def merge(a: collection.Map[Long, Long], b: collection.Map[Long, Long],
      n: Long, k: Int): Map[Long, Long] = {
    val m = mutable.Map.empty[Long, Long]
    (a.iterator ++ b.iterator).foreach { case (id, c) =>
      m(id) = m.getOrElse(id, 0L) + c }
    compress(m, n, k)
  }

  /** The value whose rank is within log2(U)·n/k of ⌈qNum/qDen · n⌉:
    * nodes sorted by (hi asc, lo desc) — narrower ranges first on a tied
    * upper bound, the paper's post-order — accumulated until the target
    * rank is covered; the node's hi endpoint is the answer.
    */
  def quantile(digest: collection.Map[Long, Long], n: Long,
      qNum: Long, qDen: Long): Long = {
    val target = (qNum * n + qDen - 1) / qDen
    val ordered = digest.toSeq.map { case (id, c) =>
      val (lo, hi) = range(id); (hi, -lo, c)
    }.sorted
    var cum = 0L
    var ans = ordered.lastOption.map(_._1).getOrElse(0L)
    val it = ordered.iterator
    var found = false
    while (it.hasNext && !found) {
      val (hi, _, c) = it.next()
      cum += c
      if (cum >= target) { ans = hi; found = true }
    }
    ans
  }

  /** Total count held by the digest. */
  def total(digest: collection.Map[Long, Long]): Long =
    digest.valuesIterator.sum
}
