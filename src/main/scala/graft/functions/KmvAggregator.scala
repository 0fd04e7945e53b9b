package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed aggregator:
  * the buffer is the k smallest DISTINCT hash values seen, kept sorted
  * ascending. O(k) state per group however large the group, partial-
  * aggregated map-side and merged associatively — the same plan shape
  * as a plain count, unlike exact count(DISTINCT) whose state is the
  * full distinct set.
  *
  * The output is the raw sketch tail (n = values held, kth = largest
  * held when saturated): callers turn it into the standard estimator
  * (k-1) / (kth / 2^bits), or keep n as the exact count while the
  * group is below k. Estimation stays OUTSIDE the aggregator so the
  * same sketch also serves set operations (union = merge, which is
  * exactly `merge` below).
  *
  * Hashes must be non-negative and fit a double exactly for portable
  * estimation — use PortableSketches.hash40 (40-bit md5).
  */
final case class KmvBuf(hs: List[Long])
final case class KmvOut(n: Int, kth: Long)

class KmvAggregator(k: Int) extends Aggregator[Long, KmvBuf, KmvOut] {
  require(k >= 2, s"k must be >= 2, got $k")

  // sorted insert, dedup, cap at k — O(k) worst case per row; rows
  // hashing above the current k-th min take the first branch and cost
  // O(1) comparisons, which is the steady state on big groups
  private def insert(xs: List[Long], h: Long): List[Long] = {
    if (xs.lengthCompare(k) >= 0 && h >= xs.last) xs
    else {
      val (lo, hi) = xs.span(_ < h)
      if (hi.nonEmpty && hi.head == h) xs
      else (lo ::: h :: hi).take(k)
    }
  }

  override def zero: KmvBuf = KmvBuf(Nil)
  override def reduce(b: KmvBuf, h: Long): KmvBuf = KmvBuf(insert(b.hs, h))
  override def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf = {
    // sorted merge with dedup, capped at k
    val out = List.newBuilder[Long]
    var (l, r, n, last) = (b1.hs, b2.hs, 0, -1L)
    while (n < k && (l.nonEmpty || r.nonEmpty)) {
      val h = if (r.isEmpty || (l.nonEmpty && l.head <= r.head)) {
        val v = l.head; l = l.tail; v
      } else { val v = r.head; r = r.tail; v }
      if (h != last) { out += h; last = h; n += 1 }
    }
    KmvBuf(out.result())
  }
  override def finish(b: KmvBuf): KmvOut =
    KmvOut(b.hs.length, if (b.hs.lengthCompare(k) >= 0) b.hs.last else 0L)
  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvOut] = Encoders.product[KmvOut]
}
