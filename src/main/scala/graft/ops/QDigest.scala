package graft.ops

/** Q-digest (Shrivastava, Buragohain, Agrawal & Suri, "Medians and
  * Beyond", SenSys 2004): the DETERMINISTIC mergeable quantile sketch,
  * completing the engine's portable-sketch algebra beside HLL
  * (cardinality), CMS (frequency) and KMV (overlap) — quantiles are
  * the fourth classic a telemetry/latency pipeline persists per shard
  * and rolls up by merging, never by re-scanning.
  *
  * Structure: a complete binary tree over the integer domain [1, U]
  * (heap ids — leaf for value v is U+v−1); the sketch is a sparse
  * (node → count) map. COMPRESS walks child levels deepest-first and
  * merges each family into its parent when
  * count(left)+count(right)+count(parent) < ⌊n/K⌋ (the paper's strict
  * digest property) — ranks blur by at most log₂U·n/K, the accuracy/
  * size dial. MERGE is count-map addition followed by a recompress
  * under the combined n: associative, the daily→monthly rollup
  * contract, and — unlike t-digest/KLL's randomized compaction —
  * bit-deterministic, so a DuckDB oracle replays the whole fit and
  * the result is hash-checkable, not just bound-checkable.
  *
  * Every number is exact int64 (counts, thresholds via integer
  * division, rank targets via (n·pct+99)/100 ceilings), the
  * engine-wide portable-sketch rule.
  */
object QDigest {

  /** Domain ceiling (power of two). */
  val U = 1024
  /** log₂ U — the tree depth and the unrolled compress rounds. */
  val logU = 10
  /** Compression parameter: rank error ≤ log₂U·n/K = n/102 ranks. */
  val K = 256

  def leafOf(v: Long): Long = U + math.min(math.max(v, 1L), U.toLong) - 1

  /** One compress pass: child levels deepest-first, family-merge under
    * the strict ⌊n/K⌋ threshold. Pure function of (nodes, n).
    */
  def compress(nodes: Map[Long, Long], n: Long): Map[Long, Long] = {
    val tau = n / K
    val c = scala.collection.mutable.Map[Long, Long](nodes.toSeq: _*)
    var d = logU
    while (d >= 1) {
      val lo = 1L << d
      val hi = (1L << (d + 1)) - 1
      val parents = c.keys.filter(i => i >= lo && i <= hi).map(_ / 2).toSeq
        .distinct.sorted
      parents.foreach { p =>
        val tot = c.getOrElse(2 * p, 0L) + c.getOrElse(2 * p + 1, 0L) +
          c.getOrElse(p, 0L)
        if (tot < tau) {
          c.remove(2 * p); c.remove(2 * p + 1)
          c.update(p, tot)
        }
      }
      d -= 1
    }
    c.toMap
  }

  /** Merge = count-map addition + recompress under the combined n. */
  def merge(digests: Seq[Map[Long, Long]]): Map[Long, Long] = {
    val summed = digests.flatten
      .groupMapReduce(_._1)(_._2)(_ + _)
    compress(summed, summed.values.sum)
  }

  /** Leaf span [lo, hi] of node id. */
  def span(id: Long): (Long, Long) = {
    val d = 63 - java.lang.Long.numberOfLeadingZeros(id)
    val w = U >> d
    val lo = (id - (1L << d)) * w + 1
    (lo, lo + w - 1)
  }

  /** Rank-target ceiling for percentile `pct` ∈ (0, 100]. */
  def target(n: Long, pct: Int): Long = (n * pct + 99) / 100

  /** Quantile estimate: nodes in (hi ASC, width ASC) order, first hi
    * whose cumulative count reaches the target — the paper's walk.
    */
  def quantile(digest: Map[Long, Long], n: Long, pct: Int): Long = {
    val t = target(n, pct)
    var cum = 0L
    val ordered = digest.toSeq.map { case (id, cnt) =>
      val (lo, hi) = span(id); (hi, hi - lo, cnt)
    }.sortBy { case (hi, w, _) => (hi, w) }
    ordered.foreach { case (hi, _, cnt) =>
      cum += cnt
      if (cum >= t) return hi
    }
    U.toLong
  }

  /** Exact quantile over a (value → count) distribution (the sketch's
    * ground truth — vocabulary-sized math, for the error-exposure
    * columns).
    */
  def exactQuantile(dist: Map[Long, Long], n: Long, pct: Int): Long = {
    val t = target(n, pct)
    var cum = 0L
    dist.toSeq.sortBy(_._1).foreach { case (v, cnt) =>
      cum += cnt
      if (cum >= t) return v
    }
    U.toLong
  }
}
