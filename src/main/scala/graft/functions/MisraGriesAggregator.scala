package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Misra-Gries heavy-hitters sketch (Misra & Gries 1982; mergeable form
  * Agarwal et al. PODS 2012) — the FREQUENCY member of the sketch
  * family (HLL = distinct, KMV = set sizes, CMS = point lookups,
  * q-digest = quantiles): k counters summarize an arbitrarily large
  * keyed stream such that every item with true frequency > N/(k+1) is
  * GUARANTEED to be among the counters, and each counter undercounts
  * by at most N/(k+1).
  *
  * Why not groupBy at 100 TB: map-side partial aggregation bounds the
  * exchange at |distinct keys per partition| — fine for a closed vocab,
  * but a web-scale token/URL/ngram stream has vocabulary ∝ corpus
  * (hapax tail), so partial-agg hash maps spill and the exchange
  * carries billions of singleton keys that a θ-threshold query will
  * immediately discard. MG ships exactly k counters per partition,
  * whatever the vocabulary.
  *
  * Keys are LONGS, deliberately: the callers pre-encode their items
  * (packed ASCII gram codes, hash60s) so the per-row hot path is a
  * primitive LongMap probe — the String-keyed first cut spent its time
  * allocating UTF8String→String conversions per row, 4× the whole
  * query's oracle budget.
  *
  * Determinism contract: the SKETCH CONTENT depends on partition/merge
  * order (like any MG), but the guarantee does not — the candidate set
  * is always a superset of the true ≥ N/(k+1) items. Query faces
  * therefore never expose the sketch directly: they join candidates
  * back for EXACT counts (candidate-sized work) and filter on the true
  * threshold, which is deterministic and hash-gateable.
  *
  * Buffer is an in-place-mutated HashMap[Long, Long] (kryo-encoded
  * between partials; LongMap would be faster still but kryo cannot
  * round-trip its internal arrays) — the hot path is
  * a primitive-keyed probe: reduce() mutates and returns the same map, and the
  * decrement-all branch is amortized O(1) per row — each sweep removes
  * k+1 units of total count, and total count added is N, so at most
  * N/(k+1) sweeps of cost O(k) each.
  */
final case class MgCandidates(items: Seq[Long])

class MisraGriesAggregator(k: Int)
    extends Aggregator[Long, mutable.HashMap[Long, Long], MgCandidates] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: mutable.HashMap[Long, Long] = mutable.HashMap.empty[Long, Long]

  private def sweep(b: mutable.HashMap[Long, Long], dec: Long): Unit = {
    val keys = b.keysIterator.toArray
    var i = 0
    while (i < keys.length) {
      val key = keys(i)
      val v = b(key) - dec
      if (v <= 0) b -= key else b(key) = v
      i += 1
    }
  }

  override def reduce(b: mutable.HashMap[Long, Long],
      key: Long): mutable.HashMap[Long, Long] = {
    val cur = b.getOrElse(key, -1L) // counts are >= 1; -1 = absent
    if (cur >= 0) b(key) = cur + 1
    else if (b.size < k) b(key) = 1L
    else sweep(b, 1L)
    b
  }

  /** Mergeable-summaries rule: add counts, then if over k counters
    * subtract the (k+1)-th largest count from all and drop ≤ 0 — the
    * combined error stays ≤ N_total/(k+1).
    */
  override def merge(a: mutable.HashMap[Long, Long],
      b: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    b.foreach { case (key, c) => a(key) = a.getOrElse(key, 0L) + c }
    if (a.size > k) {
      val kth = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      sweep(a, kth)
    }
    a
  }

  override def finish(b: mutable.HashMap[Long, Long]): MgCandidates =
    MgCandidates(b.keys.toSeq.sorted)

  override def bufferEncoder: Encoder[mutable.HashMap[Long, Long]] =
    Encoders.kryo[mutable.HashMap[Long, Long]]
  override def outputEncoder: Encoder[MgCandidates] =
    Encoders.product[MgCandidates]
}
