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
  * Determinism contract: the SKETCH CONTENT depends on partition/merge
  * order (like any MG), but the guarantee does not — the candidate set
  * is always a superset of the true ≥ N/(k+1) items. Query faces
  * therefore never expose the sketch directly: they join candidates
  * back for EXACT counts (candidate-sized work) and filter on the true
  * threshold, which is deterministic and hash-gateable.
  *
  * Buffer is an in-place-mutated HashMap (kryo-encoded between
  * partials): reduce() mutates and returns the same map, and the
  * decrement-all branch is amortized O(1) per row — each sweep removes
  * k+1 units of total count, and total count added is N, so at most
  * N/(k+1) sweeps of cost O(k) each.
  */
final case class MgCandidates(items: Seq[String])

class MisraGriesAggregator(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], MgCandidates] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def reduce(b: mutable.HashMap[String, Long],
      key: String): mutable.HashMap[String, Long] = {
    b.get(key) match {
      case Some(c) => b.update(key, c + 1)
      case None if b.size < k => b.update(key, 1L)
      case None =>
        b.mapValuesInPlace((_, v) => v - 1)
        b.filterInPlace((_, v) => v > 0)
    }
    b
  }

  /** Mergeable-summaries rule: add counts, then if over k counters
    * subtract the (k+1)-th largest count from all and drop ≤ 0 — the
    * combined error stays ≤ N_total/(k+1).
    */
  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
    if (a.size > k) {
      val kth = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      a.mapValuesInPlace((_, v) => v - kth)
      a.filterInPlace((_, v) => v > 0)
    }
    a
  }

  override def finish(b: mutable.HashMap[String, Long]): MgCandidates =
    MgCandidates(b.keys.toSeq.sorted)

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[MgCandidates] =
    Encoders.product[MgCandidates]
}
