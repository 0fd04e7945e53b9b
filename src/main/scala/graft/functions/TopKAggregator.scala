package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k aggregator (SURVEY.md §2.14 / §7.3 — the first
  * extension op where a custom Aggregator earns its keep).
  *
  * Buffer is the current top-k only — O(k) state per group regardless of
  * group size, merged associatively, so Spark runs it as partial
  * (map-side) + final aggregation: each partition ships at most k rows
  * per group through the shuffle instead of the whole group. That is the
  * 100 TB difference vs the window-function formulation (row_number
  * partitions sort ALL rows per group through the exchange) — use this
  * when only the top-k survive, the window when ranks for every row are
  * needed.
  *
  * Ordering: score DESC, then id ASC (deterministic tiebreak).
  */
final case class ScoredId(id: Long, score: Double)
final case class TopKBuf(items: List[ScoredId])

class TopKAggregator(k: Int) extends Aggregator[ScoredId, TopKBuf, TopKBuf] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def capMerge(xs: List[ScoredId], ys: List[ScoredId]): List[ScoredId] = {
    // both inputs sorted by `better`; classic sorted merge, capped at k
    val out = List.newBuilder[ScoredId]
    var (l, r, n) = (xs, ys, 0)
    while (n < k && (l.nonEmpty || r.nonEmpty)) {
      if (r.isEmpty || (l.nonEmpty && better(l.head, r.head))) {
        out += l.head; l = l.tail
      } else {
        out += r.head; r = r.tail
      }
      n += 1
    }
    out.result()
  }

  override def zero: TopKBuf = TopKBuf(Nil)
  override def reduce(b: TopKBuf, a: ScoredId): TopKBuf =
    TopKBuf(capMerge(b.items, a :: Nil))
  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    TopKBuf(capMerge(b1.items, b2.items))
  override def finish(b: TopKBuf): TopKBuf = b
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
