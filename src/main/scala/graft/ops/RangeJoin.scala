package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: match point rows to interval rows with
  * `start <= point <= end` within a key — the other time-series join
  * Spark has no built-in for (DuckDB/kdb range joins, Flink interval
  * join).
  *
  * A naive non-equi join is a per-key cross product (BroadcastNestedLoop
  * when one side is small, quadratic otherwise). The scale formulation
  * here BINS time: each interval is exploded into the fixed-width bins
  * it covers, points compute their single bin, and the join becomes an
  * EQUI-join on (key, bin) plus a residual `BETWEEN` filter. Properties
  * at 100 TB:
  *
  *  - one hash-partitioned shuffle on (key, bin) — both sides can be
  *    arbitrarily large, no broadcast required;
  *  - interval replication is bounded by duration/binWidth (pick
  *    binWidth near the typical interval length: ~1-2 bins per
  *    interval);
  *  - the residual filter removes same-bin non-matches exactly, so the
  *    bin width affects COST only, never correctness.
  */
object RangeJoin {

  /** `points` joined to `intervals` on `key` with
    * `startCol <= pointTs <= endCol` (inclusive both ends). Timestamp
    * columns; `binSeconds` is the bin width. Column sets must be
    * disjoint apart from `key`.
    *
    * Robustness: `explode(sequence(...))` has NO inherent bound — one
    * corrupt interval (end in year 9999 at binSeconds=3600 is a ~70M
    * element sequence) would throw and kill the whole job. Dirty data
    * must never kill a 100 TB scan, so intervals are gated first:
    * inverted (`start > end`) or over-long (more than `maxSpanBins`
    * bins ≈ maxSpanBins×binSeconds of duration) intervals are DROPPED
    * from the join. Audit the drops with [[pathologicalIntervals]] on
    * the same arguments; a clamp is deliberately not offered because a
    * silently truncated interval returns wrong matches, while a dropped
    * one is visible in the audit.
    *
    * Sizing `maxSpanBins`: the default (2^20) assumes `binSeconds` is
    * chosen near the typical interval length (the documented cost
    * model — ~1-2 bins per interval). An interval spanning a MILLION
    * bins is then either corrupt or evidence of a mis-sized bin: it
    * would replicate into 10^6 join rows by itself. Callers whose
    * legitimate spans are genuinely that wide must raise `maxSpanBins`
    * explicitly (and accept the replication) or re-bin.
    */
  def binnedIntervalJoin(points: DataFrame, intervals: DataFrame,
      key: String, pointTs: String, startCol: String, endCol: String,
      binSeconds: Long, maxSpanBins: Long = 1 << 20): DataFrame = {
    val p = points.withColumn("__bin",
      floor(col(pointTs).cast("long") / binSeconds))
    val i = intervals
      .filter(sane(startCol, endCol, binSeconds, maxSpanBins))
      .withColumn("__bin",
        explode(sequence(floor(col(startCol).cast("long") / binSeconds),
          floor(col(endCol).cast("long") / binSeconds))))
    p.join(i, Seq(key, "__bin"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__bin")
  }

  /** The intervals [[binnedIntervalJoin]] would drop: inverted or wider
    * than `maxSpanBins` bins. Run on the same arguments to count/flag
    * dirty rows (cheap: a narrow map-only scan of the intervals side).
    */
  def pathologicalIntervals(intervals: DataFrame, startCol: String,
      endCol: String, binSeconds: Long,
      maxSpanBins: Long = 1 << 20): DataFrame =
    intervals.filter(!sane(startCol, endCol, binSeconds, maxSpanBins))

  /** Null-safe guard: NULL bounds are pathological too (`explode` of a
    * NULL sequence would silently drop them anyway; routing them through
    * the audit face makes that visible).
    */
  private def sane(startCol: String, endCol: String, binSeconds: Long,
      maxSpanBins: Long) = {
    val s = col(startCol).cast("long")
    val e = col(endCol).cast("long")
    s.isNotNull && e.isNotNull && s <= e &&
      (floor(e / binSeconds) - floor(s / binSeconds)) <= maxSpanBins
  }
}
