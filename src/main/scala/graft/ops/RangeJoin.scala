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
    */
  def binnedIntervalJoin(points: DataFrame, intervals: DataFrame,
      key: String, pointTs: String, startCol: String, endCol: String,
      binSeconds: Long): DataFrame = {
    val p = points.withColumn("__bin",
      floor(col(pointTs).cast("long") / binSeconds))
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(col(startCol).cast("long") / binSeconds),
        floor(col(endCol).cast("long") / binSeconds))))
    p.join(i, Seq(key, "__bin"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__bin")
  }
}
