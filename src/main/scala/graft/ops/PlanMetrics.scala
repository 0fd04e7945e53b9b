package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

/** Runtime plan accounting: read the SQL metrics off the FINAL executed
  * plan (after AQE re-planning) so scale claims are checkable as
  * assertions, not prose. "This quality pass is map-only" or "bloom
  * pruning shrinks the shuffle" are properties of the 100 TB run — the
  * specs pin them at test scale by measuring actual shuffled bytes,
  * because a plan that LOOKS exchange-free can still be rewritten by an
  * adaptive rule, and a filter that SHOULD cut shuffle volume can
  * silently stop pushing after a refactor.
  *
  * Usage: execute THIS Dataset's own plan first — `df.collect()` (or
  * `df.queryExecution.executedPlan.execute().count()`); note that
  * `df.count()` builds a SEPARATE grouped-count QueryExecution and
  * leaves this one's metrics untouched — then query it.
  */
object PlanMetrics {

  /** The final physical plan nodes, unwrapping AQE wrappers
    * (AdaptiveSparkPlanExec → its executed plan, query stages → their
    * materialized subplans, reused exchanges → the original).
    */
  def executedNodes(df: DataFrame): Seq[SparkPlan] =
    expand(df.queryExecution.executedPlan)

  private def expand(p: SparkPlan): Seq[SparkPlan] = {
    val below = p match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case q: QueryStageExec => expand(q.plan)
      case r: ReusedExchangeExec => expand(r.child)
      case other => other.children.flatMap(expand)
    }
    // scalar/IN subqueries execute too (e.g. the bloom build in
    // BloomPrune) — their shuffles are part of the query's cost
    p +: (below ++ p.subqueries.flatMap(expand))
  }

  /** Distinct by REFERENCE identity: two independently executed but
    * structurally equal exchanges (same exprIds, reuse declined) must
    * count twice — case-class equality would conflate them, overstating
    * reuse and dropping bytes from the totals.
    */
  private def identityDistinct[T <: AnyRef](xs: Seq[T]): Seq[T] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[T, java.lang.Boolean]())
    xs.filter(seen.add)
  }

  /** Shuffle exchanges that actually executed (reuse unwrapped, so a
    * reused exchange counts once — its bytes were written once).
    */
  def shuffleExchanges(df: DataFrame): Seq[ShuffleExchangeLike] =
    identityDistinct(
      executedNodes(df).collect { case s: ShuffleExchangeLike => s })

  def exchangeCount(df: DataFrame): Int = shuffleExchanges(df).size

  /** Total bytes written to shuffle storage across the query — the
    * number a 100 TB capacity plan is built around.
    */
  def shuffleBytesWritten(df: DataFrame): Long =
    shuffleExchanges(df).map { s =>
      s.metrics.get("shuffleBytesWritten").orElse(s.metrics.get("dataSize"))
        .map(_.value).getOrElse(0L)
    }.sum

  /** Rows that crossed any shuffle boundary (written side). */
  def shuffleRecordsWritten(df: DataFrame): Long =
    shuffleExchanges(df).map(
      _.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)).sum

  /** Files actually opened by file-source scans — partition pruning's
    * runtime truth: a probe-limited query against a partitioned layout
    * must read strictly fewer files than a full scan, and this is the
    * number that proves it (the static PartitionFilters line only shows
    * intent).
    */
  def filesRead(df: DataFrame): Long =
    distinctFileScans(df)
      .map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum

  /** File-source scans that executed as DISTINCT instances — a scan
    * reached through a ReusedExchange is the same object and counts
    * once. Two entries over the same table mean the table was really
    * read twice (read amplification), not that a subtree was shared.
    */
  def distinctFileScans(df: DataFrame): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    identityDistinct(executedNodes(df).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    })

  /** How many exchange CONSUMPTIONS were served by a reused exchange —
    * occurrences beyond the first of the same executed instance. > 0
    * proves a shared subtree was built once and read twice at runtime
    * (Spark's ReuseExchange), not recomputed per consumer.
    */
  def reusedExchangeServings(df: DataFrame): Int = {
    val all = executedNodes(df).collect { case s: ShuffleExchangeLike => s }
    all.size - identityDistinct(all).size
  }
}
