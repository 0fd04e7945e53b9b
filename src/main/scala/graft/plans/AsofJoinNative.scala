package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, GenericInternalRow, JoinedRow, NamedExpression, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col

/** Native as-of join — the whole-operator tier of the custom-Catalyst
  * ladder (SURVEY.md §7.3c): a custom `LogicalPlan` node, a planner
  * `SparkStrategy`, and a physical `SparkPlan` registered through
  * `graft.GraftExtensions`. Same semantics as the compositional
  * `graft.ops.AsofJoin.asofLeft` (DuckDB `ASOF LEFT JOIN`: for each left
  * row, the right row with the greatest `rts <= lts` within the key;
  * `AsofJoinNativeSpec` pins the two implementations to each other and
  * the driver oracle-checks against DuckDB's native operator).
  *
  * Why a physical operator when the union+window formulation already
  * works: the window plan must interleave BOTH sides into one sorted run
  * (shuffle carries left rows + right rows through the same exchange,
  * then one wide sort over the union). The native exec instead declares
  *
  *  - `requiredChildDistribution` = clustered on the key, per side —
  *    EnsureRequirements co-partitions the two children (and AQE
  *    coalesces their shuffles consistently, exactly as for a
  *    sort-merge join);
  *  - `requiredChildOrdering` = (key, ts) per side — Catalyst plans one
  *    sort per child, each over only its own columns;
  *
  * and then streams the two sorted runs through a per-partition merge
  * with O(1) state (the last at-or-before right row per key). At 100 TB
  * this halves the sorted width vs the union plan (each side sorts its
  * own schema, not the padded union schema) and keeps the right side's
  * columns out of the left side's shuffle records entirely. Skewed keys
  * split across time epochs remain the documented mitigation, same as
  * the compositional form.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    rightValues: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] to [[AsofJoinExec]]. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` in GraftExtensions.
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lts, rts, vals) =>
      AsofJoinExec(lk, rk, lts, rts, vals, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned sorted-merge as-of join. Both children arrive hash
  * partitioned on the key and sorted by (key, ts); each partition pair
  * is merged in one pass carrying only the latest at-or-before right
  * row — no buffering of key groups, no row ever compared twice.
  */
case class AsofJoinExec(
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    rightValues: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // Left rows pass through in order; the merge only appends columns.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyA = leftKey; val rKeyA = rightKey
    val lTsA = leftTs; val rTsA = rightTs
    val vals = rightValues
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lKeyA.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTsA.dataType))
      val lKeyProj = UnsafeProjection.create(Seq(lKeyA), lOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsA), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyA), rOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsA), rOut)
      val rValsProj = UnsafeProjection.create(vals, rOut)
      // Bind value columns as nullable: an unmatched left row feeds a
      // null row through them even when the right schema is not-null.
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ vals.map(_.withNullability(true)))
      val nullVals = new GenericInternalRow(vals.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // The only cross-row state: the latest right row with
      // rts <= (current left ts) for the key currently being merged.
      var savedKey: InternalRow = null
      var savedVals: InternalRow = null
      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        // SQL ON-equality: a NULL key matches nothing (DuckDB ASOF LEFT
        // JOIN semantics, and the oracle's). Null keys sort first, so
        // null-key left rows precede every non-null key and emitting
        // unmatched without consuming right rows keeps the merge aligned.
        if (lKey.isNullAt(0)) {
          numOutputRows += 1
          outProj(joined(lRow, nullVals))
        } else {
          val lTs = lTsProj(lRow)
          var scan = true
          while (scan && rBuf.hasNext) {
            val rRow = rBuf.head
            val rKey = rKeyProj(rRow)
            // skip null-key right rows too: they can never match
            val c = if (rKey.isNullAt(0)) -1 else keyOrd.compare(rKey, lKey)
            if (c < 0) rBuf.next() // right side is on an earlier key: skip
            else if (c == 0 && tsOrd.compare(rTsProj(rRow), lTs) <= 0) {
              savedKey = lKey.copy()
              savedVals = rValsProj(rBuf.next()).copy()
            } else scan = false // right side is ahead: stop for this left row
          }
          val matched = savedKey != null && keyOrd.compare(savedKey, lKey) == 0
          numOutputRows += 1
          outProj(joined(lRow, if (matched) savedVals else nullVals))
        }
      }
    }
  }
}

/** DataFrame-level builder for the native as-of join. */
object AsofJoinNative {

  /** Left as-of join via [[AsofJoinExec]]: `left` keeps all its columns
    * and gains `valueCols` from `right` (null when no right row is
    * at-or-before). Same contract as `AsofJoin.asofLeft`: `right` unique
    * per (key, ts); column sets disjoint apart from `key`/`ts`.
    */
  def asofLeft(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "asofLeft needs at least one right value column")
    val spark = left.sparkSession
    val lPlan = left.queryExecution.analyzed
    // Fresh exprIds on the right side so a self-join never aliases
    // attributes across the two subtrees.
    val rAnalyzed = right.select((key +: ts +: valueCols).map(col): _*)
      .queryExecution.analyzed
    val rPlan = Project(
      rAnalyzed.output.map(a => Alias(a, a.name)()): Seq[NamedExpression],
      rAnalyzed)
    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val lk = attr(lPlan.output, key); val rk = attr(rPlan.output, key)
    val lt = attr(lPlan.output, ts); val rt = attr(rPlan.output, ts)
    require(lk.dataType == rk.dataType && lt.dataType == rt.dataType,
      s"key/ts types must match: $key ${lk.dataType}/${rk.dataType}, " +
        s"$ts ${lt.dataType}/${rt.dataType}")
    val plan = AsofJoinPlan(lPlan, rPlan, lk, rk, lt, rt,
      valueCols.map(attr(rPlan.output, _)))
    PlanBridge.ofRows(spark, plan)
  }
}
