package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Global plan-safety net over the ENTIRE query surface: every
  * registered query is executed at sf0.001 and its post-AQE executed
  * plan is checked for the one join shape that is never acceptable at
  * corpus scale — a Cartesian product. Broadcast nested-loop joins are
  * allowed only for the deliberate 1-row scalar broadcasts (totals,
  * corpus stats) the queries use; a BNLJ whose broadcast side emits
  * more than a handful of rows is a quadratic blow-up hiding behind a
  * small bench input, and fails here before it fails at 100 TB.
  */
class AllPlansSpec extends SparkSpec {

  test("no registered query executes a cartesian product; BNLJ sides stay scalar-sized") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        df.collect()
        val nodes = graft.ops.PlanMetrics.executedNodes(df)
        if (nodes.exists(_.isInstanceOf[CartesianProductExec]))
          failures += s"$name: CartesianProductExec in executed plan"
        nodes.collect { case b: BroadcastNestedLoopJoinExec => b }.foreach { b =>
          // the broadcast side of an intentional scalar cross join is a
          // 1-row aggregate; read its actual emitted rows
          val build = b.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
            case _ => b.right
          }
          val buildRows = build.metrics.get("numOutputRows")
            .map(_.value).getOrElse(-1L)
          if (buildRows > 100)
            failures += s"$name: BNLJ broadcast side emitted $buildRows rows"
        }
      } catch {
        case e: Throwable => failures += s"$name: failed to run (${e.getMessage})"
      } finally {
        graft.ops.CacheBin.releaseAll()
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
