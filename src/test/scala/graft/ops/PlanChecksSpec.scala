package graft.ops

import graft.SparkSpec
import graft.queries.{Analytics, Physical}

/** Plan-shape checks for the declarative parity queries: filters must
  * reach the parquet scan (PushedFilters), scans must read only the
  * columns the query uses (ReadSchema), and the partitioned-layout scan
  * must prune at planning time (PartitionFilters). These are the "let
  * Catalyst do its job" guarantees — if a refactor breaks pushdown, the
  * bench gets slower silently; this spec makes it loud.
  */
class PlanChecksSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter queries push their predicates into the parquet scan") {
    val plan = planOf(Analytics.filterEq(spark, sf))
    assert(plan.contains("PushedFilters:") &&
      plan.contains("IsNotNull(o_orderstatus)") &&
      plan.contains("EqualTo(o_orderstatus,F)"), plan)
  }

  test("aggregate scan is pruned to the columns the query touches") {
    val plan = planOf(graft.queries.Reference.q1Agg(spark, sf))
    // lineitem has 16 columns; q1 needs exactly these 4
    val read = "ReadSchema:.*".r.findFirstIn(plan).getOrElse("")
    assert(Seq("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
      .forall(read.contains), read)
    assert(!read.contains("l_comment") && !read.contains("l_shipdate"), read)
  }

  test("date-range filter on the 5-way join reaches the orders scan") {
    val plan = planOf(Analytics.revenueByNation(spark, sf))
    assert(plan.contains("GreaterThanOrEqual(o_orderdate") &&
      plan.contains("LessThan(o_orderdate"), plan)
  }

  test("partitioned layout scan prunes at planning time (PartitionFilters)") {
    val df = Physical.partitionPrunedScan(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("PartitionFilters:") &&
      plan.contains("isnotnull(o_orderstatus"), plan)
    // the pruned scan must not list a PushedFilter on the partition
    // column — pruning happened above the row level entirely
    assert(df.collect().nonEmpty)
  }
}
