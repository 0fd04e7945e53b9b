package graft.ops

import graft.SparkSpec
import graft.queries.Analytics

/** Plan-shape assertions for the 5-way join (q_join_5way): the
  * genuinely constant-size dims (region, nation) are explicitly
  * broadcast, while the sf-scaling tables (customer, supplier) carry NO
  * user hint — at 100× scale AQE must be free to pick a shuffle join for
  * them instead of being forced into a multi-GB broadcast build.
  */
class JoinPlanSpec extends SparkSpec {

  test("5-way join: only constant-size dims are hint-broadcast; " +
      "sf-scaling tables fall back to shuffle when too big to broadcast") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // Simulate "customer/supplier too big to broadcast": with
    // auto-broadcast off, ONLY user-hinted sides may still broadcast.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Analytics.revenueByNation(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      val nBroadcast = "BroadcastHashJoin|BroadcastNestedLoopJoin".r
        .findAllIn(plan).size
      // exactly the two pinned dims (nation, region) broadcast; the
      // fact-fact join and the un-hinted customer/supplier joins shuffle
      assert(nBroadcast == 2, s"expected 2 hinted broadcasts, got $nBroadcast:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected shuffle joins for un-hinted sides:\n$plan")
      val shuffleRows = df.collect().map(r => (r.getString(0), r.getDouble(1))).toMap

      // and with broadcasting allowed again (the bench-scale plan), the
      // result is identical
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      val autoRows = Analytics.revenueByNation(spark, sf)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(shuffleRows == autoRows)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("5-way join analyzed plan carries no user hint on customer/supplier") {
    val analyzed = Analytics.revenueByNation(spark, sf)
      .queryExecution.analyzed.toString
    // two ResolvedHints total — nation and region — and neither hint
    // subtree scans an sf-scaling table
    val hints = "(?s)ResolvedHint.*?Relation".r.findAllIn(analyzed).toList
    assert(hints.size == 2, s"expected 2 hints, got ${hints.size}:\n$analyzed")
    hints.foreach { h =>
      assert(!h.contains("customer") && !h.contains("supplier") &&
        !h.contains("orders") && !h.contains("lineitem"),
        s"user hint pinned on an sf-scaling table:\n$h")
    }
  }
}
