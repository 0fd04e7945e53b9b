package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed equi-join runs with ZERO exchanges (co-located)") {
    val wh = java.nio.file.Files.createTempDirectory("bucketwh").toString
    val orders = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_orderpriority")
    val lineitem = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(spark, orders, "b_orders", "o_orderkey", 8,
      s"$wh/b_orders")
    Bucketing.writeBucketed(spark, lineitem, "b_lineitem", "l_orderkey", 8,
      s"$wh/b_lineitem")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey", "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must need no shuffle: the only Exchange allowed
      // is the one feeding the final aggregation
      val joinPart = plan.split("HashAggregate").last // below the aggs
      assert(!joinPart.contains("Exchange"), s"join side shuffled:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // and it is correct
      val viaBuckets = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(viaBuckets == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("approx_count_distinct tracks exact distinct within rsd (dedup diagnostics)") {
    val docs = Tables.load(spark, sf, "documents")
    val row = docs.agg(
      countDistinct(sha2(col("text"), 256)).as("exact"),
      approx_count_distinct(sha2(col("text"), 256), 0.05).as("approx"))
      .collect()(0)
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }
}
