package graft.ops

import graft.SparkSpec
import graft.queries.Maintenance
import org.apache.spark.sql.functions._

/** Count-distinct IVM: maintain ≡ recompute, both flip directions live
  * (first arrivals and last departures), and the support-table probe
  * stays un-shuffled (broadcast-pruned map-side).
  */
class IvmDistinctSpec extends SparkSpec {

  test("maintain ≡ independent Spark recompute from the mutated base") {
    val base = graft.Tables.load(spark, sf, "orders").select(
      year(col("o_orderdate")).cast("long").as("annee"),
      col("o_orderstatus").as("dep"), col("o_custkey").as("c"),
      col("o_orderkey").as("k"))
    val expected = base.filter(col("k") % 10 =!= 3 && col("dep") =!= "P")
      .select(col("annee"), col("c"))
      .unionByName(base.filter(col("k") % 10 === 7)
        .select(col("annee"), (col("c") + 10000000L).as("c")))
      .groupBy(col("annee"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("c")).as("n_distinct_cust"))
      .orderBy(col("annee"))
      .collect().map(_.toString).toSeq
    val got = Maintenance.ivmDistinct(spark, sf).collect().map(_.toString).toSeq
    assert(got === expected)
  }

  test("both flip directions live: first arrivals AND last departures move the count") {
    val delta = Maintenance.ivmDistinctChangeRows(spark, sf)
      .groupBy(col("annee"), col("cust")).agg(sum(col("d")).as("d"))
      .filter(col("d") =!= 0L)
    val support = graft.Tables.load(spark, sf, "orders").select(
        year(col("o_orderdate")).cast("long").as("annee"),
        col("o_custkey").as("cust"))
      .groupBy(col("annee"), col("cust")).agg(count(lit(1)).as("cnt"))
    val touched = delta.join(support, Seq("annee", "cust"), "left")
      .select(coalesce(col("cnt"), lit(0L)).as("old_cnt"),
        (coalesce(col("cnt"), lit(0L)) + col("d")).as("new_cnt"))
    val gained = touched.filter(col("old_cnt") === 0L && col("new_cnt") > 0L).count()
    val lost = touched.filter(col("old_cnt") > 0L && col("new_cnt") <= 0L).count()
    assert(gained > 0, "no first arrival — the gained flip is dead on this corpus")
    assert(lost > 0, "no last departure — the lost flip is dead on this corpus")
  }

  test("plan: the support table is broadcast-pruned, never shuffled") {
    val plan = Maintenance.ivmDistinct(spark, sf)
      .queryExecution.executedPlan.toString
    // the semi prune and the touched-key lookup — every join keyed on
    // the SUPPORT key (annee, cust) — must be broadcast joins; a
    // sort-merge join on that key would mean the corpus-cardinality
    // support table got shuffled. (The final |groups|-sized full-outer
    // MV merge may legitimately sort-merge — it is 7 rows a side.)
    val smjOnSupportKey = plan.linesIterator
      .filter(_.contains("SortMergeJoin")).filter(_.contains("cust"))
    assert(smjOnSupportKey.isEmpty, plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
