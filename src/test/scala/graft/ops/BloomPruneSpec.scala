package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lineitem = Tables.load(spark, sf, "lineitem")
  private lazy val urgent = Tables.load(spark, sf, "orders")
    .filter($"o_orderpriority" === "1-URGENT")

  test("semiJoinBloom is exactly a left-semi join") {
    val got = BloomPrune.semiJoinBloom(lineitem, $"l_orderkey",
        urgent, $"o_orderkey", expectedKeys = 10000)
      .select("l_orderkey", "l_linenumber")
      .collect().map(_.toSeq).toSet
    val want = lineitem.join(urgent,
        lineitem("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("pruneByBloom keeps all true matches (no false negatives)") {
    val pruned = BloomPrune.pruneByBloom(lineitem, $"l_orderkey",
        urgent, $"o_orderkey", 10000)
      .select("l_orderkey").as[Long].collect().toSet
    val trueKeys = urgent.select("o_orderkey").as[Long].collect().toSet
    val factTrue = lineitem.select("l_orderkey").as[Long].collect().toSet
      .intersect(trueKeys)
    assert(factTrue.subsetOf(pruned))
  }

  test("decontaminateBloom ≡ broadcast decontamination; bloom is in the plan") {
    val q = graft.queries.LlmOps.decontaminateBloom(spark, sf)
    assert(q.queryExecution.executedPlan.toString.contains("might_contain"))
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = graft.queries.LlmOps.decontaminate(spark, sf,
        n = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want && got.nonEmpty)
  }

  test("bloom test runs in the plan before the semi join's exchange") {
    val q = BloomPrune.semiJoinBloom(lineitem, $"l_orderkey",
      urgent, $"o_orderkey", expectedKeys = 10000)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    // the might_contain filter must sit below (printed after) the final
    // semi join, i.e. on the fact scan side of its exchange/broadcast
    val joinIdx = plan.indexOf("LeftSemi")
    val bloomIdx = plan.indexOf("might_contain")
    assert(joinIdx >= 0 && bloomIdx > joinIdx, plan)
  }
}
