package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxDistinctRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val flag = "spark.graft.approxDistinct.enabled"

  private def withFlag[T](on: Boolean)(body: => T): T = {
    val prev = spark.conf.getOption(flag)
    spark.conf.set(flag, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(flag, v)
      case None => spark.conf.unset(flag)
    }
  }

  private lazy val df = (1 to 10000).map(i => (i % 7, i % 500)).toDF("g", "x")

  test("off by default: count(DISTINCT x) stays exact") {
    val q = df.groupBy($"g").agg(countDistinct($"x").as("d"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("hyperloglog"),
      q.queryExecution.optimizedPlan.toString)
    assert(q.collect().map(_.getLong(1)).toSet == Set(500L))
  }

  test("flag on: rewrites to HLL++, value within published error") {
    withFlag(true) {
      val q = df.groupBy($"g").agg(countDistinct($"x").as("d"))
      val opt = q.queryExecution.optimizedPlan.toString.toLowerCase
      assert(opt.contains("approx_count_distinct") || opt.contains("hyperloglog"), opt)
      // single aggregate pass: no Expand in the physical plan
      assert(!q.queryExecution.executedPlan.toString.contains("Expand"))
      q.collect().foreach { r =>
        assert(math.abs(r.getLong(1) - 500L) <= 500 * 0.15, r.toString)
      }
    }
  }

  test("flag on: reaches spark.sql text, multi-arg distinct stays exact") {
    withFlag(true) {
      df.createOrReplaceTempView("approx_t")
      val one = spark.sql("SELECT count(DISTINCT x) AS d FROM approx_t")
      assert(one.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("approx_count_distinct"))
      val multi = spark.sql("SELECT count(DISTINCT g, x) AS d FROM approx_t")
      assert(!multi.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("approx_count_distinct"))
      assert(multi.collect().head.getLong(0) == 3500L) // exact
    }
  }
}
