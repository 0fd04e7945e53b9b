package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // hot key: 10k rows on one key, a few on others
  private lazy val skewed = ((1 to 10000).map(i => ("hot", i.toLong)) ++
    Seq(("a", 1L), ("a", 2L), ("b", 5L))).toDF("k", "v")

  test("saltedAggregate equals plain aggregation (count + sum)") {
    val got = Skew.saltedAggregate(skewed, Seq("k"), saltBuckets = 8,
      partials = Map(
        "n" -> (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)),
        "total" -> (sum($"v"), (c: org.apache.spark.sql.Column) => sum(c))))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = skewed.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("total"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("saltedJoin physical shape: join keys carry the salt, build fans out ×buckets") {
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    // the regime salting exists for: a build side too big to broadcast
    saved.foreach { case (k, _) => conf.set(k, "-1") }
    try {
      val dim = Seq(("hot", "H"), ("a", "A")).toDF("k", "label")
      val joined = Skew.saltedJoin(skewed, dim, "k", saltBuckets = 4)
      joined.collect()
      val nodes = PlanMetrics.executedNodes(joined)
      // the shuffle join's equi-keys must include the salt — that IS the
      // skew spread: the hot key hashes to 4 different reducers
      val joinsOnSalt = nodes.exists {
        case j: org.apache.spark.sql.execution.joins.ShuffledJoin =>
          j.leftKeys.map(_.sql).exists(_.contains("__salt"))
        case _ => false
      }
      assert(joinsOnSalt, "no shuffled join keyed on __salt in:\n" +
        nodes.map(_.nodeName).mkString(", "))
      // build side replicated once per salt bucket before the exchange
      val dimRows = 2L
      val buildFanout = PlanMetrics.shuffleExchanges(joined).map(
        _.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L))
      assert(buildFanout.exists(_ == dimRows * 4),
        s"no exchange carried dim×buckets rows: $buildFanout")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("saltedJoin equals plain inner join") {
    val dim = Seq(("hot", "H"), ("a", "A"), ("missing", "M")).toDF("k", "label")
    val got = Skew.saltedJoin(skewed, dim, "k", saltBuckets = 4)
      .groupBy("k", "label").count().orderBy("k")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = skewed.join(dim, Seq("k"))
      .groupBy("k", "label").count().orderBy("k")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }
}
