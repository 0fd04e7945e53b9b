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
