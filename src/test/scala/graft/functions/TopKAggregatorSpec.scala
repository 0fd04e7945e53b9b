package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("per-group top-k: score desc, id tiebreak, groups smaller than k") {
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.7), ("a", 3L, 0.95), ("a", 4L, 0.7),
      ("b", 5L, 0.1)).toDF("g", "id", "score")
    val topk = udaf(new TopKAggregator(3), Encoders.product[ScoredId])
    val got = df.groupBy($"g").agg(topk($"id", $"score").as("top"))
      .select($"g", posexplode($"top.items"))
      .select($"g", $"pos", $"col.id", $"col.score")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set(
      ("a", 0, 3L, 0.95), ("a", 1, 1L, 0.9), ("a", 2, 2L, 0.7), // id 2 < 4 on tie
      ("b", 0, 5L, 0.1)))
  }

  test("merge is associative and capped: many partitions agree with single partition") {
    val rows = (1L to 500L).map(i => ("g", i, (i % 97).toDouble / 97))
    val topk = udaf(new TopKAggregator(5), Encoders.product[ScoredId])
    def run(parts: Int) =
      rows.toDF("g", "id", "score").repartition(parts)
        .groupBy($"g").agg(topk($"id", $"score").as("top"))
        .select(explode($"top.items")).select($"col.id")
        .collect().map(_.getLong(0)).toSeq
    assert(run(1) == run(13))
  }
}
