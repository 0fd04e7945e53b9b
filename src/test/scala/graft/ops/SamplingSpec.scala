package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (0L until 2000L).toDF("id")

  test("hashSample is deterministic and close to the target fraction") {
    val a = Sampling.hashSample(ids, $"id", pct = 10).collect().map(_.getLong(0)).sorted
    val b = Sampling.hashSample(ids, $"id", pct = 10).collect().map(_.getLong(0)).sorted
    assert(a.toSeq == b.toSeq, "same data, same sample")
    // md5 buckets are near-uniform: 10% of 2000 within a loose band
    assert(a.length > 120 && a.length < 280, s"got ${a.length} of 2000")
  }

  test("sample membership is consistent across tables (sample-then-join == join-then-sample)") {
    val other = ids.withColumn("payload", $"id" * 2)
    val sampledJoin = Sampling.hashSample(ids, $"id", 10)
      .join(Sampling.hashSample(other, $"id", 10), "id")
    val joinSampled = Sampling.hashSample(ids.join(other, "id"), $"id", 10)
    assert(sampledJoin.count() == joinSampled.count())
    assert(sampledJoin.join(joinSampled, Seq("id"), "left_anti").isEmpty)
  }

  test("assignSplit partitions exhaustively with nested fractions") {
    val split = Sampling.assignSplit(ids, $"id", trainPct = 80, valPct = 10)
    assert(split.count() == 2000) // total preserved
    val byName = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet == Set("train", "val", "test"))
    assert(byName("train") > byName("val") && byName("train") > byName("test"))
    // a sample at trainPct is EXACTLY the train split (nested membership)
    val train = Sampling.hashSample(ids, $"id", 80)
    assert(train.count() == byName("train"))
  }

  test("stratifiedHashSample applies per-stratum fractions (default 0 drops)") {
    val strat = ids.withColumn("s", when($"id" % 2 === 0, "even").otherwise("odd"))
    val got = Sampling.stratifiedHashSample(strat, $"id", $"s",
      Map("even" -> 100), defaultPct = 0)
    assert(got.filter($"s" === "odd").isEmpty)
    assert(got.filter($"s" === "even").count() == 1000)
  }

  test("temperatureSample keeps the smallest group whole, flattens a 16x one") {
    // groups: "small" ids 0..99 (100 rows), "big" ids 100..1699 (1600 rows)
    val grouped = ids.filter($"id" < 1700)
      .withColumn("g", when($"id" < 100, "small").otherwise("big"))
    val got = Sampling.temperatureSample(grouped, $"id", $"g")
    val byG = got.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG("small") == 100L) // rate min(1, sqrt(100/100)) = 1
    // big: rate sqrt(100/1600) = 1/4 → expect ~400; hash40 binomial
    // spread over 1600 draws stays well inside ±100
    assert(byG("big") > 300L && byG("big") < 500L, s"big kept ${byG("big")}")
    // deterministic: same selection on re-evaluation
    assert(Sampling.temperatureSample(grouped, $"id", $"g")
      .join(got, Seq("id"), "left_anti").isEmpty)
  }

  test("streaming bottom-k sample: versions replay the min-k fold; final == global bottom-k") {
    import graft.functions.GraftStrings
    val rows = graft.queries.Curation.sampleStreamMaterialize(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byV = rows.groupBy(_._1)
    assert(byV.keySet === Set(0L, 1L), "exactly two sample versions")
    // driver-side replay of the priority order
    val docIds = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id").cast("long")).collect().map(_.getLong(0))
    def bottomK(pool: Seq[Long], k: Int): Seq[(Long, Long)] =
      pool.map(id => (GraftStrings.hash60(id.toString), id))
        .sortBy(identity).take(k)
    val v0 = byV(0L).sortBy(_._2).map(r => (r._4, r._3)).toSeq
    val v1 = byV(1L).sortBy(_._2).map(r => (r._4, r._3)).toSeq
    assert(v0 === bottomK(docIds.filter(_ % 2 == 0).toSeq, 32),
      "version 0 is not the even half's bottom-32")
    assert(v1 === bottomK(docIds.toSeq, 32),
      "version 1 is not the global bottom-32")
    // the fold property the bounded state rests on:
    // bottom-k(bottom-k(even) ++ odd) == bottom-k(all)
    assert(bottomK(v0.map(_._2) ++ docIds.filter(_ % 2 != 0).toSeq, 32)
      === bottomK(docIds.toSeq, 32))
    // ranks are dense 1..k in priority order
    Seq(0L, 1L).foreach { v =>
      assert(byV(v).sortBy(_._2).map(_._2).toSeq === (1L to 32L))
    }
  }
}
