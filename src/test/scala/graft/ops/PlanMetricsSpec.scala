package graft.ops

import graft.{SparkSpec, Tables}
import graft.queries.LlmOps
import org.apache.spark.sql.functions._

/** Runtime-verified scale claims: the docs say certain passes are
  * map-only and that bloom pruning shrinks the shuffle — these tests
  * measure the actually-shuffled bytes/rows off the executed plans, so
  * a refactor that silently adds an exchange or un-pushes a filter
  * fails CI instead of surviving as stale prose.
  */
class PlanMetricsSpec extends SparkSpec {

  test("repetition quality pass shuffles NOTHING at runtime") {
    val df = LlmOps.textRepetition(spark, sf)
    df.collect()
    assert(PlanMetrics.exchangeCount(df) === 0)
    assert(PlanMetrics.shuffleBytesWritten(df) === 0L)
  }

  test("hash sampling is map-only at runtime") {
    val df = Sampling.hashSample(
      Tables.load(spark, sf, "documents"), col("doc_id"), pct = 25)
    df.collect()
    assert(PlanMetrics.exchangeCount(df) === 0)
  }

  test("partial aggregation collapses rows before the exchange") {
    val li = Tables.load(spark, sf, "lineitem")
    val total = li.count()
    val agg = li.groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
    agg.collect()
    assert(PlanMetrics.exchangeCount(agg) === 1)
    val crossed = PlanMetrics.shuffleRecordsWritten(agg)
    // 3 flags × ≤4 tasks of partials, vs thousands of input rows
    assert(crossed > 0 && crossed < total / 10,
      s"partial agg ineffective: $crossed of $total rows crossed the shuffle")
  }

  test("ngram-jaccard builds its inverted index ONCE (exchange reuse)") {
    // both the per-doc counts and the pair enumeration branch from the
    // same posting-list subtree; the h-keyed shuffle must be served by
    // ReuseExchange at runtime, not recomputed per consumer
    val df = LlmOps.ngramJaccard(spark, sf)
    df.collect()
    assert(PlanMetrics.reusedExchangeServings(df) > 0)
    // the static plan prints the shingle→postings subtree once per
    // consumer (3×) — pin that at RUNTIME exactly one documents scan
    // executed (identity-distinct: scans under ReusedExchange are the
    // same instance), i.e. no 3× read amplification at 100 TB
    val docScans = PlanMetrics.distinctFileScans(df)
      .filter(_.metadata.get("Location").exists(_.contains("documents")))
    assert(docScans.size === 1,
      s"documents scanned ${docScans.size}× at runtime — index subtree recomputed")
  }

  test("IVF probe limit prunes index files at RUNTIME, not just in the plan") {
    import spark.implicits._
    val centroids = Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0), 2 -> Seq(-1.0, 0.0))
    val corpus = Seq((10L, Seq(0.9, 0.1)), (11L, Seq(0.1, 0.9)),
      (12L, Seq(-0.9, 0.05))).toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("ivfidx_rt").toString + "/idx"
    Similarity.ivfWriteIndex(
      Similarity.ivfAssign(corpus, col("vec_id"), col("embedding"), centroids), path)
    def files(nProbe: Int): Long = {
      val hits = Similarity.ivfSearchIndexed(spark, path, centroids,
        queryVec = Seq(0.9, 0.1), k = 1, nProbe = nProbe)
      hits.collect()
      PlanMetrics.filesRead(hits)
    }
    val pruned = files(1)
    val full = files(3)
    assert(pruned > 0 && full > pruned,
      s"probe limit did not prune at runtime: $pruned vs $full files")
  }

  test("bloom pruning shrinks the semi-join shuffle volume") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    // force the shuffle-join regime the bloom exists for (a dim too big
    // to broadcast); restored below
    saved.foreach { case (k, _) => conf.set(k, "-1") }
    try {
      val li = Tables.load(spark, sf, "lineitem")
      val urgent = Tables.load(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val plain = li.join(
        urgent.select(col("o_orderkey").as("__k")).distinct(),
        col("l_orderkey") === col("__k"), "left_semi")
      val pruned = BloomPrune.semiJoinBloom(li, col("l_orderkey"),
        urgent, col("o_orderkey"), expectedKeys = 10000)
      assert(plain.collect().length === pruned.collect().length) // same result...
      val plainBytes = PlanMetrics.shuffleBytesWritten(plain)
      val prunedBytes = PlanMetrics.shuffleBytesWritten(pruned)
      assert(plainBytes > 0)
      // ...but the pruned variant ships strictly less into the shuffle
      assert(prunedBytes < plainBytes,
        s"bloom did not shrink the shuffle: $prunedBytes >= $plainBytes")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
