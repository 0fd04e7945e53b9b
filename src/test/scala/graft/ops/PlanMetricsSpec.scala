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

  test("winnow pairs: one scan, two exchanges, no joins — the gram stream never shuffles") {
    val df = LlmOps.winnowPairs(spark, sf)
    df.collect()
    // the kernel keeps tokenize→gram→hash→window-min→dedup map-side, so
    // the fp-keyed postings exchange carries the ~2/(w+1)-density
    // fingerprint stream (never the gram stream the rejected window
    // formulation shuffled) and the pair exchange carries candidate
    // pairs; a third exchange, a join, or a second documents scan means
    // the fp self-join (two kernel passes + broadcast materialization)
    // has crept back
    assert(PlanMetrics.exchangeCount(df) === 2,
      s"expected fp + pair exchanges only, got ${PlanMetrics.exchangeCount(df)}")
    val docScans = PlanMetrics.distinctFileScans(df)
      .filter(_.metadata.get("Location").exists(_.contains("documents")))
    assert(docScans.size === 1,
      s"documents scanned ${docScans.size}× at runtime")
    val joins = PlanMetrics.executedNodes(df).count(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
    assert(joins === 0, s"$joins joins appeared — fp self-join crept back")
    val grams = Tables.load(spark, sf, "documents")
      .select(explode(graft.functions.GraftFunctions
        .tokenGramHashes(col("text"), 5)).as("h")).count()
    val crossed = PlanMetrics.shuffleRecordsWritten(df)
    assert(crossed < grams,
      s"exchanges carried $crossed rows vs $grams grams — gram stream shuffled")
    graft.ops.CacheBin.releaseAll()
  }

  test("hard negatives: scored postings never shuffle — both exchanges carry partials") {
    val df = LlmOps.hardNegatives(spark, sf)
    df.collect()
    // exchange 1: the 1-row stats aggregate (m+2 longs per partition);
    // exchange 2: partial top-k states (≤ partitions·|queries|·n rows).
    // A third exchange means the posting join / (query,doc) score agg
    // shape crept back — the rewrite's whole point is that per-doc
    // scores are row-local over the term_freqs statistic
    assert(PlanMetrics.exchangeCount(df) === 2,
      s"expected stats + top-k exchanges only, got ${PlanMetrics.exchangeCount(df)}")
    val nDocs = Tables.load(spark, sf, "documents").count()
    val crossed = PlanMetrics.shuffleRecordsWritten(df)
    assert(crossed < nDocs,
      s"exchanges carried $crossed rows vs $nDocs docs — postings shuffled")
    graft.ops.CacheBin.releaseAll()
  }

  test("retrieval MRR: postings never shuffle — the bm25 family shape holds") {
    val df = LlmOps.retrievalMrr(spark, sf)
    df.collect()
    // exchange 1: the 1-row stats aggregate; exchange 2: partial top-k
    // states; exchange 3: the 3-row final sort. The rank arithmetic
    // reuses the top-k exchange's partitioning (no 4th exchange), and
    // no corpus-sized row set ever crosses a shuffle
    assert(PlanMetrics.exchangeCount(df) <= 3,
      s"expected stats + top-k + sort only, got ${PlanMetrics.exchangeCount(df)}")
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(PlanMetrics.shuffleRecordsWritten(df) < nDocs,
      "exchanges carried more rows than the corpus — postings shuffled")
    graft.ops.CacheBin.releaseAll()
  }

  test("bm25 top-k: only the 1-row stats aggregate shuffles; top-k never exchanges") {
    val df = LlmOps.bm25TopK(spark, sf)
    df.collect()
    // the sole exchange carries m+2-long stats partials (one row per
    // partition); top-k runs through TakeOrderedAndProject (per-
    // partition heaps, k rows to the driver — no Exchange node). A
    // second exchange means the posting-shuffle score aggregation the
    // r11 kernel rewrite removed has crept back
    assert(PlanMetrics.exchangeCount(df) === 1,
      s"expected the stats exchange only, got ${PlanMetrics.exchangeCount(df)}")
    val crossed = PlanMetrics.shuffleRecordsWritten(df)
    val cap = spark.sparkContext.defaultParallelism.toLong
    assert(crossed <= cap,
      s"stats exchange carried $crossed rows, cap $cap — corpus rows shuffled")
    graft.ops.CacheBin.releaseAll()
  }

  test("classifier training pass: one exchange, parameter-sized shuffle") {
    val df = LlmOps.qualityFitHistogram(spark, sf)
    df.collect()
    assert(PlanMetrics.exchangeCount(df) === 1,
      s"histogram pass grew to ${PlanMetrics.exchangeCount(df)} exchanges")
    // the map-side combine must collapse the shuffle to the sufficient
    // statistic: ≤ |features|·|grid+1|·2 keys per partition side — if
    // per-DOC rows cross the wire, the partial aggregation broke
    val rows = PlanMetrics.shuffleRecordsWritten(df)
    val cap = 4L * 16 * 2 * spark.sparkContext.defaultParallelism
    assert(rows <= cap, s"shuffled $rows rows, cap $cap — partial agg broke")
  }

  test("dbf lookup join: the fact side aggregates before the join, the dim broadcasts") {
    val df = graft.queries.Connectors.dbfLookupJoin(spark, sf)
    df.collect()
    // one exchange: the fact-side groupBy. The dim reaches the join as
    // a broadcast — a second shuffle means the join degraded to SMJ and
    // would re-shuffle the fact at any corpus scale
    assert(PlanMetrics.exchangeCount(df) === 1,
      s"expected the fact agg exchange only, got ${PlanMetrics.exchangeCount(df)}")
    val bcasts = PlanMetrics.executedNodes(df).count(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
    assert(bcasts === 1, s"dim join not broadcast ($bcasts)")
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

  test("ngram-jaccard: one scan, two exchanges, no count-table joins") {
    // the carried-weight formulation (posting entries ride each doc's
    // distinct-shingle count) needs NO per-doc count branch and NO join
    // back onto the pair stream: the whole query is scan → h-keyed
    // postings exchange → pair-keyed exchange → jaccard filter. Pin
    // exactly that — a third exchange or a second documents scan means
    // the count table (two joins + pair-stream sorts at amplified
    // scale) has crept back
    val df = LlmOps.ngramJaccard(spark, sf)
    df.collect()
    assert(PlanMetrics.exchangeCount(df) === 2,
      s"expected h + pair exchanges only, got ${PlanMetrics.exchangeCount(df)}")
    val docScans = PlanMetrics.distinctFileScans(df)
      .filter(_.metadata.get("Location").exists(_.contains("documents")))
    assert(docScans.size === 1,
      s"documents scanned ${docScans.size}× at runtime")
    val joins = PlanMetrics.executedNodes(df).count(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
    assert(joins === 0, s"$joins joins appeared — count table crept back")
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

  test("kn bigram: documents scanned once; only the pair aggregate is corpus-fed") {
    // the top-k face must select its k rows BEFORE decorating them:
    // history/continuation statistics come from broadcast-semi-filtered
    // scans of the pinned pair table, never vocab×vocab joins — so the
    // one corpus scan feeds exactly one pair exchange and every other
    // exchange carries ≤ k·partitions partial rows
    val df = LlmOps.knBigramTopK(spark, sf)
    try {
      df.collect()
      // the four statistic consumers read the PIN, not the parquet: at
      // most one documents file scan is visible (zero when it hides
      // under the InMemoryRelation's materialization job)
      val docScans = PlanMetrics.distinctFileScans(df)
        .filter(_.metadata.get("Location").exists(_.contains("documents")))
      assert(docScans.size <= 1,
        s"documents scanned ${docScans.size}× — the pair table pin broke")
      val ims = PlanMetrics.executedNodes(df).collect {
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s
      }
      assert(ims.size >= 3,
        s"expected the top/na/cp/nb consumers on the pin, saw ${ims.size}")
      val smjs = PlanMetrics.executedNodes(df).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smjs.isEmpty,
        "vocab×vocab sort-merge join reappeared in the kn top-k face")
    } finally CacheBin.releaseAll()
  }

  test("wordpiece ids face is map-only at runtime") {
    // tokenization-to-model-input must never shuffle: the vocabulary
    // rides the plan inside the kernel and the output is doc-keyed with
    // no aggregation — a vocab join or piece-explode+reassembly window
    // here would pay a corpus-sized exchange for nothing
    val df = graft.ops.WordPiece.idsQuery(spark, sf)
    df.collect()
    assert(PlanMetrics.exchangeCount(df) === 0)
    assert(PlanMetrics.shuffleBytesWritten(df) === 0L)
  }

  test("minpiece bake-off: one corpus exchange, both kernels ride the same scan") {
    // the greedy and DP kernels both run map-side over the distinct
    // (source, compound) rows — the only corpus-sized exchange is that
    // aggregate's; a second scan or a vocab join here would double the
    // cost of the bake-off for nothing
    val df = graft.ops.WordPiece.minEncodeStats(spark, sf)
    df.collect()
    val scans = PlanMetrics.executedNodes(df).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size === 1, "the two segmentation rules must share one scan")
    // exchanges: the (source, compound) aggregate + the parameter-sized
    // per-source rollup + the ≤|sources| final sort
    assert(PlanMetrics.exchangeCount(df) <= 3)
  }

  test("span removal: owner aggregation carries bounded state, no posting lists") {
    // the (h → owner) step must be a plain HashAggregate over two longs
    // per key — spillable, partial-aggregated, hot-key-safe. A
    // collect_list posting here (an ObjectHashAggregate) is the shape
    // where one boilerplate 8-gram occurring 10⁶–10⁸ times in a web
    // corpus becomes one multi-GB buffer on a single reducer; this pin
    // keeps that shape from coming back.
    val df = LlmOps.spanRemovalPositions(
      Tables.load(spark, sf, "documents"), 8)
    try {
      df.collect()
      val objAggs = PlanMetrics.executedNodes(df).collect {
        case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => o
      }
      assert(objAggs.isEmpty,
        "posting-list (object) aggregation reappeared in span removal")
      // pinned shingle stream feeds both consumers; owner agg + join
      // back stay at a small constant number of h-keyed exchanges
      val ex = PlanMetrics.exchangeCount(df)
      assert(ex <= 3, s"span removal grew to $ex exchanges")
    } finally CacheBin.releaseAll()
  }

  test("stratified gate reads the fact table at most twice at runtime") {
    // dist feeds both the cumulative window and the per-lang totals;
    // those two branches must share one shuffle (ReuseExchange), so
    // the documents scan executes twice (dist + final join), never 3×
    val df = graft.queries.Curation.qualityStratifiedGate(spark, sf)
    df.collect()
    val docScans = PlanMetrics.distinctFileScans(df)
      .filter(_.metadata.get("Location").exists(_.contains("documents")))
    assert(docScans.size <= 2,
      s"documents scanned ${docScans.size}× at runtime — dist subtree recomputed")
  }

  test("cdc merge scans the base exactly once; only the small delta twice") {
    // applyLatestWins references `latest` twice (touched-key anti-join
    // + surviving upserts), and per-branch column pruning makes those
    // two subtrees deliberately different (the key side shuffles keys
    // only) — so the DELTA is read twice, which is fine: it's GB-scale.
    // What must never happen is the 100 TB BASE being read more than
    // once, or shuffled at all (the touched keys broadcast).
    val baseDir = java.nio.file.Files.createTempDirectory("cdc_base").toString
    val deltaDir = java.nio.file.Files.createTempDirectory("cdc_delta").toString
    import spark.implicits._
    (1L to 1000L).map(k => (k, s"v$k")).toDF("k", "v")
      .write.mode("overwrite").parquet(baseDir)
    Seq((1L, "v1b", "U", 1L), (2L, "x", "D", 1L), (2000L, "new", "I", 1L))
      .toDF("k", "v", "op", "seq").write.mode("overwrite").parquet(deltaDir)
    val df = CdcMerge.applyLatestWins(
      spark.read.parquet(baseDir), spark.read.parquet(deltaDir), Seq("k"))
    df.collect()
    val scansOf = (dir: String) => PlanMetrics.distinctFileScans(df)
      .count(_.metadata.get("Location").exists(_.contains(
        new java.io.File(dir).getName)))
    assert(scansOf(baseDir) === 1,
      s"base scanned ${scansOf(baseDir)}× — must be exactly once")
    assert(scansOf(deltaDir) <= 2,
      s"delta scanned ${scansOf(deltaDir)}× — more than the two consumers")
    // base never enters a shuffle: the only exchanges are the 3-row
    // delta window's shuffle (+ the broadcast, which isn't a shuffle) —
    // 1000 base rows leaking in would blow this byte bound
    val shuffled = PlanMetrics.shuffleBytesWritten(df)
    assert(shuffled < 5000, s"shuffled $shuffled bytes — base leaked into a shuffle")
  }

  test("pq ADC top-k: the corpus is never shuffled") {
    // encode is a map-only kernel projection, ADC is literal-array
    // lookups, top-k is TakeOrderedAndProject — the only exchange-like
    // node allowed is nothing at all: a shuffle here means someone
    // turned the codebook into a join
    val df = LlmOps.embedPqTopK(spark, sf)
    df.collect()
    assert(PlanMetrics.exchangeCount(df) === 0,
      s"PQ shuffled: ${PlanMetrics.exchangeCount(df)} exchanges")
    assert(PlanMetrics.shuffleBytesWritten(df) === 0L)
  }

  test("temperature sample: data rows never shuffle; joins stay broadcast") {
    // the only shuffles carry the tiny per-group count partials, never
    // the sampled table itself; the join back must be broadcast (an SMJ
    // would shuffle the full corpus by group — the exact skew trap the
    // op exists to avoid)
    val docs = Tables.load(spark, sf, "documents")
    val df = Sampling.temperatureSample(docs, col("doc_id"), col("lang"))
    df.collect()
    val smj = PlanMetrics.executedNodes(df).count(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec])
    assert(smj === 0, s"$smj sort-merge joins — corpus got shuffled by group")
    // group-count partials only: a handful of (lang, count) rows per task
    val rows = PlanMetrics.shuffleRecordsWritten(df)
    assert(rows < 200, s"$rows rows crossed a shuffle — data leaked in")
  }

  test("bigram LM: vocab joins broadcast at bench scale; gram stream pinned once") {
    val df = LlmOps.bigramLmTopK(spark, sf)
    df.collect()
    // the (doc_id, ord, g) gram stream is CacheBin-pinned: vocab build
    // and probe legs both read the pin, so the TokenGramHashes kernel
    // runs over documents ONCE — at most one file scan is visible (zero
    // when it hides under the InMemoryRelation's materialization job);
    // two means the pin stopped covering a leg and the kernel re-runs
    val docScans = PlanMetrics.distinctFileScans(df)
      .count(_.metadata.get("Location").exists(_.contains("documents")))
    assert(docScans <= 1, s"documents scanned $docScans× at runtime")
    val smj = PlanMetrics.executedNodes(df).count(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec])
    assert(smj === 0, s"$smj sort-merge joins — AQE stopped broadcasting the vocab")
  }
}
