package graft.queries

import graft.Tables
import graft.ops.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Corpus-curation query surface: deterministic sampling / train-test
  * splits, PII scrubbing, and document chunking — the data-curation ops
  * of a training pipeline, each with a bit-exact DuckDB oracle (the
  * bucket hash is the same md5-derived hash60 both engines compute).
  */
object Curation {

  /** DuckDB spelling of Sampling.bucketOf (hash60(key) % 100). */
  private def duckBucket(key: String): String =
    s"('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 15))::BIGINT % 100"

  // ------------------------------------------------------------ sampling

  /** Deterministic 10% sample of documents by doc_id hash. */
  def sampleHash(spark: SparkSession, dir: String): DataFrame =
    Sampling.hashSample(Tables.load(spark, dir, "documents"), col("doc_id"), pct = 10)
      .select(col("doc_id"), Sampling.bucketOf(col("doc_id")).as("bucket"))

  val sampleHashSql: String =
    s"""SELECT doc_id, CAST(${duckBucket("doc_id")} AS INT) AS bucket
       |FROM documents WHERE ${duckBucket("doc_id")} < 10""".stripMargin

  /** Deterministic 80/10/10 train/val/test split of the corpus, with
    * per-split document and char totals (what you report before a run).
    */
  def trainTestSplit(spark: SparkSession, dir: String): DataFrame =
    Sampling.assignSplit(Tables.load(spark, dir, "documents"), col("doc_id"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))

  val trainTestSplitSql: String =
    s"""SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
       |  ELSE 'test' END AS split,
       |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM (SELECT n_chars, ${duckBucket("doc_id")} AS b FROM documents)
       |GROUP BY 1""".stripMargin

  /** LEAKAGE-SAFE train/val/test split (the near-duplicate leakage trap
    * Lee et al. 2022 and every serious eval-hygiene audit call out: a
    * doc-keyed hash split puts two near-identical documents on
    * opposite sides of the train/test fence, and the eval silently
    * measures memorization): documents are rooted in their near-dup
    * CLUSTER (the LSH-verified pair graph's connected components;
    * singletons root at themselves) and the split hashes the ROOT, so
    * an entire cluster lands in one split by construction. Reported
    * NEXT TO the naive doc-hash split over the same corpus with the
    * leak counted — multi-doc clusters spanning ≥2 splits — so the
    * face demonstrates both the trap (doc_hash leaks) and the fix
    * (cluster_hash leaks exactly 0). Shape: the pair graph + CC are
    * the dedup family's plans (banded candidates, pointer-doubling);
    * everything after the (doc, root) table is two aggregates over a
    * pinned 2-column frame.
    */
  def splitLeakageSafe(spark: SparkSession, dir: String): DataFrame = {
    val rooted = graft.ops.CacheBin.pin(
      Tables.load(spark, dir, "documents").select(col("doc_id"))
        .join(LlmOps.dedupClusters(spark, dir), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("root")))
    def modeStats(mode: String, key: Column): DataFrame = {
      val s = Sampling.assignSplit(rooted, key)
      val counts = s.groupBy().agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
      val leak = s.groupBy(col("root"))
        .agg(count(lit(1)).as("nd"), countDistinct(col("split")).as("ns"))
        .filter(col("nd") > 1)
        .groupBy().agg(count(lit(1)).as("multi_clusters"),
          sum(when(col("ns") > 1, 1L).otherwise(0L)).as("leaked_clusters"))
      counts.crossJoin(leak).select(lit(mode).as("mode"), col("n_train"),
        col("n_val"), col("n_test"), col("multi_clusters"),
        col("leaked_clusters"))
    }
    modeStats("cluster_hash", col("root"))
      .unionByName(modeStats("doc_hash", col("doc_id")))
      .orderBy(col("mode"))
  }

  /** Leakage-split oracle: the CC chain (the q_dedup_cc recursive
    * closure), both hash-split modes, and the leak census.
    */
  lazy val splitLeakageSafeSql: String =
    s"""WITH roots AS (${LlmOps.dedupClustersSql}),
       |rooted AS (SELECT d.doc_id, coalesce(ro.root, d.doc_id) AS root
       |  FROM documents d LEFT JOIN roots ro ON ro.doc_id = d.doc_id),
       |m AS (
       |  SELECT 'cluster_hash' AS mode, doc_id, root,
       |    ${duckBucket("root")} AS b FROM rooted
       |  UNION ALL
       |  SELECT 'doc_hash', doc_id, root, ${duckBucket("doc_id")} FROM rooted),
       |s AS (SELECT mode, doc_id, root,
       |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
       |       ELSE 'test' END AS split FROM m),
       |cl AS (SELECT mode, root, count(*) AS nd, count(DISTINCT split) AS ns
       |  FROM s GROUP BY 1, 2)
       |SELECT s.mode,
       |  CAST(sum((split = 'train')::BIGINT) AS BIGINT) AS n_train,
       |  CAST(sum((split = 'val')::BIGINT) AS BIGINT) AS n_val,
       |  CAST(sum((split = 'test')::BIGINT) AS BIGINT) AS n_test,
       |  (SELECT CAST(count(*) AS BIGINT) FROM cl
       |   WHERE cl.mode = s.mode AND nd > 1) AS multi_clusters,
       |  (SELECT CAST(count(*) AS BIGINT) FROM cl
       |   WHERE cl.mode = s.mode AND nd > 1 AND ns > 1) AS leaked_clusters
       |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  /** Stratified deterministic sample: keep 50% of URGENT orders, 20% of
    * HIGH, 5% of everything else — the per-stratum downsampling shape
    * (rare strata kept, boilerplate cut).
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedHashSample(Tables.load(spark, dir, "orders"),
      col("o_orderkey"), col("o_orderpriority"),
      Map("1-URGENT" -> 50, "2-HIGH" -> 20), defaultPct = 5)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_sampled"))

  val sampleStratifiedSql: String =
    s"""SELECT o_orderpriority, count(*) AS n_sampled
       |FROM (SELECT o_orderpriority, ${duckBucket("o_orderkey")} AS b FROM orders)
       |WHERE b < CASE o_orderpriority WHEN '1-URGENT' THEN 50
       |  WHEN '2-HIGH' THEN 20 ELSE 5 END
       |GROUP BY 1""".stripMargin

  // ----------------------------------------------------------------- PII

  /** PII scrub over customer names: mask digit-run identifiers, report
    * match counts (emails counted too — the pattern surface; this
    * corpus has none, the count column proves it).
    */
  def piiMask(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(col("c_custkey"),
        TextAnalysis.mask(col("c_name"), TextAnalysis.idPattern).as("masked_name"),
        TextAnalysis.patternCount(col("c_name"), TextAnalysis.idPattern).as("n_id_tokens"),
        TextAnalysis.patternCount(col("c_name"), TextAnalysis.emailPattern).as("n_emails"))

  val piiMaskSql: String =
    s"""SELECT c_custkey,
       |  regexp_replace(c_name, '${TextAnalysis.idPattern}', '#', 'g') AS masked_name,
       |  len(regexp_extract_all(c_name, '${TextAnalysis.idPattern}')) AS n_id_tokens,
       |  len(regexp_extract_all(c_name, '${TextAnalysis.emailPattern}')) AS n_emails
       |FROM customer""".stripMargin

  // ------------------------------------------------------------ chunking

  /** RAG-prep chunking: 32-token windows every 16 tokens (50% overlap),
    * one row per chunk with its corpus-stable hash. The chunk array is
    * one codegen'd kernel call per document (TokenChunks); posexplode is
    * the only fan-out — map-only, no shuffle.
    */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(graft.functions.GraftFunctions.tokenChunks(col("text"), 32, 16))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx"), col("chunk"),
        Dedup.hash60(col("chunk")).as("chunk_hash"))

  /** Same chunking through the streaming generator
    * (graft.functions.ChunkRows, the UDTF face): identical rows to
    * chunkDocs, O(tokens) per-document memory instead of materializing
    * every chunk as one array value before the explode.
    */
  def chunkDocsGen(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.chunkRows(col("text"), 32, 16)
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx"), col("chunk"),
        Dedup.hash60(col("chunk")).as("chunk_hash"))

  /** Sequence packing: assign documents (in stable doc_id order) to
    * training bins of ~`budget` tokens — the "pack short docs into one
    * context window" prep step. Contiguous-fill semantics: bin id =
    * budget boundaries crossed by the running token total BEFORE the
    * doc, so assignment is deterministic and engine-portable (same
    * window arithmetic in the oracle; a doc straddling a boundary stays
    * in the earlier bin, documented overflow). One shuffle (the global
    * order-by window); at 100 TB packing runs per shard — partition by
    * shard hash first, window within shard.
    */
  def packSequences(spark: SparkSession, dir: String, budget: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("bin_id",
        (coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget).cast("long"))
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  /** Sequence packing, SHARDED — the 100 TB shape. The global-window
    * variant above funnels every row through ONE reducer (an
    * unpartitioned Window); here the corpus is split into `nShards`
    * deterministic hash shards and the running-total window runs WITHIN
    * each shard (`Window.partitionBy(shard).orderBy(doc_id)`), so the
    * sort parallelizes across reducers and no task ever sees more than
    * corpus/nShards rows. Bin ids are made globally unique by offsetting
    * with shard·2^40 (a shard never packs 2^40 bins), preserving the
    * "bin ids are stable and disjoint" contract without any cross-shard
    * coordination. Packing quality is unchanged: bins never straddled
    * shards in a sharded training layout anyway.
    */
  /** Shared projection for both packing faces (batch window + streaming
    * flatMapGroupsWithState): deterministic shard + token count per doc.
    */
  def shardTokens(docs: DataFrame, nShards: Int): DataFrame =
    docs.select(col("doc_id"),
      (Sampling.bucketOf(col("doc_id")) % nShards).cast("long").as("shard"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))

  def packSequencesSharded(spark: SparkSession, dir: String,
      budget: Int = 1000, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    shardTokens(Tables.load(spark, dir, "documents"), nShards)
      .withColumn("bin_id", col("shard") * (1L << 40) +
        (coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget).cast("long"))
      .groupBy(col("shard"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  val packSequencesShardedSql: String =
    s"""WITH t AS (SELECT doc_id,
      |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens,
      |    CAST(${duckBucket("doc_id")} % 8 AS BIGINT) AS shard
      |  FROM documents),
      |b AS (SELECT doc_id, n_tokens, shard,
      |  shard * (1::BIGINT << 40) +
      |  (coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 1000) AS bin_id
      |  FROM t)
      |SELECT shard, CAST(bin_id AS BIGINT) AS bin_id, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM b GROUP BY shard, bin_id""".stripMargin

  val packSequencesSql: String =
    """WITH t AS (SELECT doc_id,
      |    len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens
      |  FROM documents),
      |b AS (SELECT doc_id, n_tokens,
      |  (coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 1000) AS bin_id
      |  FROM t)
      |SELECT CAST(bin_id AS BIGINT) AS bin_id, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM b GROUP BY bin_id""".stripMargin

  // --------------------------------------------------------- corpus mix

  /** Per-language token budgets for [[corpusMix]]: a 50k-token mixture
    * at 40/20/20/10/10 shares. Literal so the oracle replays it; in
    * production this is the mixture-weights config of a pretraining
    * data recipe.
    */
  val mixBudgets: Seq[(String, Long)] = Seq(
    "en" -> 20000L, "de" -> 10000L, "fr" -> 10000L,
    "es" -> 5000L, "zh" -> 5000L)

  /** Weighted corpus mixing — build a training mixture hitting per-
    * language TOKEN budgets (the data-recipe step of a pretraining
    * run): deterministic order within each language (doc_id), running
    * token sum, keep every document that STARTS under its language's
    * budget. The same per-group running-window shape as sequence
    * packing, so it scales the same way: hash-partitioned by lang, no
    * global sort; at 100 TB the window runs per-language like packing
    * runs per-shard (a skewed language can be pre-sharded with the
    * salting tools if one group dominates).
    *
    * "Starts under budget" (prior < budget) rather than "ends under"
    * makes the mixture slightly overshoot instead of undershoot and is
    * the same convention sequence packing uses for bin overflow —
    * deterministic, and both engines agree.
    */
  def corpusMix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val budget = mixBudgets.foldLeft(lit(0L)) { case (acc, (l, b)) =>
      when(col("lang") === l, lit(b)).otherwise(acc)
    }
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("prior", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("prior") < budget)
      .select(col("doc_id"), col("lang"), col("n_tokens"))
  }

  val corpusMixSql: String = {
    val cases = mixBudgets.map { case (l, b) => s"WHEN '$l' THEN $b" }
      .mkString(" ")
    s"""WITH t AS (SELECT doc_id, lang,
       |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens
       |  FROM documents),
       |b AS (SELECT doc_id, lang, n_tokens,
       |  coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
       |  FROM t)
       |SELECT doc_id, lang, n_tokens FROM b
       |WHERE prior < CASE lang $cases ELSE 0 END""".stripMargin
  }

  /** Per-language percentile quality gate: keep each language's top 75%
    * of documents by length (drop below the per-language 25th
    * percent_rank) — the Gopher-style "thresholds are per-language, not
    * global" curation rule. NOT computed with a per-language sort
    * window: the top language holds ~40% of the corpus, so a
    * partitionBy(lang) window sorts 40% of 100 TB on one reducer.
    * Instead the (lang, n_chars) DISTRIBUTION is aggregated (map-side
    * combine, cardinality = distinct value pairs), the cumulative
    * count-below runs over that tiny relation, and qualifying
    * (lang, n_chars) values broadcast back as a semi-join filter —
    * the fact table is scanned once, shuffled never. Equivalence with
    * percent_rank: pr = count_less/(n-1), so pr >= q ⟺ count_less >=
    * q·(n-1); q = 0.25 makes the product exact in binary floating
    * point. Single-doc languages drop on both sides (DuckDB/Spark both
    * define their percent_rank as 0 < q).
    */
  def qualityStratifiedGate(spark: SparkSession, dir: String): DataFrame =
    qualityStratifiedGate(Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars")))

  def qualityStratifiedGate(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = docs.groupBy(col("lang"), col("n_chars"))
      .agg(count(lit(1)).as("cnt"))
    val wLess = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = dist.withColumn("less", coalesce(sum(col("cnt")).over(wLess), lit(0L)))
    // totals derive from the distribution, not a second fact scan: the
    // two dist subtrees share one shuffle (ReuseExchange), so the fact
    // table is read exactly twice (dist + final join), not three times
    val totals = dist.groupBy(col("lang")).agg(sum(col("cnt")).as("n"))
    val keep = cum.join(totals, "lang")
      .filter(col("n") > 1 && col("less") >= lit(0.25) * (col("n") - 1))
      .select(col("lang"), col("n_chars"))
    docs.join(broadcast(keep), Seq("lang", "n_chars"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
  }

  val qualityStratifiedGateSql: String =
    """SELECT doc_id, lang, n_chars FROM (
      |  SELECT doc_id, lang, n_chars,
      |    percent_rank() OVER (PARTITION BY lang ORDER BY n_chars) AS pr
      |  FROM documents)
      |WHERE pr >= 0.25""".stripMargin

  /** Deterministic global training-order shuffle: every document gets a
    * reproducible position in a pseudorandom total order (md5 of
    * doc_id + seed; doc_id breaks hash-collision ties) and a batch
    * assignment from it. NOT a single global row_number window: the
    * first hash byte range-buckets the order into 256 shards, per-shard
    * positions come from a per-shard window, and the 256 shard offsets
    * (a driver-side prefix sum over shard counts) lift them to global
    * positions — the same two-pass rank that lets a 100 TB corpus be
    * shuffle-ordered with no single-reducer sort. The md5 bucket is the
    * hash's own prefix, so shard-then-within-shard order IS the global
    * hash order.
    */
  def shuffleBatches(spark: SparkSession, dir: String,
      batchSize: Int = 64, seed: String = "s42"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit("_" + seed))).as("h"))
      .withColumn("shard", substring(col("h"), 1, 2))
    val counts = docs.groupBy(col("shard")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    // shard → count-before (exclusive prefix sum); zip, not sliding(2),
    // so an empty documents table yields an empty offset list (and an
    // empty result) instead of a MatchError on the 1-element window
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toSeq
    val offsetDf = spark.createDataFrame(offsets).toDF("shard", "offset")
    val wShard = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    docs.withColumn("rn", row_number().over(wShard))
      .join(broadcast(offsetDf), "shard")
      .withColumn("pos", col("offset") + col("rn") - 1)
      .select(col("doc_id"),
        (col("pos") / batchSize).cast("int").as("batch"),
        (col("pos") % batchSize).cast("int").as("pos_in_batch"))
  }

  /** Deterministic SHARD MANIFEST for dataset delivery (the
    * WebDataset/ocean-of-tar-shards handoff every training run starts
    * from): the [[shuffleBatches]] order partitions the corpus into
    * fixed-size shards, and the manifest records per shard the doc
    * count, total characters, and an ENGINE-PORTABLE content digest —
    * md5 over the comma-joined doc_ids in shard order — so a consumer
    * (or a re-run on another engine) can verify shard assignment and
    * ordering without touching payload bytes. Digest state is bounded:
    * a shard is `batchSize` docs by construction, so the per-group
    * collect/sort is O(batchSize), never corpus-sized — the same
    * bounded-group argument as chunking. One doc-keyed join carries
    * n_chars; the rank underneath is the two-pass sharded formulation
    * (no single-reducer window).
    */
  def shardManifest(spark: SparkSession, dir: String, batchSize: Int = 64,
      seed: String = "s42"): DataFrame = {
    val assigned = shuffleBatches(spark, dir, batchSize, seed)
    val chars = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    assigned.join(chars, Seq("doc_id"))
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("n_chars"),
        md5(concat_ws(",", transform(
          sort_array(collect_list(struct(col("pos_in_batch"), col("doc_id")))),
          s => s.getField("doc_id").cast("string")))).as("content_md5"))
      .select(col("batch").as("shard"), col("n_docs"), col("n_chars"),
        col("content_md5"))
  }

  val shardManifestSql: String =
    """WITH r AS (SELECT doc_id, n_chars,
      |    row_number() OVER (ORDER BY md5(doc_id::VARCHAR || '_s42'), doc_id) - 1 AS pos
      |  FROM documents)
      |SELECT CAST(pos // 64 AS INT) AS shard, count(*)::BIGINT AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |  md5(string_agg(doc_id::VARCHAR, ',' ORDER BY pos)) AS content_md5
      |FROM r GROUP BY 1""".stripMargin

  val shuffleBatchesSql: String =
    """SELECT doc_id, CAST((rn - 1) // 64 AS INT) AS batch,
      |  CAST((rn - 1) % 64 AS INT) AS pos_in_batch
      |FROM (SELECT doc_id, row_number() OVER (
      |    ORDER BY md5(doc_id::VARCHAR || '_s42'), doc_id) AS rn
      |  FROM documents)""".stripMargin

  val chunkDocsSql: String =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      |  FROM documents),
      |chunks AS (SELECT doc_id,
      |  unnest([CAST((i-1)//16 AS INT) for i in range(1, len(t)+1, 16)]) AS chunk_idx,
      |  unnest([array_to_string(t[i:i+31], ' ') for i in range(1, len(t)+1, 16)]) AS chunk
      |  FROM toks)
      |SELECT doc_id, chunk_idx, chunk,
      |  ('0x' || substr(md5(chunk), 1, 15))::BIGINT AS chunk_hash
      |FROM chunks""".stripMargin

  // ------------------------------------- span-corruption examples (T5)

  /** T5-style span-corruption training-example generation (Raffel et
    * al., JMLR 2020 §3.1.4: replace contiguous token spans with
    * sentinels; the target reproduces each sentinel followed by the
    * tokens it hid). The LAST pipeline stage: turning curated text
    * into (input, target) example pairs.
    *
    * Determinism instead of RNG: a candidate span starts every 10th
    * token, and fires iff hash60(doc_id:decade) % 4 == 0 — ~25% of
    * decades ⇒ ~7.5% of tokens masked in length-3 spans, the usual T5
    * corruption-rate ballpark, and non-overlapping BY CONSTRUCTION, so
    * membership and sentinel numbering are pure functions any engine
    * replays exactly (same md5-derived hash60 the sampling family
    * uses).
    *
    * Scale shape: ZERO exchanges — a hash-sampled filter plus one
    * map-side projection; spans, sentinel numbers, and both output
    * strings are built IN-ROW with higher-order functions (documents
    * are bounded, the corpus is not — the same in-row argument as
    * chunking/CDC). No window, no posexplode, no per-token shuffle.
    */
  def spanCorruption(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sampling.hashSample(
      Tables.load(spark, dir, "documents"), col("doc_id"), pct = 10)
    val t = TextAnalysis.tokens(col("text"))
    val n = size(t)
    // decades 0..(n-1)/10 whose hash fires — the ordered span starts;
    // a span's sentinel number IS its position in this list
    val starts = filter(
      sequence(lit(0), ((n - 1) / 10).cast("int")),
      d => Dedup.hash60(concat(col("doc_id"), lit(":"), d)) % 4 === 0)
    def sentinel(k: Column): Column =
      concat(lit("<extra_id_"), k.cast("string"), lit(">"))
    val input = array_join(
      filter(
        transform(sequence(lit(0), n - 1), i0 => {
          val dec = (i0 / 10).cast("int")
          val inSpan = i0 % 10 <= 2 && array_contains(starts, dec)
          when(i0 % 10 === 0 && array_contains(starts, dec),
            sentinel(array_position(starts, dec) - 1))
            .when(inSpan, lit(null))
            .otherwise(element_at(t, (i0 + 1).cast("int")))
        }),
        x => x.isNotNull),
      " ")
    val target = array_join(
      flatten(transform(starts, (d, j) =>
        concat(array(sentinel(j)),
          slice(t, (d * 10 + 1).cast("int"), lit(3))))),
      " ")
    docs.select(col("doc_id"),
      size(starts).as("n_spans"),
      input.as("input"), target.as("target"))
  }

  /** DuckDB replay: identical decade hash, sentinel numbering via
    * list_position over the same starts list, same join-with-space
    * string assembly (the target's '<extra_id_k> tok' elements join to
    * the same string as the engine's flattened piece list).
    */
  val spanCorruptionSql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      |  FROM documents
      |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 10),
      |s AS (
      |  SELECT doc_id, t,
      |    [x for x in range(0, (len(t)-1)//10 + 1)
      |     if ('0x' || substr(md5(doc_id::VARCHAR || ':' || x::VARCHAR), 1, 15))::BIGINT % 4 = 0]
      |    AS starts
      |  FROM d)
      |SELECT doc_id, CAST(len(starts) AS INT) AS n_spans,
      |  array_to_string(
      |    [CASE WHEN (i-1) % 10 = 0 AND list_contains(starts, (i-1)//10)
      |       THEN '<extra_id_' || (list_position(starts, (i-1)//10) - 1)::VARCHAR || '>'
      |       ELSE t[i] END
      |     for i in range(1, len(t)+1)
      |     if NOT ((i-1) % 10 <= 2 AND list_contains(starts, (i-1)//10)) OR (i-1) % 10 = 0],
      |    ' ') AS input,
      |  coalesce(array_to_string(
      |    [CASE WHEN (i-1) % 10 = 0
      |       THEN '<extra_id_' || (list_position(starts, (i-1)//10) - 1)::VARCHAR || '> ' || t[i]
      |       ELSE t[i] END
      |     for i in range(1, len(t)+1)
      |     if (i-1) % 10 <= 2 AND list_contains(starts, (i-1)//10)],
      |    ' '), '') AS target
      |FROM s""".stripMargin

  // ------------------------------------------- budget-bounded selection

  /** Integer-exact quality score shared by [[budgetSelect]] and
    * [[prefPairs]]: alphabetic-character density in per-mille,
    * `(n_alpha · 1000) div max(n_chars, 1)` — all int64 (`div`, not
    * float division), so rankings are bit-identical across engines.
    * A stand-in for a model score; the selection machinery is the op.
    */
  private def qualityScore(text: Column): Column =
    call_function("div", regexp_count(text, lit("[A-Za-z]")) * lit(1000L),
      greatest(length(text).cast("long"), lit(1L))).cast("long")

  private val qualityScoreSql =
    "(len(regexp_extract_all(text, '[A-Za-z]'))::BIGINT * 1000) " +
      "// greatest(length(text)::BIGINT, 1)"

  /** Quality-prioritized token-budget selection — the "budget < corpus"
    * data-recipe stage: within each source, take documents best-first
    * (score DESC, doc_id tie) until the source's token budget is spent.
    * Same start-under-budget convention as [[corpusMix]] (a doc STARTING
    * under budget is kept, documented overshoot), but ordered by QUALITY
    * instead of doc_id — selection, not just mixing.
    *
    * NOT a partitionBy(source) sort window over the corpus — the same
    * one-reducer-sorts-a-corpus-fraction trap [[qualityStratifiedGate]]
    * documents. The greedy is order-dependent so it cannot shard like
    * packing; instead it decomposes exactly over the per-mille SCORE
    * DISTRIBUTION (≤ |sources|·1001 rows):
    *   - one pass computes the slim (doc_id, source, score, n_tokens)
    *     projection (pinned — the text-derived score is computed once);
    *   - the (source, score) token-total distribution aggregates
    *     map-side; a cumsum over that TINY relation gives each score
    *     group's prior (tokens in strictly better groups);
    *   - groups with prior ≥ budget drop whole at the broadcast join
    *     (a doc's start is ≥ its group's prior), leaving the CANDIDATE
    *     set — whose size is budget-bounded (∝ budget per source plus
    *     one boundary group), NOT corpus-bounded — to carry the exact
    *     per-doc running check `prior + within < budget` through one
    *     (source, score)-partitioned window.
    * So the corpus is scanned once into the pinned slim projection and
    * aggregated once; the only doc-level sort covers the budget-bounded
    * candidate set.
    */
  def budgetSelect(spark: SparkSession, dir: String,
      budget: Long = 2000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val slim = graft.ops.CacheBin.pin(
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          qualityScore(col("text")).as("score"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")))
    val wHigher = Window.partitionBy(col("source")).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val inPlay = slim.groupBy(col("source"), col("score"))
      .agg(sum(col("n_tokens")).as("toks"))
      .withColumn("prior", coalesce(sum(col("toks")).over(wHigher), lit(0L)))
      .filter(col("prior") < budget)
      .select(col("source"), col("score"), col("prior"))
    val wIn = Window.partitionBy(col("source"), col("score"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    slim.join(broadcast(inPlay), Seq("source", "score"))
      .withColumn("within", coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      .filter(col("prior") + col("within") < budget)
      .select(col("doc_id"), col("source"), col("score"), col("n_tokens"))
  }

  val budgetSelectSql: String =
    s"""WITH t AS (SELECT doc_id, source, $qualityScoreSql AS score,
       |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens
       |  FROM documents),
       |b AS (SELECT doc_id, source, score, n_tokens,
       |  coalesce(sum(n_tokens) OVER (PARTITION BY source
       |    ORDER BY score DESC, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
       |  FROM t)
       |SELECT doc_id, source, CAST(score AS BIGINT) AS score, n_tokens
       |FROM b WHERE prior < 2000""".stripMargin

  // ---------------------------------------------------- preference pairs

  /** Preference-pair mining — reward-model training data from scored
    * documents: per (source, lang) bucket, pair the best-scored document
    * (chosen) with the worst (rejected), margin = score gap; uniform
    * buckets (margin 0) emit nothing. Ties are deterministic: lower
    * doc_id wins on both sides, encoded as struct extrema — chosen =
    * max(score, −doc_id), rejected = min(score, doc_id) — so the whole
    * op is ONE map-side-combined aggregation (no per-bucket sort window,
    * no self-join): the shuffle carries one partial struct pair per
    * (bucket, partition) at any corpus size. The −doc_id tie encoding
    * assumes non-negative ids (the tables' contract); Long.MinValue
    * would overflow the negation.
    */
  def prefPairs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("source"), col("lang"), col("doc_id"),
        qualityScore(col("text")).as("score"))
      .groupBy(col("source"), col("lang"))
      .agg(
        max(struct(col("score"), (-col("doc_id")).as("neg_id"))).as("mx"),
        min(struct(col("score"), col("doc_id"))).as("mn"))
      .select(col("source"), col("lang"),
        (-col("mx.neg_id")).as("chosen_id"),
        col("mn.doc_id").as("rejected_id"),
        (col("mx.score") - col("mn.score")).as("margin"))
      .filter(col("margin") > 0)

  /** SFT example rendering with LOSS-MASK boundaries — the step between
    * pair mining and the trainer: each (source, lang) bucket's chosen
    * document renders into a chat-templated training string
    * (`<|system|> metadata … <|user|> instruction <|assistant|> text`),
    * and the op reports the ASSISTANT SPAN in whitespace-token
    * coordinates — [mask_start, n_tokens) is the range the loss is
    * computed over (everything before it is prompt, masked out), which
    * is the one piece of metadata an SFT data loader actually needs.
    * The rendered string itself ships as a sha-256 digest (byte-exact
    * render verification without shipping the strings — the
    * token-blocks convention).
    *
    * Plan shape: the pair table is bucket-sized (≤ |source×lang|) and
    * broadcasts; ONE corpus scan probes it (chosen ids), and the
    * render + token arithmetic is map-side. The mask boundary is
    * COMPUTED from the prefix (not hardcoded) so a template change
    * cannot silently desynchronize mask and render.
    */
  def sftExamples(spark: SparkSession, dir: String): DataFrame = {
    val pairs = prefPairs(spark, dir)
      .select(col("source").as("p_source"), col("lang").as("p_lang"),
        col("chosen_id"))
    val prefix = concat(lit("<|system|> source="), col("p_source"),
      lit(" lang="), col("p_lang"),
      lit(" <|user|> write a representative document <|assistant|>"))
    val rendered = concat(prefix, lit(" "), col("text"))
    Tables.load(spark, dir, "documents")
      .join(broadcast(pairs), col("doc_id") === col("chosen_id"))
      .select(col("p_source").as("source"), col("p_lang").as("lang"),
        col("chosen_id"),
        TextAnalysis.tokenCount(rendered).cast("long").as("n_tokens"),
        TextAnalysis.tokenCount(prefix).cast("long").as("mask_start"),
        sha2(rendered, 256).as("render_sha"))
      .orderBy(col("source"), col("lang"))
  }

  val sftExamplesSql: String =
    s"""WITH t AS (SELECT source, lang, doc_id, $qualityScoreSql AS score
       |  FROM documents),
       |r AS (SELECT source, lang, doc_id, score,
       |  row_number() OVER (PARTITION BY source, lang
       |    ORDER BY score DESC, doc_id) AS rb,
       |  row_number() OVER (PARTITION BY source, lang
       |    ORDER BY score ASC, doc_id) AS rw
       |  FROM t),
       |pairs AS (SELECT c.source, c.lang, c.doc_id AS chosen_id
       |  FROM r c JOIN r j ON c.source = j.source AND c.lang = j.lang
       |  WHERE c.rb = 1 AND j.rw = 1 AND c.score > j.score),
       |rendered AS (
       |  SELECT p.source, p.lang, p.chosen_id,
       |    '<|system|> source=' || p.source || ' lang=' || p.lang ||
       |      ' <|user|> write a representative document <|assistant|>' AS pre,
       |    '<|system|> source=' || p.source || ' lang=' || p.lang ||
       |      ' <|user|> write a representative document <|assistant|> ' ||
       |      d.text AS rnd
       |  FROM pairs p JOIN documents d ON d.doc_id = p.chosen_id)
       |SELECT source, lang, chosen_id,
       |  len(string_split_regex(trim(rnd), '\\s+'))::BIGINT AS n_tokens,
       |  len(string_split_regex(trim(pre), '\\s+'))::BIGINT AS mask_start,
       |  sha256(rnd) AS render_sha
       |FROM rendered ORDER BY source, lang""".stripMargin

  val prefPairsSql: String =
    s"""WITH t AS (SELECT source, lang, doc_id, $qualityScoreSql AS score
       |  FROM documents),
       |r AS (SELECT source, lang, doc_id, score,
       |  row_number() OVER (PARTITION BY source, lang
       |    ORDER BY score DESC, doc_id) AS rb,
       |  row_number() OVER (PARTITION BY source, lang
       |    ORDER BY score ASC, doc_id) AS rw
       |  FROM t)
       |SELECT c.source, c.lang, c.doc_id AS chosen_id,
       |  j.doc_id AS rejected_id, CAST(c.score - j.score AS BIGINT) AS margin
       |FROM r c JOIN r j ON c.source = j.source AND c.lang = j.lang
       |WHERE c.rb = 1 AND j.rw = 1 AND c.score > j.score""".stripMargin

  // -------------------------------------------------------- k-anonymity

  private val kAnonK = 5

  /** K-ANONYMITY census (Sweeney 2002) — the privacy-side counterpart
    * of the PII scrub: before a curated table leaves the pipeline,
    * count how identifiable its quasi-identifier combinations are.
    * A row is k-anonymous iff at least k−1 other rows share its full
    * QI tuple; the census reports, per GENERALIZATION level (the
    * standard remediation ladder — coarsen a column, then drop it):
    * class count, the smallest class, and the rows/classes below
    * k = 5 with the at-risk percentage.
    *
    *  - L0: (nation, market segment, balance to the nearest 100)
    *  - L1: balance coarsened to 1000 — classes merge, risk drops
    *  - L2: balance dropped entirely
    *  - L3: nation only — the ladder's floor
    *
    * One corpus pass: each row explodes into its four (level, class)
    * encodings, ONE class-keyed aggregate (map-side combined) and one
    * |classes|-sized rollup — never four scans, no joins. The ladder
    * L0 → L3 must show monotone non-increasing risk (guaranteed:
    * coarser partitions only merge classes) and a strict overall drop
    * on this corpus (spec-pinned live at every SF).
    */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val nat = col("c_nationkey").cast(StringType)
    val b100 = floor(col("c_acctbal") / 100).cast(LongType).cast(StringType)
    val b1000 = floor(col("c_acctbal") / 1000).cast(LongType).cast(StringType)
    val qi = Tables.load(spark, dir, "customer").select(explode(array(
        struct(lit("L0_nation_seg_bal100").as("level"),
          concat_ws("|", nat, col("c_mktsegment"), b100).as("cls")),
        struct(lit("L1_nation_seg_bal1000").as("level"),
          concat_ws("|", nat, col("c_mktsegment"), b1000).as("cls")),
        struct(lit("L2_nation_seg").as("level"),
          concat_ws("|", nat, col("c_mktsegment")).as("cls")),
        struct(lit("L3_nation").as("level"), nat.as("cls")))).as("q"))
      .select(col("q.level").as("level"), col("q.cls").as("cls"))
    qi.groupBy(col("level"), col("cls")).agg(count(lit(1)).as("n"))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_classes"),
        min(col("n")).as("min_class_size"),
        sum(when(col("n") < kAnonK, col("n")).otherwise(0L)).as("rows_at_risk"),
        sum(when(col("n") < kAnonK, 1L).otherwise(0L)).as("classes_at_risk"),
        round(sum(when(col("n") < kAnonK, col("n")).otherwise(0L)) * 100.0 /
          sum(col("n")), 6).as("pct_at_risk"))
      .orderBy(col("level"))
  }

  /** L-DIVERSITY census (Machanavajjhala et al. 2006) — k-anonymity's
    * known blind spot made measurable: a class can be large (k-safe)
    * yet carry ONE sensitive value, so membership alone discloses it.
    * Sensitive attribute = market segment; QI levels are the ladder
    * rungs that do NOT contain the segment (the others are trivially
    * l = 1 by construction): per level, class count, the least-diverse
    * class's distinct-sensitive count (min_l), and the classes/rows
    * below l = 3. Same one-pass explode + two-level aggregate shape as
    * the k-anonymity face — the inner aggregate is
    * (level, class, segment)-keyed, then distinct-counts fold per
    * class, then the census per level.
    */
  private val lDivL = 3

  def lDiversity(spark: SparkSession, dir: String): DataFrame = {
    val nat = col("c_nationkey").cast(StringType)
    val b1000 = floor(col("c_acctbal") / 1000).cast(LongType).cast(StringType)
    val qi = Tables.load(spark, dir, "customer").select(explode(array(
        struct(lit("L1_nation_bal1000").as("level"),
          concat_ws("|", nat, b1000).as("cls")),
        struct(lit("L2_nation").as("level"), nat.as("cls")))).as("q"),
      col("c_mktsegment").as("sens"))
      .select(col("q.level").as("level"), col("q.cls").as("cls"), col("sens"))
    qi.groupBy(col("level"), col("cls"))
      .agg(count(lit(1)).as("n"), countDistinct(col("sens")).as("l"))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_classes"),
        min(col("l")).as("min_l"),
        sum(when(col("l") < lDivL, 1L).otherwise(0L)).as("classes_below_l"),
        sum(when(col("l") < lDivL, col("n")).otherwise(0L)).as("rows_below_l"))
      .orderBy(col("level"))
  }

  val lDiversitySql: String =
    s"""WITH qi AS (
       |  SELECT 'L1_nation_bal1000' AS level,
       |    concat_ws('|', CAST(c_nationkey AS VARCHAR),
       |      CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR)) AS cls,
       |    c_mktsegment AS sens
       |  FROM customer
       |  UNION ALL
       |  SELECT 'L2_nation', CAST(c_nationkey AS VARCHAR), c_mktsegment
       |  FROM customer),
       |classes AS (
       |  SELECT level, cls, count(*) AS n, count(DISTINCT sens) AS l
       |  FROM qi GROUP BY 1, 2)
       |SELECT level, CAST(count(*) AS BIGINT) AS n_classes,
       |  CAST(min(l) AS BIGINT) AS min_l,
       |  CAST(sum(CASE WHEN l < $lDivL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS classes_below_l,
       |  CAST(sum(CASE WHEN l < $lDivL THEN n ELSE 0 END) AS BIGINT)
       |    AS rows_below_l
       |FROM classes GROUP BY 1 ORDER BY 1""".stripMargin

  val kAnonymitySql: String =
    s"""WITH qi AS (
       |  SELECT 'L0_nation_seg_bal100' AS level,
       |    concat_ws('|', CAST(c_nationkey AS VARCHAR), c_mktsegment,
       |      CAST(CAST(floor(c_acctbal / 100) AS BIGINT) AS VARCHAR)) AS cls
       |  FROM customer
       |  UNION ALL
       |  SELECT 'L1_nation_seg_bal1000',
       |    concat_ws('|', CAST(c_nationkey AS VARCHAR), c_mktsegment,
       |      CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR))
       |  FROM customer
       |  UNION ALL
       |  SELECT 'L2_nation_seg',
       |    concat_ws('|', CAST(c_nationkey AS VARCHAR), c_mktsegment)
       |  FROM customer
       |  UNION ALL
       |  SELECT 'L3_nation', CAST(c_nationkey AS VARCHAR)
       |  FROM customer),
       |classes AS (SELECT level, cls, count(*) AS n FROM qi GROUP BY 1, 2)
       |SELECT level, CAST(count(*) AS BIGINT) AS n_classes,
       |  CAST(min(n) AS BIGINT) AS min_class_size,
       |  CAST(sum(CASE WHEN n < $kAnonK THEN n ELSE 0 END) AS BIGINT)
       |    AS rows_at_risk,
       |  CAST(sum(CASE WHEN n < $kAnonK THEN 1 ELSE 0 END) AS BIGINT)
       |    AS classes_at_risk,
       |  round(sum(CASE WHEN n < $kAnonK THEN n ELSE 0 END) * 100.0
       |    / sum(n), 6) AS pct_at_risk
       |FROM classes GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------- t-closeness

  /** T-CLOSENESS census (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * third rung of the privacy ladder after [[kAnonymity]] (class sizes)
    * and [[lDiversity]] (distinct sensitive values): even an l-diverse
    * class leaks if its sensitive-value DISTRIBUTION is skewed vs the
    * table at large (all l values present, but 95% of the class holds
    * one of them). A class is t-close iff the Earth Mover's Distance
    * between its sensitive distribution and the global one is <= t.
    *
    * Sensitive attribute: account balance, ordinally bucketed to 1000s
    * (the ORDERED-attribute EMD of the paper §4.2:
    * EMD = (1/(m−1)) · Σ_i |Σ_{j<=i} (p_j − q_j)|, the total mass that
    * must flow past each bucket boundary). Computed in EXACT integer
    * arithmetic: with class counts n_cj (size N_c) and global counts
    * n_j (total N), each cumulative term is Σ(n_cj·N − n_j·N_c), so
    * EMD = Σ|cum| / (N·N_c·(m−1)) — one integer division at the very
    * end, and the t = 0.2 threshold test is the integer compare
    * emd_num·5 > denom (no float ever enters the gate). Products stay
    * under 2^63 to ~3·10^9 rows; past that the same plan runs on
    * per-million scaled counts.
    *
    * Shape: one customer pass explodes each row into its (level, class)
    * encodings → one (level,cls,bucket)-keyed aggregate (map-side
    * combined); the bucket GRID (every class × every global bucket —
    * missing buckets are exact zeros the cumulative sum must traverse)
    * is a broadcast nested-loop against the ~11-row global bucket list
    * (domain-bounded: balance/1000), never a corpus cartesian; the
    * cumulative sum is a per-class window over <=11 rows. Ladder
    * monotonicity (L2 coarser => max_t no larger) is spec-pinned.
    */
  private val tCloseNum = 1 // t = tCloseNum / tCloseDen = 0.2, kept as
  private val tCloseDen = 5 // integers so the gate is an exact compare

  def tCloseness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cust = Tables.load(spark, dir, "customer")
    val nat = col("c_nationkey").cast(StringType)
    val bucket = floor(col("c_acctbal") / 1000).cast(LongType)
    val rows = cust.select(explode(array(
        struct(lit("L1_nation_seg").as("level"),
          concat_ws("|", nat, col("c_mktsegment")).as("cls")),
        struct(lit("L2_nation").as("level"), nat.as("cls")))).as("q"),
      bucket.as("b"))
      .select(col("q.level").as("level"), col("q.cls").as("cls"), col("b"))
    val classBucket = rows.groupBy(col("level"), col("cls"), col("b"))
      .agg(count(lit(1)).as("n_cb"))
    val classes = classBucket.groupBy(col("level"), col("cls"))
      .agg(sum(col("n_cb")).as("n_c"))
    val global = cust.select(bucket.as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n_b"))
    val gStats = global.agg(sum(col("n_b")).as("n_total"),
      count(lit(1)).as("m"))
    val grid = classes
      .crossJoin(broadcast(global))
      .join(classBucket, Seq("level", "cls", "b"), "left")
      .withColumn("n_cb", coalesce(col("n_cb"), lit(0L)))
      .crossJoin(broadcast(gStats))
    val w = Window.partitionBy(col("level"), col("cls")).orderBy(col("b"))
    val perClass = grid
      .withColumn("cum",
        sum(col("n_cb") * col("n_total") - col("n_b") * col("n_c")).over(w))
      .groupBy(col("level"), col("cls"), col("n_c"), col("n_total"), col("m"))
      .agg(sum(abs(col("cum"))).as("emd_num"))
      .withColumn("denom", col("n_total") * col("n_c") * (col("m") - 1))
    perClass.groupBy(col("level"))
      .agg(count(lit(1)).as("n_classes"),
        round(max(col("emd_num").cast(org.apache.spark.sql.types.DoubleType)
          / col("denom")), 6).as("max_t"),
        sum(when(col("emd_num") * tCloseDen > col("denom") * tCloseNum, 1L)
          .otherwise(0L)).as("classes_above_t"),
        sum(when(col("emd_num") * tCloseDen > col("denom") * tCloseNum,
          col("n_c")).otherwise(0L)).as("rows_above_t"))
      .orderBy(col("level"))
  }

  val tClosenessSql: String =
    s"""WITH r AS (
       |  SELECT 'L1_nation_seg' AS level,
       |    concat_ws('|', CAST(c_nationkey AS VARCHAR), c_mktsegment) AS cls,
       |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS b
       |  FROM customer
       |  UNION ALL
       |  SELECT 'L2_nation', CAST(c_nationkey AS VARCHAR),
       |    CAST(floor(c_acctbal / 1000) AS BIGINT)
       |  FROM customer),
       |cb AS (SELECT level, cls, b, count(*) AS n_cb FROM r GROUP BY 1, 2, 3),
       |cl AS (SELECT level, cls, CAST(sum(n_cb) AS BIGINT) AS n_c
       |  FROM cb GROUP BY 1, 2),
       |gb AS (SELECT CAST(floor(c_acctbal / 1000) AS BIGINT) AS b,
       |  count(*) AS n_b FROM customer GROUP BY 1),
       |gs AS (SELECT CAST(sum(n_b) AS BIGINT) AS n_total,
       |  CAST(count(*) AS BIGINT) AS m FROM gb),
       |grid AS (
       |  SELECT cl.level, cl.cls, cl.n_c, gb.b, gb.n_b,
       |    coalesce(cb.n_cb, 0) AS n_cb, gs.n_total, gs.m
       |  FROM cl CROSS JOIN gb
       |  LEFT JOIN cb ON cb.level = cl.level AND cb.cls = cl.cls AND cb.b = gb.b
       |  CROSS JOIN gs),
       |cum AS (SELECT level, cls, n_c, n_total, m,
       |  sum(n_cb * n_total - n_b * n_c)
       |    OVER (PARTITION BY level, cls ORDER BY b) AS cum
       |  FROM grid),
       |pc AS (SELECT level, cls, n_c, n_total, m,
       |  CAST(sum(abs(cum)) AS BIGINT) AS emd_num
       |  FROM cum GROUP BY 1, 2, 3, 4, 5)
       |SELECT level, CAST(count(*) AS BIGINT) AS n_classes,
       |  round(max(CAST(emd_num AS DOUBLE) / (n_total * n_c * (m - 1))), 6)
       |    AS max_t,
       |  CAST(sum(CASE WHEN emd_num * $tCloseDen > n_total * n_c * (m - 1)
       |      * $tCloseNum THEN 1 ELSE 0 END) AS BIGINT) AS classes_above_t,
       |  CAST(sum(CASE WHEN emd_num * $tCloseDen > n_total * n_c * (m - 1)
       |      * $tCloseNum THEN n_c ELSE 0 END) AS BIGINT) AS rows_above_t
       |FROM pc GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------- local-DP randomized response

  /** LOCAL differential privacy via randomized response (Warner 1965;
    * the RAPPOR mechanism's core) — the fourth rung of the privacy
    * surface after the [[kAnonymity]]/[[lDiversity]]/[[tCloseness]]
    * release censuses: those AUDIT a table before release; randomized
    * response PERTURBS each row so the table itself is ε-DP and the
    * sensitive bit of any individual row is deniable. Mechanism: report
    * the true bit with probability p = 3/4, the flipped bit otherwise
    * (ε = ln(p/(1−p)) = ln 3), then debias per group:
    * est = (reported_yes − n(1−p))/(2p−1) = 2·reported_yes − n/2.
    *
    * The "coin" is the repo's portable determinism trick: hash60(key)
    * mod 4 < 3 is an EXACT 3/4 Bernoulli both engines replay
    * bit-identically — so unlike real deployments (whose noise is
    * irreproducible by design) the whole face hash-gates, while the
    * estimator algebra is exactly what a production rollout debiases
    * with. Estimator kept integer: est2 = 4·yes − n (twice the
    * estimate), one final /2.0 division.
    *
    * Shape: one customer pass (the hash, the flip, the group key), one
    * nation-keyed aggregate with map-side combine. Nothing joins,
    * nothing collects.
    */
  def dpRandomizedResponse(spark: SparkSession, dir: String): DataFrame = {
    val truth = (col("c_mktsegment") === "BUILDING").cast(LongType)
    val keep = Dedup.hash60(col("c_custkey").cast(StringType)) % 4 < 3
    val reported = when(keep, truth).otherwise(lit(1L) - truth)
    Tables.load(spark, dir, "customer")
      .select(col("c_nationkey").cast(LongType).as("nation"),
        truth.as("t"), reported.as("r"))
      .groupBy(col("nation"))
      .agg(count(lit(1)).as("n"),
        sum(col("t")).as("true_yes"),
        sum(col("r")).as("reported_yes"))
      .withColumn("est",
        (lit(4) * col("reported_yes") - col("n")).cast(
          org.apache.spark.sql.types.DoubleType) / 2)
      .orderBy(col("nation"))
  }

  // ------------------------------------- central-DP noisy histogram release

  /** ε for the geometric mechanism at α = 1/2: ln(1/α) = ln 2, computed
    * once on the driver and inlined as the SAME literal into both faces
    * (the p_at_tau convention — no libm in either engine's dataflow).
    */
  private val dpHistEps: Double =
    BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble

  /** Per-trial truncated-geometric(1/2) draw for a released cell: the
    * smallest trial index i in 0..15 whose portable coin
    * hash60("salt:cell:i") lands even, else 16 — P(G=k) = 2^−(k+1),
    * P(G=16) = 2^−16 (the truncation tail).
    */
  private[graft] def dpGeomDraw(salt: String, cell: Column): Column =
    coalesce(
      array_min(filter(
        transform(sequence(lit(0), lit(15)), i =>
          when(Dedup.hash60(concat_ws(":",
            lit(salt), cell, i.cast(StringType))) % 2 === 0, i)),
        x => x.isNotNull)),
      lit(16))

  /** CENTRAL differential privacy — the CALIBRATED AGGREGATE RELEASE
    * the privacy family lacked: the k-anon/l-div/t-close censuses
    * audit, [[dpRandomizedResponse]] perturbs per record (local DP);
    * this face releases a (segment, acctbal-bucket) histogram with
    * two-sided TRUNCATED-GEOMETRIC noise per CELL — the geometric
    * mechanism of Ghosh–Roughgarden–Sundararajan (STOC 2009), the
    * discrete Laplace that is utility-optimal for sensitivity-1 counts.
    * Noise Z = G₁ − G₂ with G_i iid truncated geometric(1/2)
    * ([[dpGeomDraw]]: the first even portable-hash trial index), giving
    * ε = ln 2 per release (up to the 2^−16 truncation tail — the
    * standard bounded-noise deployment trade, stated in-band by the ε
    * column next to the EXACT count so the release's error is
    * auditable).
    *
    * The "coin" is the repo's portable-determinism convention (the RR
    * face's hash60 trick, applied per-cell instead of per-record):
    * both engines replay the draw bit-identically, so the whole noisy
    * release hash-gates — while the mechanism algebra is exactly what
    * a production release calibrates.
    *
    * Shape: one customer pass into the cell aggregate (map-side
    * combined); the noise draw is 2×16 hashes per RELEASED CELL —
    * O(cells), never O(rows); nothing joins, nothing collects.
    */
  def dpHistogram(spark: SparkSession, dir: String): DataFrame =
    dpNoisyHistogram(Tables.load(spark, dir, "customer"), "g1", "g2")
      .withColumn("epsilon", lit(dpHistEps))
      .select(col("segment"), col("b"), col("n"), col("z"), col("noisy"),
        col("epsilon"))
      .orderBy(col("segment"), col("b"))

  /** Shared release core: the (segment, acctbal-bucket) histogram over
    * a customer relation with the per-cell geometric noise drawn under
    * the given salt pair — [[dpHistogram]] (one release) and
    * [[graft.streaming.DpStream]] (one release per micro-batch, salts
    * versioned by release index) both build on it.
    */
  private[graft] def dpNoisyHistogram(customers: DataFrame,
      saltA: String, saltB: String): DataFrame = {
    val cell = concat_ws("|", col("segment"), col("b").cast(StringType))
    customers
      .select(col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / 1000).cast(LongType).as("b"))
      .groupBy(col("segment"), col("b"))
      .agg(count(lit(1)).as("n"))
      .withColumn("z",
        (dpGeomDraw(saltA, cell) - dpGeomDraw(saltB, cell)).cast(LongType))
      .withColumn("noisy", col("n") + col("z"))
  }

  /** ε after k releases at ln 2 each (sequential composition), as the
    * exact 6-decimal multiple both engines inline.
    */
  private[graft] def dpEpsTotal(releases: Long): Double =
    (BigDecimal(dpHistEps) * releases).toDouble

  val dpHistogramSql: String = {
    def draw(salt: String) =
      s"""coalesce(list_min([i for i in range(0, 16)
         |    IF ('0x' || substr(md5('$salt:' || cell || ':' || CAST(i AS VARCHAR)),
         |      1, 15))::BIGINT % 2 = 0]), 16)""".stripMargin
    s"""WITH h AS (SELECT c_mktsegment AS segment,
       |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS b,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM customer GROUP BY 1, 2),
       |c AS (SELECT segment, b, n,
       |    segment || '|' || CAST(b AS VARCHAR) AS cell FROM h),
       |g AS (SELECT segment, b, n,
       |    CAST(${draw("g1")} - ${draw("g2")} AS BIGINT) AS z
       |  FROM c)
       |SELECT segment, b, n, z, CAST(n + z AS BIGINT) AS noisy,
       |  CAST($dpHistEps AS DOUBLE) AS epsilon
       |FROM g ORDER BY 1, 2""".stripMargin
  }

  /** STREAMING DP release face (q_dp_stream): the customer table split
    * into two micro-batches by the deterministic c_custkey % 2 rule,
    * fed through [[graft.streaming.DpStream]] with a kill-and-resume
    * between them (the house two-wave restart harness), releases
    * re-read from the committed versioned outputs. Release 0 covers
    * the even-key half at ε = ln 2; release 1 covers everyone at
    * eps_total = 2·ln 2 — the oracle replays both histograms and both
    * versioned noise draws closed-form from the customer table.
    */
  def dpStreamMaterialize(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.ops.StageOnce.tmp("dp_stream", dir)
    val state = s"$root/state"
    graft.ops.StageOnce(root) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val rows = Tables.load(spark, dir, "customer")
        .select(col("c_custkey").cast(LongType),
          col("c_mktsegment"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
        .as[(Long, String, Double)].collect()
      val (even, odd) = rows.partition(_._1 % 2 == 0)
      val ckpt = graft.ops.StageOnce.tmp("dp_stream_ckpt", dir)
      val mem = MemoryStream[(Long, String, Double)]
      def start() = graft.streaming.DpStream.start(
        mem.toDS().toDF("c_custkey", "c_mktsegment", "c_acctbal"),
        state, ckpt)
      val q1 = start()
      try {
        mem.addData(even.toIndexedSeq: _*)
        q1.processAllAvailable()
      } finally q1.stop()
      val q2 = start() // kill-and-resume from the checkpoint
      try {
        mem.addData(odd.toIndexedSeq: _*)
        q2.processAllAvailable()
      } finally q2.stop()
    }
    graft.streaming.DpStream.releases(spark, state)
  }

  /** Stream-release oracle: one branch per release — release 0 the
    * even-custkey histogram under the r0-versioned salts at ε = ln 2,
    * release 1 the full histogram under the r1 salts at 2·ln 2.
    */
  lazy val dpStreamSql: String = {
    def draw(salt: String) =
      s"""coalesce(list_min([i for i in range(0, 16)
         |    IF ('0x' || substr(md5('$salt:' || cell || ':' || CAST(i AS VARCHAR)),
         |      1, 15))::BIGINT % 2 = 0]), 16)""".stripMargin
    def branch(r: Int, where: String) =
      s"""SELECT CAST($r AS BIGINT) AS release, segment, b, n,
         |  CAST(${draw(s"g1r$r")} - ${draw(s"g2r$r")} AS BIGINT) AS z,
         |  CAST(n + ${draw(s"g1r$r")} - ${draw(s"g2r$r")} AS BIGINT) AS noisy,
         |  CAST(${dpEpsTotal(r + 1)} AS DOUBLE) AS eps_total
         |FROM (SELECT segment, b, n,
         |    segment || '|' || CAST(b AS VARCHAR) AS cell
         |  FROM (SELECT c_mktsegment AS segment,
         |      CAST(floor(c_acctbal / 1000) AS BIGINT) AS b,
         |      CAST(count(*) AS BIGINT) AS n
         |    FROM customer $where GROUP BY 1, 2)) h""".stripMargin
    s"""SELECT * FROM (
       |${branch(0, "WHERE c_custkey % 2 = 0")}
       |UNION ALL
       |${branch(1, "")}
       |) ORDER BY release, segment, b""".stripMargin
  }

  // ------------------------------------ DP quantiles by post-processing

  /** DP QUANTILES BY POST-PROCESSING — the invariance face of the
    * family: any function of an already-released DP output is DP at
    * the SAME budget (post-processing invariance), so per-segment
    * acctbal quartiles derived from [[dpHistogram]]'s noisy release
    * (same g1/g2 salts — literally the same randomness, not a fresh
    * draw) cost zero additional ε. The released ε = ln 2 rides along
    * UNCHANGED — the auditable claim this face exists to make.
    *
    * Derivation is integer-exact end to end: noisy counts clamped at 0
    * (negatives are noise artifacts, a standard post-processing step),
    * per-segment running sums over the bucket order, and quantile q/4
    * = the first bucket where 4·cum ≥ q·total (integer form of
    * cum ≥ ceil(q·total/4) — no division anywhere). Shape: the same
    * one-pass cell aggregate, then window cumsums over |cells| rows —
    * O(cells) past the scan, nothing collects.
    */
  def dpQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("segment")).orderBy(col("b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("segment"))
    def qb(q: Int) =
      min(when(lit(4) * col("cum") >= lit(q) * col("tot"), col("b")))
        .as(s"q${q * 25}_b")
    dpNoisyHistogram(Tables.load(spark, dir, "customer"), "g1", "g2")
      .withColumn("m", greatest(col("noisy"), lit(0L)))
      .withColumn("cum", sum(col("m")).over(w))
      .withColumn("tot", sum(col("m")).over(wAll))
      .groupBy(col("segment"))
      .agg(qb(1), qb(2), qb(3), max(col("tot")).as("total_m"),
        first(lit(dpHistEps)).as("epsilon"))
      .orderBy(col("segment"))
  }

  lazy val dpQuantilesSql: String = {
    def draw(salt: String) =
      s"""coalesce(list_min([i for i in range(0, 16)
         |    IF ('0x' || substr(md5('$salt:' || cell || ':' || CAST(i AS VARCHAR)),
         |      1, 15))::BIGINT % 2 = 0]), 16)""".stripMargin
    def qb(q: Int) =
      s"CAST(min(CASE WHEN 4 * cum >= $q * tot THEN b END) AS BIGINT) AS q${q * 25}_b"
    s"""WITH h AS (SELECT c_mktsegment AS segment,
       |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS b,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM customer GROUP BY 1, 2),
       |c AS (SELECT segment, b, n,
       |    segment || '|' || CAST(b AS VARCHAR) AS cell FROM h),
       |g AS (SELECT segment, b,
       |    greatest(n + ${draw("g1")} - ${draw("g2")}, 0) AS m
       |  FROM c),
       |r AS (SELECT segment, b, m,
       |    sum(m) OVER (PARTITION BY segment ORDER BY b) AS cum,
       |    sum(m) OVER (PARTITION BY segment) AS tot
       |  FROM g)
       |SELECT segment, ${Seq(1, 2, 3).map(qb).mkString(", ")},
       |  CAST(max(tot) AS BIGINT) AS total_m,
       |  CAST($dpHistEps AS DOUBLE) AS epsilon
       |FROM r GROUP BY segment ORDER BY segment""".stripMargin
  }

  // ------------------------------ thresholded (unknown-domain) DP release

  /** Release threshold τ for [[dpThresholdRelease]] and the δ it buys:
    * a bin with a SINGLE contributor is published only if its noisy
    * count 1 + Z reaches τ, i.e. Z ≥ τ − 1; for the two-sided
    * geometric(1/2) noise P(Z ≥ t) = 2^−(t−1)/3 (t ≥ 1), so
    * δ = 2^−(τ−2)/3 = 1/384 at τ = 9 — exact dyadic-over-3 rational,
    * inlined as the same 6-decimal literal in both faces (the
    * p_at_tau convention; no libm anywhere).
    */
  private val dpThresholdTau = 9L
  private val dpThresholdDelta: Double =
    (BigDecimal(1) / BigDecimal(384))
      .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble

  /** UNKNOWN-DOMAIN DP release — the thresholded "stability histogram"
    * (Korolova et al. WWW'09; Bun–Nissim–Stemmer), the one mechanism
    * class the privacy family still lacked: [[dpHistogram]] releases a
    * KNOWN domain (every (segment, bucket) name is public), but when
    * the bin names themselves are data — here the (nation, segment)
    * cells actually present — publishing an empty-vs-missing
    * distinction leaks membership. The fix is the standard (ε, δ)
    * recipe: add the same per-cell geometric noise, then publish ONLY
    * cells whose noisy count clears τ, and do NOT publish the exact
    * count next to it (the release is the noisy value alone — the one
    * face where `n` must stay out-of-band).
    *
    * δ = P(a singleton bin is ever released) = 2^−(τ−2)/3 (exact; see
    * [[dpThresholdDelta]]); ε = ln 2 as everywhere in the family. Both
    * constants ride the release in-band so the budget is auditable.
    *
    * Shape: one customer pass into the (nation, segment) cell
    * aggregate (map-side combined), 2×16 portable-hash draws per CELL
    * — O(cells) noise work, never O(rows); the threshold is a filter,
    * nothing joins, nothing collects.
    */
  def dpThresholdRelease(spark: SparkSession, dir: String): DataFrame = {
    val cell = concat_ws("|", col("nation").cast(StringType), col("segment"))
    Tables.load(spark, dir, "customer")
      .select(col("c_nationkey").cast(LongType).as("nation"),
        col("c_mktsegment").as("segment"))
      .groupBy(col("nation"), col("segment"))
      .agg(count(lit(1)).as("n"))
      .withColumn("noisy",
        col("n") + (dpGeomDraw("t1", cell) - dpGeomDraw("t2", cell))
          .cast(LongType))
      .filter(col("noisy") >= dpThresholdTau)
      .select(col("nation"), col("segment"), col("noisy"),
        lit(dpHistEps).as("epsilon"), lit(dpThresholdDelta).as("delta"))
      .orderBy(col("nation"), col("segment"))
  }

  lazy val dpThresholdReleaseSql: String = {
    def draw(salt: String) =
      s"""coalesce(list_min([i for i in range(0, 16)
         |    IF ('0x' || substr(md5('$salt:' || cell || ':' || CAST(i AS VARCHAR)),
         |      1, 15))::BIGINT % 2 = 0]), 16)""".stripMargin
    s"""WITH h AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
       |    c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n
       |  FROM customer GROUP BY 1, 2),
       |c AS (SELECT nation, segment, n,
       |    CAST(nation AS VARCHAR) || '|' || segment AS cell FROM h),
       |g AS (SELECT nation, segment,
       |    CAST(n + ${draw("t1")} - ${draw("t2")} AS BIGINT) AS noisy
       |  FROM c)
       |SELECT nation, segment, noisy,
       |  CAST($dpHistEps AS DOUBLE) AS epsilon,
       |  CAST($dpThresholdDelta AS DOUBLE) AS delta
       |FROM g WHERE noisy >= $dpThresholdTau ORDER BY 1, 2""".stripMargin
  }

  // ------------------------------------- streaming bottom-k uniform sample

  /** STREAMING bounded uniform sample face (q_sample_stream): doc_ids
    * split into two micro-batches by the deterministic doc_id % 2
    * rule, fed through [[graft.streaming.SampleStream]] (k = 32) with
    * a kill-and-resume between them, every committed sample version
    * re-read from the versioned outputs. Version 0 is the bottom-k of
    * the even half; version 1 — by the min-k fold property
    * bottom-k(bottom-k(A) ∪ B) = bottom-k(A ∪ B) — is the GLOBAL
    * bottom-k, which is exactly what the oracle computes closed-form
    * from the documents table; the engine must get there through the
    * bounded k-row state chain.
    */
  def sampleStreamMaterialize(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.ops.StageOnce.tmp("sample_stream", dir)
    val state = s"$root/state"
    graft.ops.StageOnce(root) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ids = Tables.load(spark, dir, "documents")
        .select(col("doc_id").cast(LongType)).orderBy(col("doc_id"))
        .as[Long].collect()
      val (even, odd) = ids.partition(_ % 2 == 0)
      val ckpt = graft.ops.StageOnce.tmp("sample_stream_ckpt", dir)
      val mem = MemoryStream[Long]
      def start() = graft.streaming.SampleStream.start(
        mem.toDS().toDF("doc_id"), state, ckpt, k = 32)
      val q1 = start()
      try {
        mem.addData(even.toIndexedSeq: _*)
        q1.processAllAvailable()
      } finally q1.stop()
      val q2 = start() // kill-and-resume from the checkpoint
      try {
        mem.addData(odd.toIndexedSeq: _*)
        q2.processAllAvailable()
      } finally q2.stop()
    }
    graft.streaming.SampleStream.samples(spark, state)
  }

  /** Stream-sample oracle: per version, the bottom-32 of the covered
    * id set by (hash60, doc_id) — version 0 the even half, version 1
    * everyone (the min-k fold collapses the chain to the global
    * answer).
    */
  lazy val sampleStreamSql: String = {
    def branch(v: Int, where: String) =
      s"""SELECT CAST($v AS BIGINT) AS version, rank, doc_id, h FROM (
         |  SELECT row_number() OVER (ORDER BY h, doc_id) AS rank, doc_id, h
         |  FROM (SELECT doc_id,
         |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
         |    FROM documents $where))
         |WHERE rank <= 32""".stripMargin
    s"""SELECT * FROM (
       |${branch(0, "WHERE doc_id % 2 = 0")}
       |UNION ALL
       |${branch(1, "")}
       |) ORDER BY version, rank""".stripMargin
  }

  val dpRandomizedResponseSql: String =
    s"""WITH r AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
       |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS t,
       |    CASE WHEN ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))
       |        ::BIGINT % 4 < 3
       |      THEN CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
       |      ELSE CASE WHEN c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END
       |    END AS rep
       |  FROM customer)
       |SELECT nation, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(t) AS BIGINT) AS true_yes,
       |  CAST(sum(rep) AS BIGINT) AS reported_yes,
       |  CAST(4 * sum(rep) - count(*) AS DOUBLE) / 2 AS est
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
}
