package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Positional inverted index over the corpus — the build-once /
  * query-many retrieval artifact (the lexical sibling of the persisted
  * IVF index in [[Similarity]]), plus exact phrase search over it.
  *
  * Build: ONE corpus-sized pass (posexplode of the whitespace tokens)
  * written term-bucket-partitioned — 16 directory partitions keyed by
  * the first hex digit of md5(term), rows sorted within partitions by
  * (term, doc_id, pos) so parquet row-group min/max statistics prune
  * within a bucket too. At 100 TB the build is the standard one-off
  * index investment: one shuffle-write, partitioned so that EVERY
  * later query prunes to the buckets of its own terms.
  *
  * Query: an n-term phrase reads n bucket-pruned, term-pushed scans
  * (each ∝ df(term), never corpus-sized), normalizes each posting to
  * the phrase-start position it implies (pos - i), and equi-joins on
  * (doc_id, start) — the classic positional-intersection plan. The
  * join shuffles only the n term posting lists; at 100 TB that is
  * df(term) rows against a corpus of trillions of tokens.
  *
  * The md5-hex bucket function is chosen for cross-engine exactness:
  * md5 produces the same lowercase hex in Spark and DuckDB, so the
  * oracle derives bucket assignment — and therefore the whole
  * q_index_stats face — bit-identically without replicating Spark's
  * internal hash.
  */
object InvertedIndex {

  /** First hex digit of md5(term): 16 stable, engine-portable buckets. */
  def bucket(term: Column): Column = substring(md5(term), 1, 1)

  /** (term, doc_id, pos, bucket) postings for every whitespace token.
    * pos is 0-based token position within the document.
    */
  def postings(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "term")))
      .select(col("term"), col("doc_id"), col("pos"), bucket(col("term")).as("bucket"))

  /** Build the index at `path`, partitioned by bucket and sorted
    * within partitions for row-group pruning on term.
    */
  def write(docs: DataFrame, path: String): Unit =
    postings(docs)
      .repartition(col("bucket"))
      .sortWithinPartitions(col("term"), col("doc_id"), col("pos"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Stage the index for `dir`'s documents table once per (process,
    * corpus generation) — same contract as the IVF index.
    */
  def staged(spark: SparkSession, dir: String): String = {
    val path = StageOnce.tmp("inverted_index", dir)
    StageOnce(path) { write(Tables.load(spark, dir, "documents"), path) }
    path
  }

  /** Exact phrase search THROUGH the index: top-k docs by phrase
    * occurrence count. Each term's postings arrive via a
    * bucket-partition-pruned, term-filter-pushed scan; position
    * normalization (start = pos - i) turns phrase adjacency into a
    * plain equi-join on (doc_id, start).
    */
  def phraseSearch(spark: SparkSession, dir: String,
      phrase: Seq[String] = Seq("table", "hash"), k: Int = 20): DataFrame =
    phraseSearchAt(spark, staged(spark, dir), phrase, k)

  /** The search core over an index path — monolithic or segmented:
    * partition discovery exposes whatever directory keys the layout
    * has (a flat bucket=… tree, or the two-level seg=…/bucket=… one),
    * and the bucket filter prunes directories in EITHER layout, so the
    * same plan serves both.
    */
  def phraseSearchAt(spark: SparkSession, idx: String,
      phrase: Seq[String], k: Int,
      tombstones: Option[DataFrame] = None): DataFrame = {
    require(phrase.nonEmpty)
    val legs = phrase.zipWithIndex.map { case (t, i) =>
      spark.read.parquet(idx)
        // bucket literal → directory partition pruning; term literal →
        // parquet row-group pruning via the within-partition sort
        .filter(col("bucket") === lit(bucketOfLiteral(t)) && col("term") === lit(t))
        .select(col("doc_id"), (col("pos") - lit(i)).as("start"))
    }
    // Forget-cascade hook ([[Forget]]): tombstoned docs are hidden at
    // probe time by ONE broadcast anti-join on the first leg — the
    // positional equi-join on doc_id then starves their rows from
    // every other leg, so no second filter is needed and the pruned
    // posting reads themselves are unchanged (zero index bytes touch).
    val first = tombstones.fold(legs.head)(t =>
      legs.head.join(broadcast(t.select(col("doc_id"))),
        Seq("doc_id"), "left_anti"))
    (first +: legs.tail).reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("doc_id"))
      .limit(k)
  }

  // ------------------------------------------------- incremental segments

  /** One index SEGMENT under `path/seg=<seg>` — the Lucene pattern,
    * and this engine's standing incremental contract (the ingest
    * gate's append-only digest segments, the IVF append face): a crawl
    * delta appends its own bucket-partitioned, term-sorted segment
    * — cost ∝ delta, the base is never rewritten — and readers union
    * segments via partition discovery. Per-segment overwrite makes a
    * replayed append idempotent (same bytes, same dir).
    */
  def writeSegment(docs: DataFrame, path: String, seg: String): Unit =
    postings(docs)
      .repartition(col("bucket"))
      .sortWithinPartitions(col("term"), col("doc_id"), col("pos"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/seg=$seg")

  /** Collapse all segments into one — the maintenance-cadence
    * compaction (as `IngestGateStream.compactArtifacts`): rewrites the
    * unioned postings as a fresh single segment at `out`. Search
    * results are invariant by construction (same posting multiset).
    */
  def compact(spark: SparkSession, path: String, out: String): Unit = {
    spark.read.parquet(path)
      .select(col("term"), col("doc_id"), col("pos"), col("bucket").cast("string").as("bucket"))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("term"), col("doc_id"), col("pos"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$out/seg=base")
  }

  /** Segmented staging for `dir`: a base segment over ~95% of the
    * corpus plus a crawl-delta segment (doc_id % 20 == 0) appended
    * afterwards — the incremental-build shape the one-shot [[staged]]
    * index cannot express.
    */
  def stagedIncremental(spark: SparkSession, dir: String): String = {
    val path = StageOnce.tmp("inverted_index_incr", dir)
    StageOnce(path) {
      val docs = Tables.load(spark, dir, "documents")
      writeSegment(docs.filter(col("doc_id") % 20 =!= 0), path, "base")
      writeSegment(docs.filter(col("doc_id") % 20 === 0), path, "d1")
    }
    path
  }

  /** The q_phrase_search_incr face: phrase search over base + appended
    * segment must equal the full-corpus derivation — the same
    * "artifact ≡ recomputation" gate as the IVF append/rebuild and
    * ingest-gate refresh faces (the oracle is [[phraseSearchSql]]
    * unchanged, derived straight from documents).
    */
  def phraseSearchIncr(spark: SparkSession, dir: String,
      phrase: Seq[String] = Seq("table", "hash"), k: Int = 20): DataFrame =
    phraseSearchAt(spark, stagedIncremental(spark, dir), phrase, k)

  private[graft] def bucketOfLiteral(term: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 1)
  }

  /** Index-content validation face: per-bucket distinct terms and
    * posting counts — a full-index aggregation whose oracle re-derives
    * the same numbers straight from the corpus, so a build that drops,
    * duplicates, or mis-buckets postings hash-mismatches here.
    */
  def indexStats(spark: SparkSession, dir: String): DataFrame = {
    val idx = staged(spark, dir)
    spark.read.parquet(idx)
      .groupBy(col("bucket").cast("string").as("bucket"))
      .agg(countDistinct(col("term")).as("terms"),
        count(lit(1)).as("postings"))
      .orderBy(col("bucket"))
  }

  /** Oracle: the phrase derived straight from documents — the
    * index-mediated retrieval must equal the direct corpus scan
    * (the same "artifact ≡ recomputation" contract as the IVF
    * append/rebuild and ingest-gate refresh faces). DuckDB list
    * indexing is 1-based; only position DIFFERENCES matter, so the
    * 0-based Spark postings agree.
    */
  def phraseSearchSql(phrase: Seq[String] = Seq("table", "hash"),
      k: Int = 20): String = phraseSearchSqlOver("documents", phrase, k)

  /** The same oracle over an arbitrary `(doc_id, text)` relation —
    * the forget cascade's rebuilt-from-filtered-corpus derivation
    * (the [[TrigramIndex.likeScanSqlOver]] convention).
    */
  def phraseSearchSqlOver(src: String,
      phrase: Seq[String] = Seq("table", "hash"),
      k: Int = 20): String = {
    val conds = phrase.zipWithIndex
      .map { case (t, i) => s"t[i+$i] = '$t'" }.mkString(" AND ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM $src),
       |hits AS (
       |  SELECT doc_id
       |  FROM toks, unnest([x for x in range(1, len(t) - ${phrase.length - 2})]) u(i)
       |  WHERE $conds)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS cnt
       |FROM hits GROUP BY 1 ORDER BY cnt DESC, doc_id LIMIT $k""".stripMargin
  }

  val indexStatsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      |posting AS (
      |  SELECT t[i] AS term
      |  FROM toks, unnest([x for x in range(1, len(t) + 1)]) u(i)),
      |b AS (SELECT substr(md5(term), 1, 1) AS bucket, term FROM posting)
      |SELECT bucket, CAST(count(DISTINCT term) AS BIGINT) AS terms,
      |  CAST(count(*) AS BIGINT) AS postings
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
}
