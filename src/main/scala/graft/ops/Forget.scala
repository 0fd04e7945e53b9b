package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The FORGET CASCADE — deletion propagation through the staged index
  * artifacts (the GDPR/right-to-be-forgotten path every production
  * corpus needs; the reference has nothing like it, but any engine
  * curating web data at 100 TB does). The incremental contract so far
  * covered APPEND (per-segment posting/index writes ∝ delta) and
  * MAINTENANCE (per-bucket compaction); this is the missing third leg:
  * DELETE, without rebuilding anything corpus-sized.
  *
  * Design (the Lucene `.del` model, which is also how Delta/Iceberg
  * deletion vectors work): one forget request produces a TOMBSTONE set
  * of doc_ids (broadcast-class — |requests|, never corpus-sized). Every
  * artifact derived from the corpus then serves reads THROUGH the
  * tombstones:
  *
  *  - the trigram posting index anti-joins its pruned posting read
  *    against the broadcast tombstones ([[TrigramIndex.likeScanAt]]),
  *    so a forgotten doc can never be a candidate — probe overhead
  *    ∝ |tombstones|, zero index bytes rewritten;
  *  - the exact-dedup digest artifact (content-hash table backing the
  *    ingest gate) drops tombstoned rows the same way, which RETRACTS
  *    the digests: a re-crawl of a forgotten doc must now be ADMITTED
  *    (nothing blocks its content any more) unless a RETAINED doc
  *    still carries the same text — forgetting one copy must not
  *    unblock content another lawful copy still holds, and the face
  *    proves both directions;
  *  - physical purge is NOT a separate corpus job: it rides routine
  *    per-bucket compaction ([[SegmentCompaction.compactBucket]] with
  *    the tombstone hook), so bytes leave the index at maintenance
  *    cost ∝ the touched bucket, and searches cannot tell (the
  *    probe-time anti-join already hid those rows; spec-pinned).
  *
  * Correctness contract, both faces hash-gated: a tombstoned artifact
  * must answer EXACTLY as the same artifact rebuilt from the filtered
  * corpus — the oracle IS that rebuilt-from-scratch derivation.
  */
object Forget {

  /** The forget request: doc_id % 23 == 5 (~4% of the corpus, hits
    * every SF deterministically and overlaps both trigram index
    * segments — base and d1 — so the tombstone filter provably crosses
    * segment boundaries).
    */
  def tombstones(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 23 === 5)
      .select(col("doc_id"))

  private val forgottenPred = "doc_id % 23 = 5"

  // ------------------------------------------------------ index face

  /** q_forget_index: the segmented trigram LIKE index (base + d1
    * crawl segments, exactly the q_trgm_like_incr layout) searched
    * AFTER the forget request, tombstones applied at probe time. Per
    * pattern: candidates and verified matches — which must equal a
    * search over an index rebuilt from the corpus minus the forgotten
    * docs (the oracle's derivation).
    */
  def forgetIndex(spark: SparkSession, dir: String): DataFrame =
    TrigramIndex.likeScanAt(spark, dir,
      TrigramIndex.stagedIncremental(spark, dir),
      Some(tombstones(spark, dir)))

  lazy val forgetIndexSql: String = TrigramIndex.likeScanSqlOver(
    s"(SELECT * FROM documents WHERE NOT ($forgottenPred)) fsrc")

  // --------------------------------------------------- postings face

  /** q_forget_postings: exact phrase search over the SEGMENTED
    * positional inverted index ([[InvertedIndex.stagedIncremental]],
    * the q_phrase_search_incr layout) after the forget request —
    * tombstones anti-joined at probe time on the first phrase leg
    * (the positional equi-join starves the other legs), zero index
    * bytes rewritten. Must equal a phrase search over an index rebuilt
    * from the filtered corpus — the oracle's derivation. Physical
    * purge rides [[SegmentCompaction.compactBucket]] with the
    * tombstone hook, exactly as the trigram index (spec-pinned:
    * untouched buckets byte-identical, search invariant).
    */
  def forgetPostings(spark: SparkSession, dir: String): DataFrame =
    InvertedIndex.phraseSearchAt(spark,
      InvertedIndex.stagedIncremental(spark, dir),
      phrase = Seq("table", "hash"), k = 20,
      tombstones = Some(tombstones(spark, dir)))

  lazy val forgetPostingsSql: String = InvertedIndex.phraseSearchSqlOver(
    s"(SELECT * FROM documents WHERE NOT ($forgottenPred)) psrc")

  // ------------------------------------------------------ stream face

  /** The streamed request waves: the standing forget set (doc_id % 23
    * == 5) arrives as wave 1, a second erasure wave (doc_id % 29 == 3)
    * later — two genuinely different batches, so the stream face's
    * final state differs from every batch face's.
    */
  private val wave2Pred = "doc_id % 29 = 3"

  /** q_forget_stream: the trigram LIKE index probed through the
    * tombstone set ACCUMULATED BY A STREAM of erasure requests
    * ([[graft.streaming.ForgetStream]] — two request waves fed as
    * micro-batches with a kill-and-resume between them, replayed-batch
    * convergence exercised by the spec). The probe must equal a search
    * over an index rebuilt from the corpus minus BOTH waves — the
    * oracle's derivation; per-wave visibility (wave 1's deletes hide
    * docs before wave 2 arrives) is spec territory.
    */
  def forgetStreamMaterialize(spark: SparkSession, dir: String): DataFrame = {
    val root = StageOnce.tmp("forget_stream", dir)
    val state = s"$root/state"
    StageOnce(root) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val docs = Tables.load(spark, dir, "documents")
      val wave1 = docs.filter(col("doc_id") % 23 === 5)
        .select(col("doc_id")).orderBy(col("doc_id"))
        .as[Long].collect()
      val wave2 = docs.filter(col("doc_id") % 29 === 3)
        .select(col("doc_id")).orderBy(col("doc_id"))
        .as[Long].collect()
      val ckpt = StageOnce.tmp("forget_stream_ckpt", dir)
      val mem = MemoryStream[Long]
      def start() = graft.streaming.ForgetStream.start(
        mem.toDS().toDF("doc_id"), state, ckpt)
      val q1 = start()
      try {
        mem.addData(wave1.toIndexedSeq: _*)
        q1.processAllAvailable()
      } finally q1.stop()
      val q2 = start() // kill-and-resume from the checkpoint
      try {
        mem.addData(wave2.toIndexedSeq: _*)
        q2.processAllAvailable()
      } finally q2.stop()
    }
    TrigramIndex.likeScanAt(spark, dir,
      TrigramIndex.stagedIncremental(spark, dir),
      Some(graft.streaming.ForgetStream.tombstones(spark, state)))
  }

  lazy val forgetStreamSql: String = TrigramIndex.likeScanSqlOver(
    s"(SELECT * FROM documents WHERE NOT ($forgottenPred) " +
      s"AND NOT ($wave2Pred)) fssrc")

  // ---------------------------------------------------- minhash sigs

  /** Number of hash buckets in the signature/fingerprint artifacts —
    * same role as [[digestBuckets]]: the purge demo rewrites one
    * bucket and pins every other byte-untouched.
    */
  private[graft] val sigBuckets = 16

  /** Staged corpus MINHASH SIGNATURE artifact — the probe side a
    * 100 TB LSH ingest gate persists instead of re-hashing the corpus
    * per batch ([[graft.queries.LlmOps.dedupIncrementalLsh]] computes
    * it inline; this is its artifact form). Layout is the house
    * incremental-index shape: `seg=base` (the standing corpus) +
    * `seg=d1` (a crawl delta appended later, cost ∝ delta), each
    * bucket-partitioned by pmod(doc_id, 16) so per-bucket compaction
    * — and the tombstone purge that rides it — touches one bucket's
    * files only.
    */
  private[graft] def stagedSigs(spark: SparkSession, dir: String): String = {
    val path = StageOnce.tmp("forget_sigs", dir)
    StageOnce(path) {
      val corpus = Tables.load(spark, dir, "documents")
        .filter(col("doc_id") % 10 =!= 0) // the incremental family's corpus side
      def seg(docs: DataFrame, name: String): Unit =
        Dedup.minHash(docs, col("doc_id"), col("text"), n = 3, k = 16)
          .withColumn("bucket", pmod(col("doc_id"), lit(sigBuckets.toLong)))
          .repartition(col("bucket"))
          .sortWithinPartitions(col("doc_id"))
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$path/seg=$name")
      seg(corpus.filter(col("doc_id") % 20 =!= 1), "base")
      seg(corpus.filter(col("doc_id") % 20 === 1), "d1")
    }
    path
  }

  /** q_forget_sigs: the incremental LSH near-dup gate probed THROUGH
    * tombstones — batch signatures (doc_id % 10 == 0, computed fresh;
    * a delta is new data by definition) band-joined against the staged
    * corpus signature artifact minus the forgotten docs, then exact
    * Jaccard-verified. Must equal the gate run against signatures
    * rebuilt from the filtered corpus (the oracle re-derives the whole
    * minhash chain over it). The anti-join is |tombstones|-broadcast;
    * the artifact is read pruned, never rewritten.
    */
  def forgetSigs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val art = spark.read.parquet(stagedSigs(spark, dir))
      .select(col("doc_id") +: (0 until 16).map(i => col(s"m$i")): _*)
    val corpusSig = art.join(broadcast(tombstones(spark, dir)),
      Seq("doc_id"), "left_anti")
    val batchSig = Dedup.minHash(docs.filter(col("doc_id") % 10 === 0),
      col("doc_id"), col("text"), n = 3, k = 16)
    val cand = Dedup.crossLshCandidates(batchSig, corpusSig,
      bands = 4, rowsPerBand = 4)
    Dedup.jaccardVerify(cand, docs, col("doc_id"), col("text"),
      n = 3, threshold = 0.5)
  }

  // ----------------------------------------------- winnow fingerprints

  /** Staged corpus WINNOW FINGERPRINT artifact — the probe side of
    * [[graft.queries.LlmOps.winnowIncrPairs]] persisted (at 100 TB the
    * corpus fingerprint table is maintained, not recomputed per
    * batch). Same segmented layout as [[stagedSigs]], bucketed by
    * pmod(fp, 16) — fingerprint-keyed, because that is the probe key.
    */
  private[graft] def stagedWinnowFps(spark: SparkSession, dir: String): String = {
    val path = StageOnce.tmp("forget_winnow", dir)
    StageOnce(path) {
      val corpus = Tables.load(spark, dir, "documents")
        .filter(col("doc_id") % 10 =!= 0)
      def seg(docs: DataFrame, name: String): Unit =
        docs.select(col("doc_id"),
            explode(graft.functions.GraftFunctions
              .winnowHashes(col("text"), 5, 4)).as("fp"))
          .withColumn("bucket", pmod(col("fp"), lit(sigBuckets.toLong)))
          .repartition(col("bucket"))
          .sortWithinPartitions(col("fp"), col("doc_id"))
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$path/seg=$name")
      seg(corpus.filter(col("doc_id") % 20 =!= 1), "base")
      seg(corpus.filter(col("doc_id") % 20 === 1), "d1")
    }
    path
  }

  /** q_forget_winnow: the winnow ingest gate probed THROUGH
    * tombstones — fresh batch fingerprints joined against the staged
    * corpus fingerprint artifact minus the forgotten docs. Must equal
    * [[graft.queries.LlmOps.winnowIncrPairs]] run over the filtered
    * corpus (the oracle's derivation). The winnowing recall guarantee
    * is untouched: it is per-(batch doc, corpus doc) and forgetting a
    * corpus doc only removes ITS pairs.
    */
  def forgetWinnow(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val corpusFps = spark.read.parquet(stagedWinnowFps(spark, dir))
      .select(col("doc_id"), col("fp"))
      .join(broadcast(tombstones(spark, dir)), Seq("doc_id"), "left_anti")
    val batchFps = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions
          .winnowHashes(col("text"), 5, 4)).as("fp"))
    batchFps.as("a").join(corpusFps.as("b"), col("a.fp") === col("b.fp"))
      .groupBy(col("a.doc_id").as("doc_batch"),
        col("b.doc_id").as("doc_corpus"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
  }

  // ------------------------------------------------------ dedup face

  /** The staged digest artifact backing the exact ingest gate: one
    * (h, doc_id) row per corpus doc, bucket-partitioned by digest hash
    * so the purge demo can rewrite one bucket and pin every other
    * byte-untouched. Counts as a declared staged input (build-once /
    * probe-many — the artifact a 100 TB gate keeps anyway).
    */
  private[graft] val digestBuckets = 16

  private[graft] def stagedDigests(spark: SparkSession, dir: String): String = {
    val path = StageOnce.tmp("forget_digests", dir)
    StageOnce(path) {
      Tables.load(spark, dir, "documents")
        .select(sha2(col("text"), 256).as("h"), col("doc_id"))
        .withColumn("bucket", pmod(Dedup.hash60(col("h")), lit(digestBuckets)))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(path)
    }
    path
  }

  /** q_forget_dedup: the ingest gate probed by two re-crawl classes,
    * BEFORE and AFTER the digest retraction, in one result:
    *
    *  - `recrawl_forgotten`: the forgotten docs re-arriving under new
    *    ids. dup_pre = n_batch (their own digests blocked them);
    *    post-forget only those whose text survives in a RETAINED doc
    *    stay blocked — the rest are admitted, which is the whole point
    *    of the retraction;
    *  - `recrawl_retained`: retained docs re-arriving (doc_id % 20 == 5
    *    outside the forget set). Blocked before AND after — the forget
    *    of unrelated docs must not loosen the gate.
    *
    * Digest sets are distinct-aggregated before the probe joins (a
    * digest shared by many corpus docs must flag a batch doc once, not
    * fan it out), and the shuffled payload is 64-hex digests only,
    * never text. Oracle rebuilds both digest sets from the (filtered)
    * corpus from scratch.
    */
  def forgetDedup(spark: SparkSession, dir: String): DataFrame = {
    val art = spark.read.parquet(stagedDigests(spark, dir))
    val ts = tombstones(spark, dir)
    val preH = art.select(col("h")).distinct()
      .withColumn("pre", lit(1L))
    val postH = art.join(broadcast(ts), Seq("doc_id"), "left_anti")
      .select(col("h")).distinct()
      .withColumn("post", lit(1L))
    val docs = Tables.load(spark, dir, "documents")
    val batch = docs.filter(col("doc_id") % 23 === 5)
      .select(lit("recrawl_forgotten").as("class"),
        (col("doc_id") + 2000000L).as("doc_id"), col("text"))
      .unionByName(docs
        .filter(col("doc_id") % 23 =!= 5 && col("doc_id") % 20 === 5)
        .select(lit("recrawl_retained").as("class"),
          (col("doc_id") + 3000000L).as("doc_id"), col("text")))
    batch.select(col("class"), sha2(col("text"), 256).as("h"))
      .join(preH, Seq("h"), "left")
      .join(postH, Seq("h"), "left")
      .groupBy(col("class"))
      .agg(count(lit(1)).as("n_batch"),
        coalesce(sum(col("pre")), lit(0L)).as("dup_pre"),
        coalesce(sum(col("post")), lit(0L)).as("dup_post"),
        sum(when(col("post").isNull, 1L).otherwise(0L)).as("n_admitted_post"))
      .orderBy(col("class"))
  }

  lazy val forgetDedupSql: String =
    s"""WITH batch AS (
       |  SELECT 'recrawl_forgotten' AS class, doc_id + 2000000 AS doc_id, text
       |  FROM documents WHERE $forgottenPred
       |  UNION ALL
       |  SELECT 'recrawl_retained', doc_id + 3000000, text
       |  FROM documents WHERE NOT ($forgottenPred) AND doc_id % 20 = 5),
       |pre AS MATERIALIZED (SELECT DISTINCT sha256(text) AS h FROM documents),
       |post AS MATERIALIZED (
       |  SELECT DISTINCT sha256(text) AS h FROM documents
       |  WHERE NOT ($forgottenPred)),
       |probe AS (SELECT class, sha256(text) AS h FROM batch)
       |SELECT b.class, CAST(count(*) AS BIGINT) AS n_batch,
       |  CAST(sum(CASE WHEN p.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS dup_pre,
       |  CAST(sum(CASE WHEN q.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS dup_post,
       |  CAST(sum(CASE WHEN q.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_admitted_post
       |FROM probe b
       |LEFT JOIN pre p ON p.h = b.h
       |LEFT JOIN post q ON q.h = b.h
       |GROUP BY 1 ORDER BY 1""".stripMargin
}
