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
