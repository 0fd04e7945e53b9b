package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.LlmOps

/** Streaming face of the e2e ingest gate (`q_ingest_gate_e2e`): crawl
  * deltas arrive as micro-batches of (doc_id, text); each batch runs
  * the SAME four-gate admission the batch face runs ([[LlmOps]] —
  * exact digest > LSH+Jaccard > winnow > embedding, first gate wins)
  * against the staged corpus artifacts, then REFRESHES the digest set
  * with what it admitted — so batch N+1's exact gate sees batch N's
  * admissions: the cross-batch dedup that makes a crawl stream converge
  * instead of re-admitting the same page on every fetch.
  *
  * State model, chosen for the 100 TB shape:
  * - The DIGEST set is the only per-batch-maintained artifact — an
  *   append-only set union, cost ∝ delta, written as a versioned chain
  *   (`digests_v<batchId>`), each version derived from the latest
  *   version below it. The near-dup artifacts (minhash sigs, winnow
  *   fps) refresh on a maintenance cadence instead (compaction-style,
  *   like the IVF index's append+compact) — re-banding the corpus per
  *   micro-batch would be a corpus-sized job on a delta-sized trigger.
  * - Exactly-once by CONVERGENCE, the [[CdcStream]] argument: a
  *   replayed micro-batch recomputes identical verdicts against the
  *   same predecessor version (the chain is keyed by batchId, so a
  *   replay reads the same `digests_v<prev>`, not its own output) and
  *   overwrites `verdicts_v<id>` / `digests_v<id>` with identical
  *   content. At-least-once delivery + idempotent versioned writes =
  *   exactly-once visible state.
  */
object IngestGateStream {

  /** The digest set visible to `batchId`: the base generation's
    * digests ∪ every SEGMENT written by batches strictly below it.
    * Segments are append-only and ∝ their batch (admitted hashes are
    * by definition not in any predecessor — the exact gate just said
    * so), so the union is a plain multi-path parquet read: per-batch
    * digest maintenance never rewrites the corpus-sized set. Replay
    * safety falls out of the `< batchId` cut: a replayed batch reads
    * the same predecessor segments, never its own output.
    */
  private def predecessorDigests(spark: SparkSession, g: String,
      stateDir: String, batchId: Long): DataFrame = {
    val segs = Option(new java.io.File(stateDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("digests_v"))
      .map(_.getName.stripPrefix("digests_v").toLong)
      .filter(_ < batchId).sorted
      .map(b => s"$stateDir/digests_v$b")
    spark.read.parquet((s"$g/digests" +: segs.toSeq): _*)
  }

  /** Admit ONE micro-batch: verdicts against the chained digest state,
    * versioned outputs, APPEND-ONLY digest maintenance — the batch
    * writes a segment holding only ITS admitted hashes (cost ∝ delta;
    * the growing segment count is what [[compactArtifacts]] collapses
    * on the maintenance cadence). Returns the verdicts (re-read from
    * the written version, so callers observe exactly what was
    * committed).
    */
  def admitBatch(spark: SparkSession, dir: String, g: String,
      delta: DataFrame, stateDir: String, batchId: Long): DataFrame = {
    val prev = predecessorDigests(spark, g, stateDir, batchId)
    val verdicts = LlmOps.gateVerdictsOver(spark, dir, g, delta, Some(prev))
    verdicts.write.mode("overwrite")
      .parquet(s"$stateDir/verdicts_v$batchId")
    val admitted = delta.join(
      spark.read.parquet(s"$stateDir/verdicts_v$batchId")
        .filter(col("verdict") === "admitted").select("doc_id"),
      Seq("doc_id"), "left_semi")
    // persist what was admitted — the corpus delta this batch
    // contributes, and compaction's input
    admitted.select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(s"$stateDir/admitted_v$batchId")
    // the batch's digest SEGMENT: only its own admitted hashes
    spark.read.parquet(s"$stateDir/admitted_v$batchId")
      .select(sha2(col("text"), 256).as("h")).distinct()
      .write.mode("overwrite").parquet(s"$stateDir/digests_v$batchId")
    graft.ops.CacheBin.releaseAll()
    spark.read.parquet(s"$stateDir/verdicts_v$batchId")
  }

  /** Fold everything admitted up to `upToBatch` into a NEW artifacts
    * generation — the maintenance-cadence refresh of the near-dup
    * indexes (minhash signatures, winnow fingerprints) that the
    * per-batch path deliberately leaves alone (re-banding the corpus
    * per micro-batch would be a corpus-sized job on a delta-sized
    * trigger; the digest chain alone protects against EXACT re-crawls
    * in between). After compaction, gates run against the generation
    * dir — near-dup protection now covers the admitted stream docs too.
    *
    * The generation is immutable (`artifacts_v<upTo>/`): sigs/fps/
    * digests/texts are the old index ∪ the admitted contributions,
    * MATERIALIZED — compaction is deliberately the corpus-sized
    * sequential rewrite (one scan + one write, no shuffle of the old
    * index beyond the write), amortized by running it on a maintenance
    * cadence, exactly like parquet OPTIMIZE/compaction jobs; it is the
    * collapse point for the append-only per-batch digest segments,
    * which is what keeps the HOT path (admitBatch) ∝ delta. Idempotent:
    * deterministic inputs, overwrite writes — a replayed compaction
    * converges byte-for-byte.
    */
  def compactArtifacts(spark: SparkSession, dir: String, g: String,
      stateDir: String, upToBatch: Long): String = {
    val gen = s"$stateDir/artifacts_v$upToBatch"
    val batches = Option(new java.io.File(stateDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("admitted_v"))
      .map(_.getName.stripPrefix("admitted_v").toLong)
      .filter(_ <= upToBatch).sorted
    require(batches.nonEmpty, s"nothing admitted up to batch $upToBatch")
    val admitted = batches.map(b =>
        spark.read.parquet(s"$stateDir/admitted_v$b"))
      .reduce(_ unionByName _)
    graft.ops.Dedup.minHash(admitted, col("doc_id"), col("text"), n = 3, k = 16)
      .unionByName(spark.read.parquet(s"$g/sigs"))
      .write.mode("overwrite").parquet(s"$gen/sigs")
    admitted.select(col("doc_id").as("corpus_id"),
        explode(graft.functions.GraftFunctions
          .winnowHashes(col("text"), 5, 4)).as("fp"))
      .unionByName(spark.read.parquet(s"$g/fps"))
      .write.mode("overwrite").parquet(s"$gen/fps")
    predecessorDigests(spark, g, stateDir, upToBatch + 1)
      .write.mode("overwrite").parquet(s"$gen/digests")
    LlmOps.artifactTexts(spark, dir, g).unionByName(admitted)
      .write.mode("overwrite").parquet(s"$gen/texts")
    gen
  }

  /** Wire the admission to a streaming delta: one [[admitBatch]] per
    * non-empty micro-batch, checkpointed so restart resumes the version
    * chain where it left off.
    */
  def start(delta: DataFrame, dir: String, g: String, stateDir: String,
      checkpoint: String): StreamingQuery =
    delta.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          admitBatch(batch.sparkSession, dir, g, batch, stateDir, batchId)
        }
        ()
      }
      .start()
}
