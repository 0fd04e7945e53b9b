package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.LongType

import graft.functions.GraftFunctions

/** Streaming blocklist ADMISSION/REDACTION — the
  * [[graft.queries.LlmOps.blocklistMask]] action running where it
  * belongs in production: on the ingest path, inside foreachBatch,
  * masking every arriving document before it is admitted (the
  * PII/banned-phrase filter is an admission gate, not a batch
  * afterthought). Each micro-batch runs the Aho-Corasick automaton
  * once per document — mask, covered-count, and a residual re-scan of
  * its own masked output (the in-result proof that no pattern
  * survives) — and lands the per-doc census rows under
  * `out/batch=<batchId>`.
  *
  * Exactly-once without sink transactions: redaction is STATELESS per
  * document, so a batch's output depends only on its own input rows;
  * the per-batch directory OVERWRITE makes checkpoint-recovery's
  * at-least-once replay idempotent (the [[CdcStream]] argument with no
  * generation chain needed — there is no cross-batch state at all).
  *
  * Scale shape: the automaton is plan-built once per incremental
  * execution and broadcast-class (~few MB for a 10k-phrase lexicon);
  * per-batch work is one map-only pass over the batch — no shuffle
  * inside the stream; the converged report is one (source)-keyed
  * aggregate over batch-census rows.
  */
object BlocklistStream extends Serializable {

  def start(docs: DataFrame, root: String, checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        fold(batch, root, batchId)
      }
      .start()

  /** One admission step (visible for the replay-idempotence spec):
    * mask, count covered bytes from the automaton's own frontier walk
    * (never by counting '#' in the output), and re-scan the masked
    * text for residual hits.
    */
  def fold(batch: DataFrame, root: String, batchId: Long): Unit = {
    val pats = graft.queries.LlmOps.blocklistPatterns
    batch.select(col("source"),
        GraftFunctions.acMask(col("text"), pats).as("m"),
        length(col("text")).as("len"),
        GraftFunctions.acMaskedCount(col("text"), pats).as("hid"))
      .select(col("source"), col("len"), col("hid"),
        aggregate(GraftFunctions.acCounts(col("m"), pats),
          lit(0L), (a, x) => a + x).as("residual"))
      .write.mode("overwrite").parquet(s"$root/out/batch=$batchId")
  }

  /** The converged census over every admitted batch —
    * column-identical to the batch face (docs_redacted, masked_chars,
    * total_chars, residual_hits per source).
    */
  def report(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/out")
      .groupBy(col("source"))
      .agg(sum(when(col("hid") > 0, 1L).otherwise(0L)).as("docs_redacted"),
        sum(col("hid")).as("masked_chars"),
        sum(col("len").cast(LongType)).as("total_chars"),
        sum(col("residual")).as("residual_hits"))
      .orderBy(col("source"))
}
