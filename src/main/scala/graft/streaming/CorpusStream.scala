package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming faces of the corpus-ingest gates (batch faces:
  * graft.ops.Dedup.incrementalExactDups).
  */
object CorpusStream {

  /** Novelty gate: pass only incoming documents whose content does NOT
    * already exist in the static corpus — a stream-static LEFT ANTI
    * join on the 32-byte content digest. The corpus side reduces to its
    * distinct hashes (planned once per micro-batch, broadcast when it
    * fits); document text never crosses the join. No streaming state:
    * the corpus is the state, which is exactly the production contract
    * (the corpus hash table is the persisted artifact the batch gate
    * uses too). Within-stream duplicates are a separate concern —
    * compose with dropDuplicatesWithinWatermark upstream when arrival
    * dups matter.
    */
  def noveltyGate(incoming: DataFrame, corpus: DataFrame,
      textCol: String = "text"): DataFrame =
    incoming.withColumn("__h", sha2(col(textCol), 256))
      .join(corpus.select(sha2(col(textCol), 256).as("__h")).distinct(),
        Seq("__h"), "left_anti")
      .drop("__h")

  /** Repetition-quality gate: drop incoming documents whose n-gram
    * repetition signals exceed the Gopher-style thresholds. Pure
    * map-side (the RepetitionStats kernel runs inside the stream's
    * scan projection, zero streaming state, zero shuffle), so the gate
    * costs the same per row in a stream as in a batch — the batch and
    * streaming faces are literally the same transform. Docs too short
    * to have a gram (null signals) pass: shortness is a different
    * gate's concern.
    */
  def qualityGate(incoming: DataFrame, textCol: String = "text",
      maxTop2: Double = 0.20, maxDup2: Double = 0.60,
      maxDup8: Double = 0.30): DataFrame = {
    val r = graft.functions.GraftFunctions
      .repetitionStats(col(textCol), nSmall = 2, nLarge = 8)
    incoming
      .withColumn("__r", r)
      .filter(
        coalesce(col("__r.top_frac") <= maxTop2, lit(true)) &&
        coalesce(col("__r.dup_frac") <= maxDup2, lit(true)) &&
        coalesce(col("__r.dup_large_frac") <= maxDup8, lit(true)))
      .drop("__r")
  }
}
