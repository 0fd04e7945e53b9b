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
}
