package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING FORGET — the deletion-request stream feeding the forget
  * cascade ([[graft.ops.Forget]]): GDPR erasure requests arrive as
  * micro-batches of doc_ids; each batch appends ONE tombstone segment
  * (`tombstones_v<batchId>`, cost ∝ batch — the digest-chain shape of
  * [[IngestGateStream]] applied to deletes), and every staged index
  * probe reads THROUGH the union of segments, so a delete is visible
  * to search at the NEXT probe after its batch commits — no index
  * bytes rewritten, no compaction on the request path (physical purge
  * still rides per-bucket maintenance, unchanged).
  *
  * Exactly-once by convergence: a batch's segment content is a pure
  * function of the batch (distinct ids), so an at-least-once replay
  * overwrites `tombstones_v<id>` with identical bytes; the probe-side
  * union is insensitive to segment multiplicity because tombstones are
  * a SET (anti-join semantics dedup for free).
  */
object ForgetStream {

  /** Wire a doc_id request stream: one segment write per non-empty
    * micro-batch, checkpointed so restart resumes the version chain.
    */
  def start(requests: DataFrame, stateDir: String,
      checkpoint: String): StreamingQuery =
    requests.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          batch.select(col("doc_id")).distinct()
            .write.mode("overwrite")
            .parquet(s"$stateDir/tombstones_v$batchId")
        }
        ()
      }
      .start()

  /** The accumulated tombstone set: the union of every committed
    * segment — a plain multi-path read, |requests|-sized.
    */
  def tombstones(spark: SparkSession, stateDir: String): DataFrame = {
    val segs = StateSegments.list(spark, stateDir, "tombstones_v").map(_._2)
    require(segs.nonEmpty, s"no tombstone segments under $stateDir")
    spark.read.parquet(segs: _*).select(col("doc_id")).distinct()
  }
}
