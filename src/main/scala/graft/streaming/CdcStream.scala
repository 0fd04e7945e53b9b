package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dv3f.{StagingTable, Upsert}

/** Streaming face of the CDC MERGE: a change-row stream (declared
  * columns + op ∈ {I,U,D} + seq) folds into a versioned table via
  * [[Upsert.mergeCdc]] — the change-log-to-table materializer (Kafka
  * compacted topic → queryable snapshot, or a Debezium feed → lakehouse
  * table), with deletes carried through, which the append-shaped
  * streaming ingest cannot express.
  *
  * Exactly-once without sink transactions: the OUTCOME is idempotent,
  * not the write. A replayed micro-batch re-applies the same latest-wins
  * changes onto a snapshot that already contains them and commits a new
  * version with identical content (CdcMergeSpec's replay-convergence
  * property) — so checkpoint-recovery's at-least-once batch delivery
  * yields exactly-once VISIBLE state, the same argument the keyed
  * upsert ingest makes, extended to deletes. Mid-batch crashes are
  * invisible: a writer-unique `_v_` dir without a published marker is
  * never read and gets vacuumed.
  *
  * Per-key ordering: `seq` must be a total order per key ACROSS
  * micro-batches (CDC log offset / LSN — true for any log-shaped
  * source). Within a batch, latest-wins resolves; across batches, a
  * stale replay can only rewrite what a later batch already wrote iff
  * the key is untouched in between — with a monotonic seq the re-merge
  * is a no-op on those keys too.
  */
object CdcStream {

  /** Start folding `changes` (a streaming DataFrame) into the versioned
    * table at `targetPath`. One mergeCdc commit per non-empty
    * micro-batch.
    */
  def start(changes: DataFrame, targetPath: String, table: StagingTable,
      checkpoint: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          Upsert.mergeCdc(batch.sparkSession, targetPath, batch, table)
        }
        ()
      }
      .start()
}
