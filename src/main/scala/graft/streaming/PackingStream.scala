package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of sharded sequence packing (the batch face is
  * graft.queries.Curation.packSequencesSharded): documents arriving on a
  * stream are assigned to ~`budget`-token training bins per shard, with
  * the SAME bin-id contract as batch — bin = shard·2^40 + (running token
  * total before the doc) / budget, running total per shard in doc_id
  * order.
  *
  * State per shard is ONE long (the shard's running token total), so
  * state size is O(nShards) forever — no watermark needed, nothing to
  * evict. Output is append-only per-doc assignments; bins only ever
  * grow forward, so an assignment emitted once is final (exactly-once
  * with checkpointing, like every flatMapGroupsWithState sink here).
  *
  * Ordering contract: intra-batch disorder is handled (docs are sorted
  * by doc_id inside each micro-batch before merging); ACROSS batches
  * the running total accumulates in arrival order, so the stream must
  * deliver doc_id ranges in order (the natural shape when ingest
  * appends monotonically — e.g. the dv3f file source lists new files in
  * order). A late doc lands in the CURRENT bin, not its batch-order
  * one — same as any at-arrival-time streaming assignment.
  */
object PackingStream {

  final case class DocTok(doc_id: Long, shard: Long, n_tokens: Long)
  final case class PackAssign(shard: Long, bin_id: Long, doc_id: Long,
      n_tokens: Long)
  final case class PackState(total: Long)

  def packSequencesStream(docs: Dataset[DocTok], budget: Int): Dataset[PackAssign] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[PackState]
    implicit val outEnc = Encoders.product[PackAssign]

    def fn(shard: Long, it: Iterator[DocTok],
        state: GroupState[PackState]): Iterator[PackAssign] = {
      var total = state.getOption.map(_.total).getOrElse(0L)
      val out = it.toSeq.sortBy(_.doc_id).map { d =>
        val bin = shard * (1L << 40) + total / budget
        total += d.n_tokens
        PackAssign(shard, bin, d.doc_id, d.n_tokens)
      }
      state.update(PackState(total))
      out.iterator
    }

    docs.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
