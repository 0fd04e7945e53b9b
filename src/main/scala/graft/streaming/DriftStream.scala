package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.ops.Similarity

/** Streaming face of the embedding drift monitor
  * (`LlmOps.embedDrift` is the batch face): arriving vectors quantize
  * against the FROZEN trained centroids map-side (the same ivfAssign
  * expression), and per-centroid running state folds in (count,
  * sum-vector) — O(dim) state per centroid, never the vectors — so
  * after ANY prefix of the stream the monitor reads each list's
  * traffic count and the cosine between its running ingest mean and
  * its frozen centroid: the drift signal that fires the periodic
  * re-train while the stream is still running, instead of at the next
  * batch job.
  *
  * Update-mode emission: every micro-batch re-emits the centroids it
  * touched with their cumulative (n_seen, drift_cos). Means round to
  * 6 decimals before the cosine (the kmeansFit convention), so a
  * batch recompute over the same prefix lands on the same numbers —
  * `DriftStreamSpec` pins that equivalence and checkpoint-restart
  * exactly-once.
  */
object DriftStream extends Serializable {

  final case class CentroidAgg(n: Long, sum: Array[Double])
  final case class DriftRow(centroid: Int, n_seen: Long, drift_cos: Double)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); i += 1 }
    i = 0; while (i < a.length) { na += a(i) * a(i); i += 1 }
    i = 0; while (i < b.length) { nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Fold the incoming vector stream into per-centroid drift state.
    * `incoming` needs (vec_id long, embedding array) columns.
    */
  def driftAgainst(incoming: DataFrame,
      centroids: Seq[(Int, Seq[Double])]): Dataset[DriftRow] = {
    val spark = incoming.sparkSession
    import spark.implicits._
    implicit val stateEnc = Encoders.product[CentroidAgg]

    val byId = centroids.toMap
    val assigned = Similarity.ivfAssign(incoming, col("vec_id"),
        col("embedding"), centroids)
      .select(col("centroid"),
        col("e").cast(ArrayType(DoubleType)).as("e"))
      .as[(Int, Seq[Double])]

    def fn(cid: Int, it: Iterator[(Int, Seq[Double])],
        state: GroupState[CentroidAgg]): Iterator[DriftRow] = {
      val prev = state.getOption.getOrElse(CentroidAgg(0L, null))
      var n = prev.n
      var sum: Array[Double] = prev.sum
      it.foreach { case (_, e) =>
        if (sum == null) sum = new Array[Double](e.length)
        var i = 0
        while (i < e.length) { sum(i) += e(i); i += 1 }
        n += 1
      }
      state.update(CentroidAgg(n, sum))
      val mean = sum.map(x => round6(x / n)).toSeq
      Iterator(DriftRow(cid, n, round6(cos(mean, byId(cid)))))
    }

    assigned.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
  }
}
