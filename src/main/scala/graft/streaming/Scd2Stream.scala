package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.LongType

/** STREAMING SCD2 — the type-2 history table maintained one CDC
  * micro-batch at a time (the MERGE-based SCD2 every warehouse runs on
  * its dimension feeds), the incremental face of
  * [[graft.queries.Maintenance.scd2History]]'s one-window batch build:
  * each arriving batch of (k, v, seq, op) events
  *
  *  - CLOSES the touched keys' open versions (valid_to = the event's
  *    seq — a batch-sized broadcast join against the history, exactly
  *    the rows a MERGE would update), and
  *  - OPENS a new version per I/U event (valid_from = seq, open-ended);
  *    a delete only closes.
  *
  * Exactly-once by generation chaining (the [[IvmStream]] argument):
  * batch i reads only `hist/gen=<j<i>` — falling back to the staged
  * initial-load snapshot before any generation exists — and overwrites
  * its own `hist/gen=i`, so a checkpoint-replayed batch recomputes
  * from the same input and rewrites the same bytes. Feeding batches in
  * seq order is the CDC contract (a feed that reordered epochs would
  * be a broken feed, not a broken maintainer).
  *
  * The converged history is the batch face's exact result, so the
  * oracle is `scd2HistorySql` VERBATIM: stream ≡ batch ≡ the SQL
  * window replay, hash-checked through a kill-and-resume.
  */
object Scd2Stream extends Serializable {

  def start(events: DataFrame, root: String, hist0Path: String,
      checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        fold(batch, root, hist0Path, batchId)
      }
      .start()

  private def gens(root: String): Seq[Long] = {
    val d = new java.io.File(s"$root/hist")
    Option(d.listFiles()).getOrElse(Array.empty).toSeq
      .map(_.getName).filter(_.startsWith("gen="))
      .map(_.stripPrefix("gen=").toLong)
  }

  /** One generation step (visible for the replay spec). History rows
    * are (k, v, valid_from, valid_to).
    */
  def fold(batch: DataFrame, root: String, hist0Path: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val prev = gens(root).filter(_ < batchId).sorted.lastOption
      .map(g => spark.read.parquet(s"$root/hist/gen=$g"))
      .getOrElse(spark.read.parquet(hist0Path))
    val closes = batch.select(col("k"), col("seq").as("close_at"))
    val closed = prev.join(broadcast(closes), Seq("k"), "left")
      .select(col("k"), col("v"), col("valid_from"),
        when(col("valid_to").isNull && col("close_at").isNotNull,
          col("close_at")).otherwise(col("valid_to")).as("valid_to"))
    val opens = batch.filter(col("op") =!= "D")
      .select(col("k"), col("v"), col("seq").as("valid_from"),
        lit(null).cast(LongType).as("valid_to"))
    closed.unionByName(opens)
      .write.mode("overwrite").parquet(s"$root/hist/gen=$batchId")
  }

  /** The converged history (latest generation) in the batch face's
    * output shape: the changed slice only (a key is changed iff any
    * version opened after the load or any version is closed), with
    * is_current derived from the open interval.
    */
  def view(spark: SparkSession, root: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = gens(root).max
    val wk = Window.partitionBy(col("k"))
    spark.read.parquet(s"$root/hist/gen=$g")
      .withColumn("changed",
        max(when(col("valid_from") >= 1L || col("valid_to").isNotNull, 1L)
          .otherwise(0L)).over(wk))
      .filter(col("changed") === 1L)
      .select(col("k").as("o_orderkey"), col("v").as("price"),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("o_orderkey"), col("valid_from"))
  }
}
