package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming face of last-touch revenue attribution
  * ([[graft.queries.Events.lastTouchAttribution]]): an event stream
  * folds through foreachBatch into a two-artifact layout under `root` —
  * `state/gen=<batchId>` (per-user latest non-purchase touch, the ONLY
  * cross-batch memory the last-touch rule needs) and `out/batch=
  * <batchId>` (that batch's attributed purchases) — whose converged
  * report is hash-equal to the batch query over the same events.
  *
  * Why state = one row per user suffices: the batch rule picks the
  * LAST non-purchase event (by ts, event_id) strictly before each
  * purchase. With micro-batches delivered in (ts, event_id) order
  * (any log-shaped source), every prior-batch candidate is dominated
  * by the per-user latest — so the state row, replayed as a
  * pseudo-event at its true timestamp, reproduces the full-history
  * window exactly, including the 1-hour staleness check.
  *
  * Exactly-once without sink transactions (the [[CdcStream]]
  * argument, generation-chained): batch `i` reads ONLY artifacts of
  * generations < i (the newest `state/gen=` below its own id) and
  * OVERWRITES its own two generation dirs — a replayed batch
  * recomputes from the same inputs and rewrites the same outputs, so
  * checkpoint-recovery's at-least-once delivery yields exactly-once
  * visible state; a crash between the two writes is repaired by the
  * replay for the same reason.
  */
object AttributionStream extends Serializable {

  def start(events: DataFrame, root: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        fold(batch, root, batchId)
      }
      .start()

  private def gens(spark: SparkSession, root: String): Seq[Long] = {
    val d = new java.io.File(s"$root/state")
    Option(d.listFiles()).getOrElse(Array.empty).toSeq
      .map(_.getName).filter(_.startsWith("gen="))
      .map(_.stripPrefix("gen=").toLong)
  }

  /** One generation-chained fold step (visible for the restart spec). */
  def fold(batch: DataFrame, root: String, batchId: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val slim = batch.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type"), col("value"))
    val all = gens(spark, root).filter(_ < batchId).sorted.lastOption
      .map(g => slim.unionByName(
        spark.read.parquet(s"$root/state/gen=$g")))
      .getOrElse(slim)
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the batch query's expression verbatim; state rows are
    // non-purchase by construction, so every purchase row is batch-new
    all.withColumn("touch", last(
        when(col("event_type") =!= "purchase",
          struct(col("ts").as("t"), col("event_type").as("et"))),
        ignoreNulls = true).over(byUser))
      .filter(col("event_type") === "purchase")
      .withColumn("touch_type",
        when(col("touch").isNotNull &&
          col("touch.t") >= col("ts") - expr("INTERVAL 1 hour"),
          col("touch.et")).otherwise(lit("direct")))
      .select(col("touch_type"), col("value"))
      .write.mode("overwrite").parquet(s"$root/out/batch=$batchId")
    val latest = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    all.filter(col("event_type") =!= "purchase")
      .withColumn("rn", row_number().over(latest))
      .filter(col("rn") === 1).drop("rn")
      .write.mode("overwrite").parquet(s"$root/state/gen=$batchId")
  }

  /** The converged report over every emitted batch — column-identical
    * to the batch face (touch_type, n_purchases, attributed_usd).
    */
  def report(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/out")
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        graft.queries.Analytics.moneySum(col("value")).as("attributed_usd"))
      .orderBy(col("touch_type"))
}
