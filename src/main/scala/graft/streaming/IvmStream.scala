package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Streaming INCREMENTAL VIEW MAINTENANCE: a net change feed
  * ((group, ±Δcount, Δsum) rows — what a CDC compactor emits) folds
  * into a stored aggregate MV one micro-batch at a time, each step a
  * group-keyed merge of the previous MV generation with the batch's
  * delta aggregate — the streaming face of
  * [[graft.queries.Maintenance.ivmAggregate]]'s counting algorithm,
  * and the refresh loop a production MV actually runs (continuous
  * delta application, never a base re-aggregate).
  *
  * Exactly-once by generation chaining (the [[AttributionStream]]
  * argument): batch i reads ONLY `mv/gen=<j<i>`, falling back to the
  * base snapshot `mv0Path` before any generation exists, and
  * overwrites its own `mv/gen=i` — a replayed batch recomputes from
  * the same input and rewrites the same output. Sums ride
  * DECIMAL(18,2) through every generation so the converged view is
  * bit-equal to a from-scratch recompute, not float-accumulation
  * close.
  */
object IvmStream extends Serializable {

  def start(changes: DataFrame, root: String, mv0Path: String,
      checkpoint: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        fold(batch, root, mv0Path, batchId)
      }
      .start()

  private def gens(root: String): Seq[Long] = {
    val d = new java.io.File(s"$root/mv")
    Option(d.listFiles()).getOrElse(Array.empty).toSeq
      .map(_.getName).filter(_.startsWith("gen="))
      .map(_.stripPrefix("gen=").toLong)
  }

  /** One generation step (visible for the replay spec). */
  def fold(batch: DataFrame, root: String, mv0Path: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val prev = gens(root).filter(_ < batchId).sorted.lastOption
      .map(g => spark.read.parquet(s"$root/mv/gen=$g"))
      .getOrElse(spark.read.parquet(mv0Path))
    val delta = batch.groupBy(col("annee"))
      .agg(sum(col("dn")).as("dn"),
        sum(col("dv").cast(DecimalType(18, 2))).cast(DecimalType(18, 2)).as("dv"))
    prev.join(delta, Seq("annee"), "full_outer")
      .select(col("annee"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))) +
          coalesce(col("dv"), lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))))
          .cast(DecimalType(18, 2)).as("s"))
      .write.mode("overwrite").parquet(s"$root/mv/gen=$batchId")
  }

  /** The converged maintained view (latest generation), in the batch
    * face's output shape — emptied groups dropped.
    */
  def view(spark: SparkSession, root: String): DataFrame = {
    val g = gens(root).max
    spark.read.parquet(s"$root/mv/gen=$g")
      .filter(col("n") > 0)
      .select(col("annee").cast(LongType).as("annee"), col("n").as("n_rows"),
        col("s").cast(DecimalType(18, 2)).cast(DoubleType).as("total_usd"))
      .orderBy(col("annee"))
  }
}
