package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Streaming IVM for MIN/MAX under deletes — the continuous-refresh
  * face of [[graft.queries.Maintenance.ivmMinMax]], completing the
  * streaming IVM story for the NON-self-maintainable aggregates: each
  * micro-batch of (group, old_v, new_v) change rows folds COUNT/SUM
  * counting-style, folds inserts into the extrema blindly
  * (least/greatest), and — when a removed value equals the stored
  * extremum — rescans THAT group's current value multiset, derived
  * from the staged base snapshot plus the stream's own append-only
  * VALUE LOG (`log/batch=<i>`: ±1-counted values, the table state a
  * production MV keeps beside itself), restricted to the touched
  * groups by a broadcast semi-join. Rescan cost per batch ∝ touched
  * groups' rows, never the whole base.
  *
  * Exactly-once by generation chaining (the [[IvmStream]] argument,
  * extended with the log): batch i OVERWRITES `log/batch=i` first,
  * then reads mv generations < i (falling back to an aggregate of the
  * base snapshot) and logs ≤ i — a replayed batch rewrites the same
  * log deterministically and recomputes the same generation.
  * DECIMAL(18,2) sums through every generation; extrema are exact
  * copies of stored doubles, so converged ≡ batch ≡ recompute is
  * bit-exact.
  */
object IvmMinMaxStream extends Serializable {

  def start(changes: DataFrame, root: String, basePath: String,
      checkpoint: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        fold(batch, root, basePath, batchId)
      }
      .start()

  private def ids(root: String, sub: String, prefix: String): Seq[Long] = {
    val d = new java.io.File(s"$root/$sub")
    Option(d.listFiles()).getOrElse(Array.empty).toSeq
      .map(_.getName).filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).toLong)
  }

  /** One generation step (visible for the replay spec). */
  def fold(batch: DataFrame, root: String, basePath: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val zero = lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))
    // 1. this batch's value-log delta (overwrite ⇒ replay-idempotent)
    batch.filter(col("new_v").isNotNull)
      .select(col("annee"), col("new_v").as("v"), lit(1L).as("d"))
      .unionByName(batch.filter(col("old_v").isNotNull)
        .select(col("annee"), col("old_v").as("v"), lit(-1L).as("d")))
      .write.mode("overwrite").parquet(s"$root/log/batch=$batchId")
    // 2. prior MV generation (or the base snapshot's aggregate)
    val prev = ids(root, "mv", "gen=").filter(_ < batchId).sorted.lastOption
      .map(g => spark.read.parquet(s"$root/mv/gen=$g"))
      .getOrElse(spark.read.parquet(basePath)
        .groupBy(col("annee"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast(DecimalType(18, 2))).cast(DecimalType(18, 2)).as("s"),
          min(col("v")).as("mn"), max(col("v")).as("mx")))
    // 3. batch delta aggregate + per-side rescan flags
    val dAgg = batch.groupBy(col("annee"))
      .agg(sum(when(col("new_v").isNull, -1L)
          .when(col("old_v").isNull, 1L).otherwise(0L)).as("dn"),
        sum(coalesce(col("new_v").cast(DecimalType(18, 2)), zero) -
          coalesce(col("old_v").cast(DecimalType(18, 2)), zero))
          .cast(DecimalType(18, 2)).as("dv"),
        min(col("new_v")).as("ins_mn"), max(col("new_v")).as("ins_mx"),
        min(col("old_v")).as("rem_mn"), max(col("old_v")).as("rem_mx"))
    val merged = prev.join(dAgg, Seq("annee"), "full_outer")
      .withColumn("need_min", coalesce(col("rem_mn") === col("mn"), lit(false)))
      .withColumn("need_max", coalesce(col("rem_mx") === col("mx"), lit(false)))
    // 4. bounded rescan: the CURRENT multiset (base ∪ logs ≤ this
    // batch) of the touched groups only
    val touched = merged.filter(col("need_min") || col("need_max"))
      .select(col("annee"))
    val logs = ids(root, "log", "batch=").filter(_ <= batchId).sorted
      .map(b => spark.read.parquet(s"$root/log/batch=$b"))
      .reduceOption(_ unionByName _)
    val baseRows = spark.read.parquet(basePath)
      .select(col("annee"), col("v"), lit(1L).as("d"))
    val rescan = logs.map(baseRows.unionByName(_)).getOrElse(baseRows)
      .join(broadcast(touched), Seq("annee"))
      .groupBy(col("annee"), col("v")).agg(sum(col("d")).as("c"))
      .filter(col("c") > 0)
      .groupBy(col("annee"))
      .agg(min(col("v")).as("r_mn"), max(col("v")).as("r_mx"))
    // 5. the new generation (emptied groups kept at n=0 — the view
    // filters; a later batch may refill them)
    merged.join(rescan, Seq("annee"), "left")
      .select(col("annee"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s"), zero) + coalesce(col("dv"), zero))
          .cast(DecimalType(18, 2)).as("s"),
        when(col("need_min"), col("r_mn"))
          .otherwise(least(col("mn"), col("ins_mn"))).as("mn"),
        when(col("need_max"), col("r_mx"))
          .otherwise(greatest(col("mx"), col("ins_mx"))).as("mx"))
      .write.mode("overwrite").parquet(s"$root/mv/gen=$batchId")
  }

  /** The converged maintained view (latest generation), in the batch
    * face's output shape.
    */
  def view(spark: SparkSession, root: String): DataFrame = {
    val g = ids(root, "mv", "gen=").max
    spark.read.parquet(s"$root/mv/gen=$g")
      .filter(col("n") > 0)
      .select(col("annee").cast(LongType).as("annee"), col("n").as("n_rows"),
        col("s").cast(DecimalType(18, 2)).cast(DoubleType).as("total_usd"),
        col("mn").as("min_usd"), col("mx").as("max_usd"))
      .orderBy(col("annee"))
  }
}
