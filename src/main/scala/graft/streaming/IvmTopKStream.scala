package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.LongType

/** Streaming TOP-K IVM — the continuous-refresh face of
  * [[graft.queries.Maintenance.ivmTopK]], completing the streaming
  * story for all three non-self-maintainable aggregates (counting
  * [[IvmStream]], min/max [[IvmMinMaxStream]], top-k here): each
  * micro-batch of (group, old_v, new_v, key) change rows folds into a
  * stored k′-buffer generation:
  *
  *  - removals that MISS the buffer are ignored soundly and logged;
  *    buffer hits shrink it; inserts re-rank against the survivors and
  *    the buffer truncates back to k′;
  *  - the batch face's "buffer was FULL" rescan guard becomes a
  *    per-group EXHAUSTIVE flag that must be MAINTAINED across
  *    generations — a buffer that truncated an insert is no longer
  *    exhaustive even if deletions later shrink it below k′ (the
  *    streaming-only subtlety; `full' = full OR |surv ∪ ins| > k′`,
  *    and a non-exhaustive-history group rescans whenever survivors
  *    drop below k);
  *  - the rescan derives the group's CURRENT multiset from the staged
  *    base snapshot plus the stream's own append-only ±1-counted
  *    VALUE LOG (`log/batch=<i>`), broadcast-restricted to touched
  *    groups — the [[IvmMinMaxStream]] log-aware rule, which here must
  *    both RECOVER rows the buffer truncated earlier and NET OUT a
  *    deleted stream insert (both spec-pinned on a hand fixture).
  *
  * Exactly-once by generation chaining: batch i overwrites
  * `log/batch=i` first, reads buffer generations < i (falling back to
  * the base top-k′) and logs ≤ i — replay rewrites identical
  * artifacts. Converged ≡ batch ≡ recompute: the oracle is
  * `ivmTopKSql` VERBATIM through a kill-and-resume.
  */
object IvmTopKStream extends Serializable {

  private val topK = graft.queries.Maintenance.topK
  private val topKBuf = graft.queries.Maintenance.topKBuf

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

  /** One generation step (visible for the replay and trap specs).
    * Buffer rows are (annee, v, k, full) — `full` is the group's
    * truncation history, identical on every row of a group.
    */
  def fold(batch: DataFrame, root: String, basePath: String,
      batchId: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val w = Window.partitionBy(col("annee"))
      .orderBy(col("v").desc, col("k").asc)
    // 1. this batch's value-log delta (overwrite ⇒ replay-idempotent)
    batch.filter(col("new_v").isNotNull)
      .select(col("annee"), col("new_v").as("v"), col("k"), lit(1L).as("d"))
      .unionByName(batch.filter(col("old_v").isNotNull)
        .select(col("annee"), col("old_v").as("v"), col("k"), lit(-1L).as("d")))
      .write.mode("overwrite").parquet(s"$root/log/batch=$batchId")
    // 2. prior buffer generation (or the base snapshot's top-k')
    val prev = ids(root, "buf", "gen=").filter(_ < batchId).sorted.lastOption
      .map(g => spark.read.parquet(s"$root/buf/gen=$g"))
      .getOrElse {
        val ranked = spark.read.parquet(basePath)
          .withColumn("rn", row_number().over(w))
        ranked.filter(col("rn") <= topKBuf)
          .withColumn("nb", count(lit(1)).over(Window.partitionBy(col("annee"))))
          .select(col("annee"), col("v"), col("k"),
            (col("nb") === topKBuf).as("full"))
      }
    // 3. survivors and the rescan set
    val hits = batch.filter(col("old_v").isNotNull)
      .select(col("annee"), col("k"))
      .join(broadcast(prev.select(col("annee"), col("k"))),
        Seq("annee", "k"), "left_semi")
    val surv = prev.join(broadcast(hits), Seq("annee", "k"), "left_anti")
    val inserts = batch.filter(col("new_v").isNotNull)
      .select(col("annee"), col("new_v").as("v"), col("k"))
    val groupState = prev.groupBy(col("annee"))
      .agg((max(col("full").cast("int")) === 1).as("was_full"))
      .join(surv.groupBy(col("annee")).agg(count(lit(1)).as("n_surv")),
        Seq("annee"), "left")
      .select(col("annee"), col("was_full"),
        coalesce(col("n_surv"), lit(0L)).as("n_surv"))
    val needRescan = groupState
      .filter(col("was_full") && col("n_surv") < topK)
      .select(col("annee"))
    // 4. non-rescan groups: re-rank survivors ∪ inserts, truncate to
    // k', carry the truncation history forward
    val merged = surv.select(col("annee"), col("v"), col("k"))
      .unionByName(inserts)
      .join(broadcast(needRescan), Seq("annee"), "left_anti")
      .withColumn("rn", row_number().over(w))
      .withColumn("n_merged", count(lit(1)).over(Window.partitionBy(col("annee"))))
      .join(groupState.select(col("annee"), col("was_full")),
        Seq("annee"), "left")
      .withColumn("full",
        coalesce(col("was_full"), lit(false)) || col("n_merged") > topKBuf)
      .filter(col("rn") <= topKBuf)
      .select(col("annee"), col("v"), col("k"), col("full"))
    // 5. rescan groups: refill top-k' from the CURRENT multiset —
    // base snapshot plus every log ≤ this batch, net-counted, touched
    // groups only
    val logs = ids(root, "log", "batch=").filter(_ <= batchId).sorted
      .map(b => spark.read.parquet(s"$root/log/batch=$b"))
      .reduceOption(_ unionByName _)
    val baseRows = spark.read.parquet(basePath)
      .select(col("annee"), col("v"), col("k"), lit(1L).as("d"))
    val current = logs.map(baseRows.unionByName(_)).getOrElse(baseRows)
      .join(broadcast(needRescan), Seq("annee"))
      .groupBy(col("annee"), col("v"), col("k")).agg(sum(col("d")).as("c"))
      .filter(col("c") > 0)
      // c > 1 (the %10==7 duplicate-key inserts) contributes c copies;
      // within the buffer the copies are interchangeable, so keeping
      // one per (v, k) with the multiplicity folded into the rank
      // window would over-engineer: explode back to c rows
      .select(col("annee"), col("v"), col("k"),
        explode(sequence(lit(1L), col("c"))).as("copy"))
    val refilled = current
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("annee"))
          .orderBy(col("v").desc, col("k").asc, col("copy"))))
      .withColumn("n_cur", count(lit(1)).over(Window.partitionBy(col("annee"))))
      .filter(col("rn") <= topKBuf)
      .select(col("annee"), col("v"), col("k"),
        (col("n_cur") >= topKBuf).as("full"))
    merged.unionByName(refilled)
      .write.mode("overwrite").parquet(s"$root/buf/gen=$batchId")
  }

  /** The converged maintained view (latest generation) in the batch
    * face's output shape: top-k of each group's buffer.
    */
  def view(spark: SparkSession, root: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = ids(root, "buf", "gen=").max
    val w = Window.partitionBy(col("annee"))
      .orderBy(col("v").desc, col("k").asc)
    spark.read.parquet(s"$root/buf/gen=$g")
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= topK)
      .select(col("annee"), col("rnk"), col("k").as("o_key"), col("v"))
      .orderBy(col("annee"), col("rnk"))
  }
}
