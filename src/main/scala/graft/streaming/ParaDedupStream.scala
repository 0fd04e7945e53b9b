package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** STREAMING paragraph dedup, KEEP-FIRST mode — the online form of
  * [[graft.queries.LlmOps.paraDedup]] and the second standard CCNet
  * mode: on the ingest path a paragraph instance is admitted iff NO
  * earlier instance of the same block exists in stream order (the
  * batch face's drop-ALL rule needs the whole corpus's frequencies;
  * an admission gate only ever knows the prefix, and keep-first is
  * exactly the rule that prefix decides). Deterministic because the
  * feed is doc_id-ordered: an instance's global rank over
  * (doc_id, block_idx) IS its stream rank, so a batch SQL replay of
  * the same rank rule is the exact oracle.
  *
  * State = the set of block hashes seen so far with their counts,
  * carried as a generation-chained parquet artifact (the
  * [[AttributionStream]] pattern): batch i reads the newest
  * `state/gen=<j<i>`, ranks its own instances within-batch (one
  * block-hash-keyed window), drops any instance whose
  * prior-state count + within-batch rank exceeds 1, reassembles each
  * doc from its kept blocks IN ORDER (a doc's blocks arrive in one
  * batch), writes the per-doc census to `out/batch=<i>` and the
  * folded counts to `state/gen=<i>`. Replayed batches read the same
  * inputs and overwrite the same outputs — exactly-once visible state
  * across checkpoint recovery.
  *
  * Scale shape: per batch, one block-hash-keyed exchange (the rank
  * window) + one doc-keyed reassembly aggregate; the state artifact
  * is block-vocabulary-sized and read partition-pruned by the batch's
  * own hashes (a semi-joinable lookup at production scale).
  */
object ParaDedupStream extends Serializable {

  val blockTokens = 20

  def start(docs: DataFrame, root: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
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

  /** One admission step (visible for the replay-idempotence spec). */
  def fold(batch: DataFrame, root: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val blocks = batch
      .select(col("doc_id"), col("source"),
        split(trim(col("text")), "\\s+").as("t"))
      .select(col("doc_id"), col("source"), size(col("t")).as("n0"),
        posexplode(expr(
          s"""transform(sequence(0, CAST(ceil(size(t) / $blockTokens.0) AS INT) - 1),
             |  i -> array_join(slice(t, i * $blockTokens + 1, $blockTokens), ' '))"""
            .stripMargin)).as(Seq("bi", "para")))
      .withColumn("h", graft.ops.Dedup.hash60(col("para")))
    val prior = gens(spark, root).filter(_ < batchId).sorted.lastOption
      .map(g => spark.read.parquet(s"$root/state/gen=$g"))
      .getOrElse(spark.range(0).select(col("id").as("h"), col("id").as("cnt")))
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("bi"))
    val ranked = blocks
      .join(prior.select(col("h"), col("cnt").as("prior_cnt")), Seq("h"), "left")
      .withColumn("rank",
        coalesce(col("prior_cnt"), lit(0L)) + row_number().over(w))
    val perDoc = ranked
      .groupBy(col("doc_id"), col("source"), col("n0"))
      .agg(count(lit(1)).as("nb"),
        sum(when(col("rank") <= 1, 1L).otherwise(0L)).as("nk"),
        array_join(transform(array_sort(collect_list(
            when(col("rank") <= 1, struct(col("bi"), col("para"))))),
          x => x.getField("para")), " ").as("ctext"))
      .select(col("doc_id"), col("source"), col("n0").cast(LongType).as("n0"),
        col("nb"), col("nk"),
        when(col("ctext") === "", lit(0L))
          .otherwise(size(split(trim(col("ctext")), "\\s+")).cast(LongType))
          .as("n1"))
    perDoc.write.mode("overwrite").parquet(s"$root/out/batch=$batchId")
    // fold state: prior counts + this batch's occurrences per hash
    val batchCounts = blocks.groupBy(col("h")).agg(count(lit(1)).as("bc"))
    prior.select(col("h"), col("cnt"))
      .join(batchCounts, Seq("h"), "full_outer")
      .select(col("h"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("bc"), lit(0L))).as("cnt"))
      .write.mode("overwrite").parquet(s"$root/state/gen=$batchId")
  }

  /** The converged per-source census over every admitted batch —
    * the batch face's column shape under keep-first semantics.
    */
  def report(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/out")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("nk") < col("nb"), 1L).otherwise(0L)).as("docs_touched"),
        sum(col("nb") - col("nk")).as("paras_dropped"),
        sum(col("n0")).as("toks_before"),
        sum(col("n1")).as("toks_after"))
      .orderBy(col("source"))
}
