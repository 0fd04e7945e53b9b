package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType}

import graft.ops.Dedup

/** STREAMING BOTTOM-k UNIFORM SAMPLE — the bounded-memory "give me
  * exactly k uniform rows of an unbounded stream" primitive (the
  * classic reservoir problem solved the DISTRIBUTED way: priority
  * sampling by a deterministic hash — Efraimidis–Spirakis with the
  * portable hash60 as the priority — so the reservoir is a MIN-k
  * fold: commutative, associative, idempotent, mergeable across
  * partitions, batches, and replays, none of which Vitter's
  * sequential algorithm R gives you). The sample at any moment is
  * exactly the k stream elements with the smallest hash60(doc_id) —
  * a uniform k-subset because the hash order is independent of
  * arrival order, and the SAME subset any other machine would pick,
  * which is what makes samples joinable across pipelines (the
  * bottom-k/KMV coordination trick, here as a SAMPLE rather than a
  * cardinality sketch).
  *
  * State model: one `sample_v<batchId>` segment per non-empty batch =
  * bottom-k of (previous sample ∪ batch) — k rows, so per-batch cost
  * is the batch scan plus a k-row sort; the corpus never accumulates.
  * Exactly-once by convergence: the fold is idempotent and each
  * version is a pure function of its predecessor segment + its batch,
  * so an at-least-once replay overwrites identical bytes and
  * kill-and-resume continues the chain.
  */
object SampleStream {

  /** The newest sample version strictly below `batchId`, if any — the
    * [[PpjoinStream]] generation cut.
    */
  private def prevSample(spark: SparkSession, stateDir: String,
      batchId: Long): Option[String] =
    StateSegments.versions(spark, stateDir, "sample_v")
      .filter(_ < batchId)
      .lastOption.map(v => s"$stateDir/sample_v$v")

  /** Wire a doc_id stream: one bottom-k fold per non-empty
    * micro-batch, checkpointed so restart resumes the version chain.
    */
  def start(rows: DataFrame, stateDir: String, checkpoint: String,
      k: Int): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val incoming = batch.select(col("doc_id").cast(LongType))
            .withColumn("h", Dedup.hash60(col("doc_id").cast(StringType)))
          val pool = prevSample(spark, stateDir, batchId)
            .map(p => spark.read.parquet(p).unionByName(incoming))
            .getOrElse(incoming)
          pool
            .orderBy(col("h"), col("doc_id"))
            .limit(k)
            .write.mode("overwrite").parquet(s"$stateDir/sample_v$batchId")
        }
        ()
      }
      .start()

  /** Every committed sample version, ranked within version by the
    * priority order — (version, rank, doc_id, h).
    */
  def samples(spark: SparkSession, stateDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val segs = StateSegments.list(spark, stateDir, "sample_v")
    require(segs.nonEmpty, s"no sample versions under $stateDir")
    segs.map { case (name, path) =>
      spark.read.parquet(path)
        .withColumn("version", lit(name.stripPrefix("sample_v").toLong))
    }.reduce(_ unionByName _)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("version"))
          .orderBy(col("h"), col("doc_id"))).cast(LongType))
      .select(col("version"), col("rank"), col("doc_id"), col("h"))
      .orderBy(col("version"), col("rank"))
  }
}
