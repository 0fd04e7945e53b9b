package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.LongType

import graft.queries.Curation

/** STREAMING DP RELEASE — continual observation with a privacy
  * accountant (Dwork et al., STOC 2010's continual-release setting,
  * deployed the way production privacy infrastructure actually runs
  * it: re-release the calibrated histogram as data arrives, account
  * the budget): each micro-batch of customer rows appends ONE row
  * segment (`rows_v<batchId>`, cost ∝ batch — the digest-chain shape
  * of [[IngestGateStream]]), then publishes release `release_v<id>` —
  * the [[Curation.dpHistogram]] geometric mechanism over the UNION of
  * segments so far, with the noise salts VERSIONED by release index
  * and `eps_total` = releases·ln 2 carried in-band (sequential
  * composition: every release re-reads the same individuals, so
  * budgets ADD — the accounting a one-shot release never needs).
  *
  * Exactly-once by convergence: a segment's content is a pure function
  * of its batch; a release is a pure function of the segments at or
  * below its id plus the versioned deterministic noise — so an
  * at-least-once replay overwrites both with identical bytes, and a
  * kill-and-resume continues the version chain (spec-pinned through
  * the house two-wave restart harness).
  */
object DpStream {

  /** Wire a customer-row stream (c_custkey, c_mktsegment, c_acctbal):
    * one segment append + one noisy release per non-empty micro-batch,
    * checkpointed so restart resumes the version chain.
    */
  def start(rows: DataFrame, stateDir: String,
      checkpoint: String): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          batch.write.mode("overwrite").parquet(s"$stateDir/rows_v$batchId")
          val segs = StateSegments.list(spark, stateDir, "rows_v")
            .filter(_._1.stripPrefix("rows_v").toLong <= batchId).map(_._2)
          val r = segs.length.toLong - 1
          Curation.dpNoisyHistogram(
              spark.read.parquet(segs: _*), s"g1r$r", s"g2r$r")
            .withColumn("release", lit(r))
            .withColumn("eps_total", lit(Curation.dpEpsTotal(r + 1)))
            .write.mode("overwrite").parquet(s"$stateDir/release_v$batchId")
        }
        ()
      }
      .start()

  /** Every committed release, oldest first — the released-table read
    * path (release, segment, b, n, z, noisy, eps_total).
    */
  def releases(spark: SparkSession, stateDir: String): DataFrame = {
    val segs = StateSegments.list(spark, stateDir, "release_v").map(_._2)
    require(segs.nonEmpty, s"no releases under $stateDir")
    spark.read.parquet(segs: _*)
      .select(col("release").cast(LongType), col("segment"), col("b"),
        col("n"), col("z"), col("noisy"), col("eps_total"))
      .orderBy(col("release"), col("segment"), col("b"))
  }
}
