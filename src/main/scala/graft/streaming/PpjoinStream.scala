package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Tables
import graft.ops.{CacheBin, SetSimJoin, StageOnce}

/** STREAMING PPJoin admission — the EXACT no-false-negative set-
  * similarity gate on the ingest path, joining the four probabilistic
  * gates of [[IngestGateStream]]: every micro-batch doc whose word-
  * 3-shingle set has Jaccard ≥ 1/2 with ANY corpus doc is flagged
  * `dup_ssjoin`, with the PPJoin guarantee that nothing at or above
  * the threshold can slip through (the property the LSH/winnow/simhash
  * tiers trade away). The batch face (`q_ssjoin_incr`,
  * [[SetSimJoin.ppjoinCross]]) proves the plan; this face adds the
  * state model a stream needs:
  *
  *  - The corpus-side artifact is a GENERATION: the distinct
  *    (doc_id, token) relation plus its document-frequency table —
  *    the df table IS the token total order PPJoin's prefix filter
  *    sorts by, so it must be pinned, not recomputed per batch
  *    (recomputing would both cost a corpus aggregate per delta AND
  *    let a replayed batch see a different order).
  *    [[SetSimJoin.ppjoinCrossWithDfs]] takes it explicitly; the
  *    filter theorems only need ONE total order on both sides, so a
  *    between-compactions artifact is exact, not approximate.
  *  - Admissions accumulate append-only (`admitted_v<batchId>`,
  *    cost ∝ delta) and become near-dup-VISIBLE only when
  *    [[compactGeneration]] folds them into a new generation
  *    (`ppgen_v<upTo>` — toks ∪ admitted, dfs REBUILT there: the
  *    df-artifact refresh rule rides the compaction cadence, exactly
  *    like the minhash/winnow artifacts in
  *    [[IngestGateStream.compactArtifacts]]). Until then a refetched
  *    near-dup of an admitted doc is admitted again — the spec pins
  *    the verdict FLIP across the compaction.
  *  - Exactly-once by convergence (the [[CdcStream]] argument):
  *    generation selection is the `version < batchId` cut, so a
  *    replayed batch resolves the same generation and overwrites
  *    `verdicts_v<id>` / `admitted_v<id>` with identical bytes.
  */
object PpjoinStream {

  /** The q_ssjoin token convention: 60-bit word-3-shingle hashes,
    * fused kernel, in-row distinct.
    */
  private[streaming] def toksOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.GraftFunctions
        .wordShingleHashes(col("text"), 3)).as("token"))

  /** Write one generation: the distinct token relation and its df
    * table (the pinned order). Deterministic inputs + overwrite =
    * an idempotent, replay-safe build.
    */
  private def writeGeneration(spark: SparkSession, toks: DataFrame,
      gen: String): Unit = {
    toks.select(col("doc_id"), col("token")).distinct()
      .write.mode("overwrite").parquet(s"$gen/toks")
    spark.read.parquet(s"$gen/toks")
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$gen/dfs")
  }

  /** Base generation over the standing corpus (doc_id % 10 ≠ 0, the
    * incremental family's corpus side), staged once per (JVM, dir).
    */
  def baseGeneration(spark: SparkSession, dir: String): String = {
    val gen = StageOnce.tmp("ppjoin_gate", dir)
    StageOnce(gen) {
      writeGeneration(spark,
        toksOf(Tables.load(spark, dir, "documents")
          .filter(col("doc_id") % 10 =!= 0)), gen)
    }
    gen
  }

  /** The generation visible to `batchId`: the newest compacted
    * `ppgen_v<k>` with k < batchId, else the base — the same
    * strictly-below cut as [[IngestGateStream.predecessorDigests]],
    * which is what makes a replayed batch converge.
    */
  private def generationFor(spark: SparkSession, baseGen: String,
      stateDir: String, batchId: Long): String =
    StateSegments.versions(spark, stateDir, "ppgen_v")
      .filter(_ < batchId)
      .lastOption
      .map(v => s"$stateDir/ppgen_v$v")
      .getOrElse(baseGen)

  /** Admit one micro-batch: exact cross-only PPJoin of the batch's
    * shingles against the resolved generation (never batch×batch,
    * never corpus×corpus), verdicts + the admitted texts written as
    * versioned outputs. Returns the committed verdicts.
    */
  def admitBatch(spark: SparkSession, baseGen: String, delta: DataFrame,
      stateDir: String, batchId: Long): DataFrame = {
    val gen = generationFor(spark, baseGen, stateDir, batchId)
    val batch = CacheBin.pin(delta.select(col("doc_id"), col("text")))
    val pairs = SetSimJoin.ppjoinCrossWithDfs(
      toksOf(batch),
      spark.read.parquet(s"$gen/toks"),
      spark.read.parquet(s"$gen/dfs"),
      tNum = 1, tDen = 2)
    batch.select(col("doc_id"))
      .join(pairs.select(col("doc_new").as("doc_id")).distinct()
        .withColumn("dup", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("dup"), "dup_ssjoin").otherwise("admitted").as("verdict"))
      .write.mode("overwrite").parquet(s"$stateDir/verdicts_v$batchId")
    batch.join(
        spark.read.parquet(s"$stateDir/verdicts_v$batchId")
          .filter(col("verdict") === "admitted").select("doc_id"),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(s"$stateDir/admitted_v$batchId")
    CacheBin.releaseAll()
    spark.read.parquet(s"$stateDir/verdicts_v$batchId")
  }

  /** Fold everything admitted up to `upToBatch` into a new generation:
    * base toks ∪ every admitted batch's toks, df table REBUILT over
    * the union — the refresh rule for the pinned order. Idempotent
    * (deterministic fold from the base, overwrite writes); after this,
    * batches with id > upToBatch see the admitted docs as corpus.
    */
  def compactGeneration(spark: SparkSession, baseGen: String,
      stateDir: String, upToBatch: Long): String = {
    val gen = s"$stateDir/ppgen_v$upToBatch"
    val admitted = StateSegments.versions(spark, stateDir, "admitted_v")
      .filter(_ <= upToBatch)
      .map(b => spark.read.parquet(s"$stateDir/admitted_v$b"))
    val toks = admitted.foldLeft(
        spark.read.parquet(s"$baseGen/toks"))(
        (acc, d) => acc.unionByName(toksOf(d)))
    writeGeneration(spark, toks, gen)
    gen
  }

  /** Wire to a streaming delta: one [[admitBatch]] per non-empty
    * micro-batch, checkpointed so restart resumes the version chain.
    */
  def start(delta: DataFrame, baseGen: String, stateDir: String,
      checkpoint: String): StreamingQuery =
    delta.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          admitBatch(batch.sparkSession, baseGen, batch, stateDir, batchId)
        }
        ()
      }
      .start()
}
