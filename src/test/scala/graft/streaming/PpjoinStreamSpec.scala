package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.SetSimJoin
import graft.queries.LlmOps

/** Streaming exact (PPJoin) admission: micro-batch verdicts ≡ the
  * cross-only batch face through a kill-and-resume, replay converges
  * on the pinned generation, and a refetched near-dup of an ADMITTED
  * doc flips from admitted to dup_ssjoin exactly when the compaction-
  * cadence generation refresh lands — the df-artifact refresh rule.
  */
class PpjoinStreamSpec extends SparkSpec {
  import spark.implicits._

  private def verdictMap(df: DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("stream ≡ batch cross-only through kill-and-resume; replay converges; flip on compaction refresh") {
    implicit val sqlCtx = spark.sqlContext
    val gen = PpjoinStream.baseGeneration(spark, sf)
    val stateDir = Files.createTempDirectory("ppj_state").toString
    val ckpt = Files.createTempDirectory("ppj_ckpt").toString

    val delta = LlmOps.ingestBatch(spark, sf).orderBy(col("doc_id"))
      .as[(Long, String)].collect()
    val (fresh, recrawled) = delta.partition(_._1 < 1000000L)
    assert(fresh.nonEmpty && recrawled.nonEmpty)

    val mem = MemoryStream[(Long, String)]
    def start() = PpjoinStream.start(
      mem.toDS().toDF("doc_id", "text"), gen, stateDir, ckpt)

    val q1 = start()
    try {
      mem.addData(fresh.toIndexedSeq: _*)
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start() // kill-and-resume
    try {
      mem.addData(recrawled.toIndexedSeq: _*)
      q2.processAllAvailable()
    } finally q2.stop()

    // stream ≡ batch: per micro-batch, verdicts equal the one-shot
    // cross-only PPJoin of that batch against the corpus (the
    // generation is fixed — no compaction ran)
    val docs = graft.Tables.load(spark, sf, "documents")
    def toks(d: DataFrame) = d.select(col("doc_id"),
      explode(graft.functions.GraftFunctions
        .wordShingleHashes(col("text"), 3)).as("token"))
    def batchFace(rows: Array[(Long, String)]): Map[Long, String] = {
      val b = rows.toSeq.toDF("doc_id", "text")
      val dups = SetSimJoin.ppjoinCross(toks(b),
          toks(docs.filter(col("doc_id") % 10 =!= 0)), 1, 2)
        .select(col("doc_new")).distinct()
        .collect().map(_.getLong(0)).toSet
      rows.map { case (id, _) =>
        id -> (if (dups(id)) "dup_ssjoin" else "admitted")
      }.toMap
    }
    val v0 = verdictMap(spark.read.parquet(s"$stateDir/verdicts_v0"))
    val v1 = verdictMap(spark.read.parquet(s"$stateDir/verdicts_v1"))
    assert(v0 === batchFace(fresh))
    assert(v1 === batchFace(recrawled))
    // re-crawled corpus copies are exact dups — the tier must catch all
    assert(v1.values.forall(_ == "dup_ssjoin"),
      "a re-crawled corpus copy slipped the exact gate")

    // replay batch 1 (at-least-once redelivery): same generation via
    // the version < batchId cut, identical verdict bytes
    val replayed = verdictMap(PpjoinStream.admitBatch(spark, gen,
      recrawled.toSeq.toDF("doc_id", "text"), stateDir, 1L))
    assert(replayed === v1)

    // refetch a NEAR-DUP of an admitted doc (its exact text under a
    // new crawl id): pre-compaction the pinned generation lacks it →
    // admitted again; after compactGeneration folds the admissions in
    // and REBUILDS the df order, the refetch flips to dup_ssjoin
    val admittedDoc = v0.collectFirst { case (id, "admitted") => id }
      .map(id => fresh.find(_._1 == id).get)
      .getOrElse(fail("canonical delta admitted nothing"))
    val refetch = (5000000L + admittedDoc._1, admittedDoc._2)
    val pre = verdictMap(PpjoinStream.admitBatch(spark, gen,
      Seq(refetch).toDF("doc_id", "text"), stateDir, 2L))
    assert(pre === Map(refetch._1 -> "admitted"),
      "pre-compaction generation must not yet see the admitted doc")
    PpjoinStream.compactGeneration(spark, gen, stateDir, upToBatch = 2L)
    val post = verdictMap(PpjoinStream.admitBatch(spark, gen,
      Seq(refetch).toDF("doc_id", "text"), stateDir, 3L))
    assert(post === Map(refetch._1 -> "dup_ssjoin"),
      "compaction refresh failed to make the admitted doc near-dup-visible")

    // and batch 2's replay still resolves the PRE-compaction generation
    // (version < batchId cut): identical verdicts despite ppgen_v2
    val replay2 = verdictMap(PpjoinStream.admitBatch(spark, gen,
      Seq(refetch).toDF("doc_id", "text"), stateDir, 2L))
    assert(replay2 === pre,
      "a replayed batch saw a generation newer than its cut")
  }
}
