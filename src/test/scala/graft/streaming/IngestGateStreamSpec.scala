package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.LlmOps

/** Streaming admission: micro-batches run the same four-gate verdicts
  * as the batch e2e face, the digest chain carries batch N's admissions
  * into batch N+1's exact gate (cross-batch dedup — the property the
  * batch face cannot have), the chain survives a checkpoint restart,
  * and a replayed batch converges (identical verdicts + digest bytes).
  */
case class D(doc_id: Long, text: String)

class IngestGateStreamSpec extends SparkSpec {
  import spark.implicits._

  private def verdictMap(df: DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("stream ≡ batch on the canonical delta; chain dedups across batches; replay converges") {
    implicit val sqlCtx = spark.sqlContext
    val g = LlmOps.ingestArtifacts(spark, sf)
    val stateDir = Files.createTempDirectory("gate_state").toString
    val ckpt = Files.createTempDirectory("gate_ckpt").toString

    val delta = LlmOps.ingestBatch(spark, sf)
      .as[(Long, String)].collect().map(t => D(t._1, t._2))
    val (fresh, recrawled) = delta.partition(_.doc_id < 1000000L)
    assert(fresh.nonEmpty && recrawled.nonEmpty)

    val mem = MemoryStream[D]
    def start() = IngestGateStream.start(mem.toDS().toDF(), sf, g,
      stateDir, ckpt)

    // two micro-batches: fresh docs, then the re-crawled copies
    val q1 = start()
    try {
      mem.addData(fresh.toIndexedSeq: _*)
      q1.processAllAvailable()
      mem.addData(recrawled.toIndexedSeq: _*)
      q1.processAllAvailable()
    } finally q1.stop()

    val streamed =
      verdictMap(spark.read.parquet(s"$stateDir/verdicts_v0")) ++
        verdictMap(spark.read.parquet(s"$stateDir/verdicts_v1"))
    // on the canonical delta the sequential digest chain changes no
    // verdict (re-crawls are corpus copies — dup_exact either way), so
    // stream-over-two-batches must equal the one-shot batch face
    val batchFace = verdictMap(LlmOps.gateVerdictsOver(spark, sf, g,
      LlmOps.ingestBatch(spark, sf)))
    assert(streamed == batchFace)
    assert(streamed.keySet == delta.map(_.doc_id).toSet)

    // digest maintenance is APPEND-ONLY and ∝ delta: each version dir
    // is a SEGMENT holding only that batch's admitted hashes — never a
    // rewrite of the cumulative set
    Seq(0L, 1L).foreach { b =>
      val segRows = spark.read.parquet(s"$stateDir/digests_v$b").count()
      val admittedB = spark.read.parquet(s"$stateDir/admitted_v$b").count()
      assert(segRows == admittedB,
        s"digest segment v$b has $segRows rows vs $admittedB admitted — " +
          "per-batch digest write is not delta-sized")
    }

    // replay batch 1 (at-least-once redelivery): verdicts and digest
    // version must come out IDENTICAL — the convergence contract
    val digestsBefore = spark.read.parquet(s"$stateDir/digests_v1")
      .as[String].collect().sorted.toSeq
    val replayed = verdictMap(IngestGateStream.admitBatch(spark, sf, g,
      recrawled.toSeq.toDF("doc_id", "text"), stateDir, 1L))
    assert(replayed == verdictMap(
      spark.read.parquet(s"$stateDir/verdicts_v1")))
    assert(spark.read.parquet(s"$stateDir/digests_v1")
      .as[String].collect().sorted.toSeq == digestsBefore)

    // restart from the checkpoint, then refetch an ADMITTED fresh doc
    // under a new crawl id: the corpus never saw it, so the batch face
    // admits it — but the digest chain must flag it dup_exact. This is
    // the cross-batch property the stream exists for.
    val admittedDoc = streamed.collectFirst {
      case (id, "admitted") => id
    }.map(id => fresh.find(_.doc_id == id).get)
      .getOrElse(fail("canonical delta admitted nothing"))
    val refetch = D(5000000L + admittedDoc.doc_id, admittedDoc.text)
    val q2 = start()
    try {
      mem.addData(refetch)
      q2.processAllAvailable()
    } finally q2.stop()
    val v2 = verdictMap(spark.read.parquet(s"$stateDir/verdicts_v2"))
    assert(v2 == Map(refetch.doc_id -> "dup_exact"))
    val oneShot = verdictMap(LlmOps.gateVerdictsOver(spark, sf, g,
      Seq(refetch).toDF("doc_id", "text")))
    assert(oneShot(refetch.doc_id) == "admitted") // corpus digests alone miss it
  }

  test("bloom exact-gate tier: same verdict set, digests never shuffle") {
    val g = LlmOps.ingestArtifacts(spark, sf)
    val delta = LlmOps.ingestBatch(spark, sf)
    val viaBloom = LlmOps.exactGateBloom(spark, g, delta)
    val broadcastTier = delta
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.sha2(
          org.apache.spark.sql.functions.col("text"), 256).as("h"))
      .join(spark.read.parquet(s"$g/digests"), Seq("h"), "left_semi")
      .select("doc_id")
    val a = viaBloom.collect().map(_.getLong(0)).toSet
    val b = broadcastTier.collect().map(_.getLong(0)).toSet
    assert(a == b, s"bloom tier diverged: ${a diff b} / ${b diff a}")
    assert(a.nonEmpty) // re-crawled corpus copies must be caught
    // the corpus-sized side must reach the join without a data
    // exchange: bloom prune is map-side on the scan, survivors
    // broadcast back. The ONE permitted exchange is the bloom build's
    // sketch-partial merge — constant-size state, so the shuffled
    // record count must be ∝ partitions (sketch partials), never ∝
    // digest rows
    assert(graft.ops.PlanMetrics.exchangeCount(viaBloom) <= 1,
      "more than the bloom-build exchange — digest side shuffled")
    val shuffledRecords = graft.ops.PlanMetrics.shuffleRecordsWritten(viaBloom)
    assert(shuffledRecords <= spark.sparkContext.defaultParallelism,
      s"$shuffledRecords shuffled records — data crossed the wire, " +
        "not sketch partials")
  }

  test("compaction folds admissions into the near-dup indexes (and stays idempotent)") {
    val g = LlmOps.ingestArtifacts(spark, sf)
    val stateDir = Files.createTempDirectory("gate_compact").toString

    // a novel doc: unique tokens, long enough for shingles + winnow
    val toks = (1 to 40).map(i => s"zqxv$i")
    val novel = D(9000001L, toks.mkString(" "))
    val v0 = verdictMap(IngestGateStream.admitBatch(spark, sf, g,
      Seq(novel).toDF("doc_id", "text"), stateDir, 0L))
    assert(v0 == Map(novel.doc_id -> "admitted"))

    val g2 = IngestGateStream.compactArtifacts(spark, sf, g, stateDir, 0L)

    // a NEAR-dup (last 4 tokens differ — ~86% shared 3-gram shingles):
    // invisible to the digest chain, caught only by the near-dup
    // indexes — which cover the admitted doc ONLY after compaction
    val probe = D(9000002L,
      (toks.dropRight(4) ++ (1 to 4).map(i => s"wmty$i")).mkString(" "))
    val before = verdictMap(LlmOps.gateVerdictsOver(spark, sf, g,
      Seq(probe).toDF("doc_id", "text")))
    assert(before(probe.doc_id) == "admitted")
    val after = verdictMap(LlmOps.gateVerdictsOver(spark, sf, g2,
      Seq(probe).toDF("doc_id", "text")))
    assert(after(probe.doc_id).startsWith("dup"),
      s"near-dup of an admitted doc passed the compacted gates: $after")

    // exact re-crawl: flagged by the compacted digest head alone
    val exact = verdictMap(LlmOps.gateVerdictsOver(spark, sf, g2,
      Seq(D(9000003L, novel.text)).toDF("doc_id", "text")))
    assert(exact(9000003L) == "dup_exact")

    // replayed compaction converges (idempotent maintenance)
    val sigsBefore = spark.read.parquet(s"$g2/sigs").count()
    val g2b = IngestGateStream.compactArtifacts(spark, sf, g, stateDir, 0L)
    assert(g2b == g2)
    assert(spark.read.parquet(s"$g2/sigs").count() == sigsBefore)
  }
}
