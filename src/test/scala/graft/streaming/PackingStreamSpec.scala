package graft.streaming

import graft.{SparkSpec, Tables}
import graft.queries.Curation
import graft.streaming.PackingStream.DocTok
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streaming packing face must reproduce the batch face's bins when
  * the stream delivers documents in doc_id order (the ingest-append
  * shape) — across multiple micro-batches, with per-shard running
  * totals carried in state between batches.
  */
class PackingStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming sharded packing equals the batch face across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val budget = 1000
    val nShards = 8
    // the same projection the batch face uses (shared shard/token defs)
    val docs = Curation.shardTokens(Tables.load(spark, sf, "documents"), nShards)
      .as[DocTok].collect().sortBy(_.doc_id)
    assert(docs.length > 100)

    val mem = MemoryStream[DocTok]
    val q = PackingStream.packSequencesStream(mem.toDS(), budget)
      .writeStream.format("memory").queryName("pack_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // three micro-batches, doc_id ranges in order (within a batch the
      // op sorts, so feed each batch shuffled to prove it)
      docs.grouped((docs.length + 2) / 3).foreach { batch =>
        mem.addData(scala.util.Random.shuffle(batch.toSeq): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.table("pack_out")
      .groupBy(col("shard"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .collect().map(_.toSeq).toSet
    val want = Curation.packSequencesSharded(spark, sf, budget, nShards)
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("noveltyGate: stream-static anti join passes only unseen content") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val corpus = Seq((1L, "seen before"), (2L, "also known"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val q = CorpusStream.noveltyGate(mem.toDF().toDF("doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("novel_out")
      .outputMode("append").start()
    try {
      mem.addData((10L, "seen before"), (11L, "fresh content"))
      q.processAllAvailable()
      mem.addData((12L, "also known"), (13L, "more new text"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("novel_out").select(col("doc_id"))
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(11L, 13L))
  }

  test("qualityGate: repetitive docs are dropped in-stream, stateless") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val mem = MemoryStream[(Long, String)]
    val q = CorpusStream.qualityGate(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("quality_out")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "spam spam spam spam spam spam"), // top2=1.0 -> dropped
        (2L, "a perfectly normal varied sentence of words"),
        (3L, "tiny")) // no grams -> null signals -> passes
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("quality_out").select(col("doc_id"))
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(2L, 3L))
    // same transform, batch face: identical verdicts
    val batch = CorpusStream.qualityGate(
      Seq((1L, "spam spam spam spam spam spam"),
        (2L, "a perfectly normal varied sentence of words"),
        (3L, "tiny")).toDF("doc_id", "text"))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(batch.toSeq == got.toSeq)
  }

  test("checkpointed restart carries the per-shard totals exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val budget = 1000
    val nShards = 8
    val docs = Curation.shardTokens(Tables.load(spark, sf, "documents"), nShards)
      .as[DocTok].collect().sortBy(_.doc_id)
    val (first, second) = docs.splitAt(docs.length / 2)
    val outDir = java.nio.file.Files.createTempDirectory("pack_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pack_ckpt").toString
    val mem = MemoryStream[DocTok]
    def start() = PackingStream.packSequencesStream(mem.toDS(), budget)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()

    val q1 = start()
    try { mem.addData(first.toSeq: _*); q1.processAllAvailable() }
    finally q1.stop()
    // restart from the checkpoint: the running totals (and therefore bin
    // ids) must continue where the first run left off, with no dup rows
    val q2 = start()
    try { mem.addData(second.toSeq: _*); q2.processAllAvailable() }
    finally q2.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() == docs.length) // exactly-once: every doc once
    val got = out.groupBy(col("shard"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .collect().map(_.toSeq).toSet
    val want = Curation.packSequencesSharded(spark, sf, budget, nShards)
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }
}
