package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming blocklist admission/redaction: converged stream ≡ batch
  * redaction census, residual hits identically zero on every admitted
  * batch, and replayed-fold idempotence (the exactly-once argument for
  * the stateless per-batch overwrite).
  */
case class BD(doc_id: Long, text: String, source: String)

class BlocklistStreamSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[BD]], restartAfter: Int = -1): String = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("bl_root").toString
    val ckpt = java.nio.file.Files.createTempDirectory("bl_ckpt").toString
    val mem = MemoryStream[BD]
    def start() = BlocklistStream.start(mem.toDS().toDF(), root, ckpt)
    var q = start()
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        if (i == restartAfter) { q.stop(); q = start() }
        mem.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()
    root
  }

  test("hand batches: nested-chain masking counted exactly; clean doc untouched; kill-and-resume") {
    // "a scan here": the an⊂can⊂scan chain covers 4 chars; "no hits x"
    // survives byte-identical (hid 0, not redacted)
    val root = run(Seq(
      Seq(BD(1, "a scan here", "s1")),
      Seq(BD(2, "no hits x", "s1"), BD(3, "hash join twice hash join", "s2")),
      Seq(BD(4, "row", "s2"))),
      restartAfter = 2)
    val got = BlocklistStream.report(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // s1: doc1 hid=4 of 11, doc2 hid=0 of 9 → 1 redacted, 4 masked, 20 total
    // s2: doc3 two "hash join" spans = 18 of 25, doc4 "row" fully = 3 of 3
    assert(got === Seq(("s1", 1L, 4L, 20L, 0L), ("s2", 2L, 21L, 28L, 0L)))
  }

  test("converged stream ≡ batch redaction census on the real corpus; residuals zero everywhere") {
    val rows = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .orderBy(col("doc_id"))
      .collect().map(r => BD(r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
    val quarter = (rows.length + 3) / 4
    val root = run(rows.grouped(quarter).toSeq, restartAfter = 2)
    val got = BlocklistStream.report(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val want = graft.queries.LlmOps.blocklistMask(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === want)
    assert(got.forall(_._5 == 0L), "a masked batch left a pattern intact")
    assert(got.exists(_._2 > 0L), "no doc redacted — face degenerate")
  }

  test("replayed fold is idempotent: re-admitting a batch rewrites identical artifacts") {
    val b1 = Seq(BD(1, "a scan here", "s1"), BD(2, "merge join x", "s1"))
    val root = run(Seq(Seq(BD(9, "clean", "s0")), b1))
    def snap() = BlocklistStream.report(spark, root).collect()
      .map(_.toString).sorted.toSeq
    val before = snap()
    BlocklistStream.fold(b1.toDF(), root, 1L) // at-least-once redelivery
    assert(snap() === before)
  }
}
