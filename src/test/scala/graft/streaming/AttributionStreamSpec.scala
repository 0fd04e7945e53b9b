package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming last-touch attribution: converged stream ≡ batch query,
  * cross-batch state correctness (touch carried from an earlier
  * micro-batch, the 1-hour staleness check across batches), and
  * replayed-fold idempotence (the exactly-once argument).
  */
case class AE(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
    event_type: String, value: Double)

class AttributionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int) = new java.sql.Timestamp(min * 60000L)

  private def run(batches: Seq[Seq[AE]], restartAfter: Int = -1): String = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("attr_root").toString
    val ckpt = java.nio.file.Files.createTempDirectory("attr_ckpt").toString
    val mem = MemoryStream[AE]
    def start() = AttributionStream.start(mem.toDS().toDF(), root, ckpt)
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

  test("cross-batch state: touch from batch 1 credits a batch-2 purchase; stale touch goes direct") {
    // user 1: click at min 0, purchase at min 30 (same hour → click)
    // user 2: click at min 0, purchase at min 90 (>1h → direct)
    // user 3: purchase with no history at all → direct
    // user 1 again in batch 3: view at min 100, purchase at min 110 → view
    val root = run(Seq(
      Seq(AE(1, t(0), 1, "click", 0), AE(2, t(0), 2, "click", 0)),
      Seq(AE(1, t(30), 3, "purchase", 10.0), AE(2, t(90), 4, "purchase", 20.0),
        AE(3, t(50), 5, "purchase", 40.0)),
      Seq(AE(1, t(100), 6, "view", 0), AE(1, t(110), 7, "purchase", 5.0))),
      restartAfter = 2) // kill-and-resume before the last batch
    val got = AttributionStream.report(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq(("click", 1L, 10.0), ("direct", 2L, 60.0),
      ("view", 1L, 5.0)))
  }

  test("converged stream ≡ batch query on the real corpus") {
    val rows = graft.Tables.loadEvents(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .orderBy(col("ts"), col("event_id"))
      .collect().map(r => AE(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSeq
    val quarter = (rows.length + 3) / 4
    val root = run(rows.grouped(quarter).toSeq, restartAfter = 2)
    val got = AttributionStream.report(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = graft.queries.Events.lastTouchAttribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want)
  }

  test("replayed fold is idempotent: re-running a batch rewrites identical artifacts") {
    val root = run(Seq(
      Seq(AE(1, t(0), 1, "click", 0)),
      Seq(AE(1, t(10), 2, "purchase", 7.0), AE(1, t(20), 3, "view", 0))))
    def snap() = (
      AttributionStream.report(spark, root).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq,
      spark.read.parquet(s"$root/state/gen=1")
        .collect().map(_.toString).sorted.toSeq)
    val before = snap()
    // at-least-once delivery: batch 1 fires again with the same rows —
    // the generation chain reads only gen < 1, so the rewrite is exact
    AttributionStream.fold(
      Seq(AE(1, t(10), 2, "purchase", 7.0), AE(1, t(20), 3, "view", 0))
        .toDF(), root, 1L)
    assert(snap() === before)
  }
}
