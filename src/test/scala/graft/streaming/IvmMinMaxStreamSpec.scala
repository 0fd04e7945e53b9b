package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming min/max IVM: the rescan consults the stream's own value
  * log (not just the base snapshot), kill-and-resume, converged ≡
  * batch on the real corpus, replayed-fold idempotence.
  */
case class MM(annee: Long, old_v: java.lang.Double, new_v: java.lang.Double,
    k: Long)

class IvmMinMaxStreamSpec extends SparkSpec {
  import spark.implicits._

  private def run(basePath: String, batches: Seq[Seq[MM]],
      restartAfter: Int = -1): String = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("mmivm_root").toString
    val ckpt = java.nio.file.Files.createTempDirectory("mmivm_ckpt").toString
    val mem = MemoryStream[MM]
    def start() = IvmMinMaxStream.start(mem.toDS().toDF(), root, basePath, ckpt)
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

  private def writeBase(rows: Seq[(Long, Double)]): String = {
    val p = java.nio.file.Files.createTempDirectory("mmivm_base").toString
    rows.toDF("annee", "v").write.mode("overwrite").parquet(p)
    p
  }

  test("rescan is LOG-aware: deleting a stream-inserted extremum falls back to the stream's other insert, not the base") {
    val base = writeBase(Seq((2090L, 50.0), (2090L, 10.0), (2090L, 30.0),
      (2091L, 20.0)))
    val root = run(base, Seq(
      // batch 0: two inserts below the base min; one above the 2091 max
      Seq(MM(2090, null, 5.0, 1), MM(2090, null, 7.0, 2),
        MM(2091, null, 100.0, 3)),
      // batch 1 (after restart): delete BOTH stream-made extrema —
      // a base-only rescan would answer 10.0 / 20.0-as-max wrongly
      Seq(MM(2090, 5.0, null, 4), MM(2091, 100.0, null, 5))),
      restartAfter = 1)
    val got = IvmMinMaxStream.view(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got === Seq(
      (2090L, 4L, 97.0, 7.0, 50.0), // min = the surviving stream insert
      (2091L, 1L, 20.0, 20.0, 20.0)), s"got $got")
  }

  test("converged stream ≡ batch min/max face on the real corpus") {
    val got = graft.queries.Maintenance.ivmMinMaxStreamMaterialize(spark, sf)
      .collect().map(_.toString).toSeq
    val want = graft.queries.Maintenance.ivmMinMax(spark, sf)
      .collect().map(_.toString).toSeq
    assert(got === want, "stream != batch maintain")
    assert(got.nonEmpty)
  }

  test("replayed fold is idempotent: re-delivering a batch rewrites identical log and generation") {
    val base = writeBase(Seq((2090L, 10.0), (2090L, 40.0)))
    // 10 is INTERIOR after the batch-0 insert of 3 → blind fold path
    val b1 = Seq(MM(2090, 10.0, null, 9))
    val root = run(base, Seq(Seq(MM(2090, null, 3.0, 8)), b1))
    def snap() = (
      IvmMinMaxStream.view(spark, root).collect().map(_.toString).toSeq,
      spark.read.parquet(s"$root/log/batch=1").collect()
        .map(_.toString).sorted.toSeq)
    val before = snap()
    assert(before._1 === Seq("[2090,2,43.0,3.0,40.0]"))
    IvmMinMaxStream.fold(b1.toDF(), root, base, 1L) // at-least-once replay
    assert(snap() === before)
  }
}
