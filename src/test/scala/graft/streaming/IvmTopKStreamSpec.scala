package graft.streaming

import graft.SparkSpec
import graft.queries.Maintenance
import org.apache.spark.sql.functions._

/** Streaming top-k IVM: converged ≡ batch through kill-and-resume,
  * replayed-fold idempotence, and the two streaming-only rescan traps
  * on a hand fixture — a rescan must RECOVER a row the buffer
  * truncated in an earlier batch, and must NET OUT a deleted stream
  * insert (a base-only rescan gets both wrong).
  */
class IvmTopKStreamSpec extends SparkSpec {
  import spark.implicits._

  test("converged ≡ batch face through kill-and-resume") {
    val got = Maintenance.ivmTopKStreamMaterialize(spark, sf)
      .collect().map(_.toString).toSeq
    val expected = Maintenance.ivmTopK(spark, sf)
      .collect().map(_.toString).toSeq
    assert(got === expected)
  }

  test("hand fixture: truncated-row recovery and net-zero stream insert under rescan") {
    val dir = java.nio.file.Files.createTempDirectory("topk_stream_fix").toString
    // one group, base: 100..40 (k 1..7) — buffer = top-6 (100..50), FULL
    Seq((10L, 100.0, 1L), (10L, 90.0, 2L), (10L, 80.0, 3L), (10L, 70.0, 4L),
      (10L, 60.0, 5L), (10L, 50.0, 6L), (10L, 40.0, 7L))
      .toDF("annee", "v", "k")
      .write.mode("overwrite").parquet(s"$dir/base")
    def ch(rows: Seq[(Long, Option[Double], Option[Double], Long)]) =
      rows.toDF("annee", "old_v", "new_v", "k")
    // batch 0: insert 95 (k=20) — enters the buffer, TRUNCATING 50
    // (k=6) out of it; 50 is now recoverable only via base∪log logic
    IvmTopKStream.fold(ch(Seq((10L, None, Some(95.0), 20L))),
      dir, s"$dir/base", 0L)
    val buf0 = spark.read.parquet(s"$dir/buf/gen=0")
      .collect().map(r => (r.getDouble(1), r.getLong(2))).toSet
    assert(buf0 === Set((100.0, 1L), (95.0, 20L), (90.0, 2L), (80.0, 3L),
      (70.0, 4L), (60.0, 5L)), s"batch-0 buffer wrong: $buf0")
    // batch 1: delete the stream insert (95) AND two more buffer rows
    // → survivors 3 < k=5 → rescan. The rescan must yield
    // 80,70,60,50,40 — including the TRUNCATED 50 (trap 1) and
    // excluding the deleted stream-inserted 95 (trap 2).
    IvmTopKStream.fold(ch(Seq(
      (10L, Some(95.0), None, 20L),
      (10L, Some(100.0), None, 1L),
      (10L, Some(90.0), None, 2L))),
      dir, s"$dir/base", 1L)
    val got = IvmTopKStream.view(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === Seq((1L, 3L, 80.0), (2L, 4L, 70.0), (3L, 5L, 60.0),
      (4L, 6L, 50.0), (5L, 7L, 40.0)), s"rescan wrong: $got")
  }

  test("replayed fold is idempotent: re-running a generation rewrites identical rows") {
    Maintenance.ivmTopKStreamMaterialize(spark, sf).count() // ensure staged
    val root = graft.ops.StageOnce.tmp("ivm_topk_stream", sf)
    val base = graft.ops.StageOnce.tmp("ivm_topk_base", sf)
    val gen1 = spark.read.parquet(s"$root/buf/gen=1")
      .collect().map(_.toString).sorted.toSeq
    val batch1 = Maintenance.ivmMinMaxChangeRows(spark, sf)
      .filter(col("k") % 3 === 1)
    IvmTopKStream.fold(batch1, root, base, 1L)
    val replayed = spark.read.parquet(s"$root/buf/gen=1")
      .collect().map(_.toString).sorted.toSeq
    assert(replayed === gen1, "replaying batch 1 changed the generation artifact")
  }
}
