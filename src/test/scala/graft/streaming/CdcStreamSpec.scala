package graft.streaming

import graft.SparkSpec
import graft.dv3f.{Dv3fConfig, Upsert}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Change-log stream → versioned table: micro-batches fold through
  * Upsert.mergeCdc (latest-wins I/U/D), checkpoint-restart resumes
  * without duplicating or losing effects, and deletes are carried
  * through — the compacted-topic materializer contract.
  */
case class C(uid: String, nbtrans: Long, op: String, seq: Long)

class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private val table = Dv3fConfig.departement

  test("cdc stream: I/U/D micro-batches fold in; restart resumes exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val target = java.nio.file.Files.createTempDirectory("cdc_tbl").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("cdc_ckpt").toString
    val mem = MemoryStream[C]
    def start() = CdcStream.start(mem.toDS().toDF(), target, table, ckpt)

    val q1 = start()
    try {
      mem.addData(C("k1", 1L, "I", 1L), C("k2", 2L, "I", 1L), C("k3", 3L, "I", 1L))
      q1.processAllAvailable()
      assert(Upsert.read(spark, target).count() === 3)
      // update + delete in one batch, two waves on k1 (latest wins)
      mem.addData(C("k1", 10L, "U", 2L), C("k1", 42L, "U", 3L), C("k2", 0L, "D", 2L))
      q1.processAllAvailable()
    } finally q1.stop()

    val mid = Upsert.read(spark, target)
    assert(mid.count() === 2)
    assert(mid.filter($"uid" === "k1").select("nbtrans").head.getLong(0) === 42L)
    assert(mid.filter($"uid" === "k2").count() === 0)

    // kill-and-resume from the checkpoint: the next batch lands on the
    // recovered offsets; prior effects are not re-applied or lost
    val versionsBefore = Upsert.versions(spark, target)
    val q2 = start()
    try {
      mem.addData(C("k3", 0L, "D", 2L))
      q2.processAllAvailable()
    } finally q2.stop()

    val fin = Upsert.read(spark, target)
    assert(fin.count() === 1)
    assert(fin.select("uid").head.getString(0) === "k1")
    assert(fin.select("nbtrans").head.getLong(0) === 42L)
    // exactly one more commit than before the restart (versions() only
    // lists the keepCommits snapshots vacuum retains — compare heads)
    assert(Upsert.versions(spark, target).max === versionsBefore.max + 1)
    // unfed columns aligned to the declared schema as NULLs
    assert(fin.filter(col("valeurfonc_sum").isNull).count() === 1)
  }
}
