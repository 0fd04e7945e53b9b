package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming keep-first paragraph dedup: cross-batch state (a block
  * admitted in batch 1 blocks its batch-3 copy, across a restart),
  * converged census ≡ the global rank replay, keep-first vs drop-all
  * live divergence, replayed-fold idempotence.
  */
case class PD(doc_id: Long, text: String, source: String)

class ParaDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def toks(i: Range, p: String) = i.map(p + _).mkString(" ")

  private def run(batches: Seq[Seq[PD]], restartAfter: Int = -1): String = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("pds_root").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pds_ckpt").toString
    val mem = MemoryStream[PD]
    def start() = ParaDedupStream.start(mem.toDS().toDF(), root, ckpt)
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

  test("cross-batch keep-first: the batch-1 copy survives, the batch-3 copy drops, across a restart") {
    val boiler = toks(1 to 20, "b")
    val root = run(Seq(
      Seq(PD(1, s"$boiler ${toks(1 to 10, "u")}", "s1")),   // first copy kept
      Seq(PD(2, toks(1 to 20, "w"), "s1")),                 // unique, untouched
      Seq(PD(3, s"${toks(1 to 20, "y")} $boiler", "s2"))),  // copy 2 → dropped
      restartAfter = 2) // kill-and-resume BEFORE the duplicate arrives
    val got = ParaDedupStream.report(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === Seq(("s1", 2L, 0L, 0L, 50L, 50L),
      ("s2", 1L, 1L, 1L, 40L, 20L)), s"got $got")
  }

  test("converged stream ≡ global rank replay on the real corpus; keep-first < drop-all") {
    val got = graft.queries.LlmOps.paraDedupStreamMaterialize(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // driver replay of the global-rank rule
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").as[(Long, String, String)]
      .collect().sortBy(_._1)
    val seen = scala.collection.mutable.Map[String, Int]()
    val perSrc = scala.collection.mutable.Map[String, (Long, Long, Long, Long, Long)]()
    docs.foreach { case (_, src, t) =>
      val ts = t.trim.split("\\s+")
      val bs = ts.grouped(20).map(_.mkString(" ")).toVector
      val kept = bs.filter { b =>
        val n = seen.getOrElse(b, 0); seen(b) = n + 1; n == 0
      }
      val clean = kept.mkString(" ")
      val n1 = if (clean.isEmpty) 0L else clean.split("\\s+").length.toLong
      val (nd, dt, pd, tb, ta) = perSrc.getOrElse(src, (0L, 0L, 0L, 0L, 0L))
      perSrc(src) = (nd + 1, dt + (if (kept.size < bs.size) 1 else 0),
        pd + (bs.size - kept.size), tb + ts.length, ta + n1)
    }
    val want = perSrc.toSeq.sortBy(_._1)
      .map { case (s, (a, b, c, d, e)) => (s, a, b, c, d, e) }
    assert(got === want, "stream census != driver rank replay")
    // keep-first spares exactly the first copies: strictly fewer drops
    // than the drop-all batch face, but still live
    val dropAll = graft.queries.LlmOps.paraDedup(spark, sf).collect()
      .map(_.getLong(3)).sum
    val keepFirst = got.map(_._4).sum
    assert(keepFirst > 0L, "no duplicate blocks in stream order — face dead")
    assert(keepFirst < dropAll, "keep-first must spare the first copies")
  }

  test("replayed fold is idempotent: re-admitting a batch rewrites identical artifacts") {
    val boiler = toks(1 to 20, "q")
    val b1 = Seq(PD(5, s"$boiler ${toks(1 to 5, "z")}", "s3"))
    val root = run(Seq(Seq(PD(4, boiler, "s3")), b1))
    def snap() = (
      ParaDedupStream.report(spark, root).collect().map(_.toString).toSeq,
      spark.read.parquet(s"$root/state/gen=1")
        .collect().map(_.toString).sorted.toSeq)
    val before = snap()
    ParaDedupStream.fold(b1.toDF(), root, 1L) // at-least-once redelivery
    assert(snap() === before)
  }
}
