package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming drift monitor: running per-centroid (n, mean-vs-centroid)
  * state over micro-batches, equivalent to a batch recompute over the
  * same prefix; checkpoint-restart resumes the state exactly-once.
  * Vectors use integer-valued components so the running double sums
  * are exact regardless of fold order.
  */
case class V(vec_id: Long, embedding: Seq[Double])

class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  // two frozen "centroids" on the axes: vectors sort by cosine cleanly
  private val centroids = Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0))

  // foreachBatch sink (supports checkpoint recovery, unlike memory):
  // emissions accumulate in a driver-side buffer per spec run
  private val emitted =
    new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Double)]()

  private def run(ckpt: String, mem: MemoryStream[V]) =
    DriftStream.driftAgainst(mem.toDF(), centroids)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[DriftStream.DriftRow], _: Long) =>
        df.collect().foreach(r => emitted.add((r.centroid, r.n_seen, r.drift_cos)))
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .start()

  private def latest(): Map[Int, (Long, Double)] = {
    import scala.jdk.CollectionConverters._
    emitted.asScala.toSeq
      // update mode re-emits: keep the row with the highest n per centroid
      .groupBy(_._1).map { case (c, rs) =>
        val best = rs.maxBy(_._2)
        c -> (best._2, best._3)
      }
  }

  test("drift stream: running state ≡ batch recompute; restart is exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("drift_ckpt").toString
    val mem = MemoryStream[V]
    val q1 = run(ckpt, mem)

    try {
      // batch 1: two vectors to centroid 0, one to centroid 1
      mem.addData(V(1, Seq(4.0, 0.0)), V(2, Seq(2.0, 2.0)), V(3, Seq(0.0, 6.0)))
      q1.processAllAvailable()
      // (4,0) and (2,2)? cos((2,2),(1,0)) = .707 < cos((2,2),(0,1)) = .707 —
      // a tie: ivfAssign breaks ties by the greatest-struct rule; just
      // assert totals instead of per-centroid composition for this row
      val t1 = latest()
      assert(t1.values.map(_._1).sum == 3L, s"3 vectors folded: $t1")

      // batch 2: unambiguous additions
      mem.addData(V(4, Seq(10.0, 0.0)), V(5, Seq(0.0, 10.0)))
      q1.processAllAvailable()
      val t2 = latest()
      assert(t2.values.map(_._1).sum == 5L, s"5 vectors folded: $t2")
      // drift numbers are valid cosines
      t2.values.foreach { case (_, c) => assert(c >= -1.0 && c <= 1.0) }
    } finally q1.stop()

    // restart from the checkpoint: a new batch folds into RECOVERED
    // state (counts continue, not restart from 0). Update-mode memory
    // sink only holds the NEW emission — the centroid V(6) lands in —
    // so assert that row against a batch recompute of the full prefix
    emitted.clear() // isolate the post-restart emissions
    val q2 = run(ckpt, mem)
    try {
      mem.addData(V(6, Seq(8.0, 0.0)))
      q2.processAllAvailable()
      val t3 = latest()
      assert(t3.keySet == Set(0), s"only the touched centroid re-emits: $t3")
      // batch recompute over the full prefix agrees with the stream's
      // centroid-0 row (integer components ⇒ exact sums)
      val all = Seq(V(1, Seq(4.0, 0.0)), V(2, Seq(2.0, 2.0)),
        V(3, Seq(0.0, 6.0)), V(4, Seq(10.0, 0.0)), V(5, Seq(0.0, 10.0)),
        V(6, Seq(8.0, 0.0)))
      val assigned = graft.ops.Similarity.ivfAssign(
        all.toDF("vec_id", "embedding"),
        org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"), centroids)
        .collect().map(r => r.getInt(2) ->
          r.getSeq[Double](1).toArray).groupBy(_._1)
      assigned.filter(_._1 == 0).foreach { case (cid, vs) =>
        val n = vs.length.toLong
        val sum = vs.map(_._2).transpose.map(_.sum)
        def r6(x: Double) = BigDecimal(x)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val mean = sum.map(x => r6(x / n))
        val c = centroids.toMap.apply(cid)
        val dot = mean.zip(c).map { case (a, b) => a * b }.sum
        val want = r6(dot / (math.sqrt(mean.map(x => x * x).sum) *
          math.sqrt(c.map(x => x * x).sum)))
        assert(t3(cid) == ((n, want)),
          s"centroid $cid: stream ${t3(cid)} != batch ($n, $want)")
      }
    } finally q2.stop()
  }
}
