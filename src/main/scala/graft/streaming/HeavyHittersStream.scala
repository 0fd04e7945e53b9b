package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING Misra-Gries maintenance — the frequency sketch running on
  * the admission path (completing the streaming story for the sketch
  * family the way the IVM faces completed it for aggregates): every
  * arriving micro-batch folds its gram counts into a persisted
  * k-counter MG state by the mergeable-summaries rule (Agarwal et al.
  * PODS 2012: add counts, subtract the (k+1)-th largest, drop ≤ 0), so
  * at any moment the monitor answers "which grams might exceed
  * frequency N/(k+1)" from a k-sized artifact — the hot-key /
  * trending-phrase alarm a production gate keeps beside itself.
  *
  * State = one parquet generation per batch: ≤ k (code, cnt) rows plus
  * a sentinel row carrying the stream's total gram count. Exactly-once
  * by the generation chain (the [[Scd2Stream]]/[[IvmMinMaxStream]]
  * convention): batch i reads the LATEST generation < i and overwrites
  * gen=i — a checkpoint-recovery replay re-reads the same predecessor
  * and rewrites identical bytes.
  *
  * The sequential fold is a left-deep merge tree, so the mergeable
  * bound holds: every gram with true stream frequency > N/(k+1) is in
  * the final state. The report therefore candidate-restricts an exact
  * recount over the admitted corpus (the batch face's verify leg) and
  * emits EXACTLY the batch face's output — converged ≡ batch is the
  * hash-gated contract, with the stream's own sentinel total as N
  * (a dropped or double-counted batch would shift the θ gate and
  * hash-mismatch).
  *
  * Per-batch cost: one char-sweep over the batch (batch-vocab-sized
  * exact counts), a driver-side merge of two ≤ k+vocab_batch maps, one
  * k-sized parquet write — ∝ batch, never ∝ stream history.
  */
object HeavyHittersStream extends Serializable {

  val K = 256
  val Sentinel: Long = Long.MinValue

  def start(docs: DataFrame, root: String, checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        fold(batch, root, batchId)
      }
      .start()

  private def latestGenBefore(spark: SparkSession, root: String,
      batchId: Long): Option[Long] = {
    val d = new java.io.File(s"$root/state")
    if (!d.exists()) return None
    d.listFiles().toSeq
      .map(_.getName).filter(_.startsWith("gen="))
      .map(_.stripPrefix("gen=").toLong).filter(_ < batchId)
      .sorted.lastOption
  }

  /** One maintenance step (visible for the replay-idempotence spec). */
  def fold(batch: DataFrame, root: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.{Encoders => Encs}
    // batch-exact gram counts via the same 48-bit char sweep as the
    // batch face (batch-vocab-sized result)
    val batchCounts = batch.select(col("text")).as(Encs.STRING)
      .mapPartitions { it =>
        val m = scala.collection.mutable.LongMap.empty[Long]
        var np = 0L
        it.foreach { t =>
          var i = 0
          val n = t.length - 2
          while (i < n) {
            val code = (t.charAt(i).toLong << 32) |
              (t.charAt(i + 1).toLong << 16) | t.charAt(i + 2).toLong
            m(code) = m.getOrElse(code, 0L) + 1
            np += 1
            i += 1
          }
        }
        m.iterator ++ Iterator((Sentinel, np))
      }(Encs.tuple(Encs.scalaLong, Encs.scalaLong))
      .toDF("code", "cnt")
      .groupBy(col("code")).agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // prior state (≤ k+1 rows) + driver-side mergeable-summaries fold
    val prior = latestGenBefore(spark, root, batchId) match {
      case Some(g) => spark.read.parquet(s"$root/state/gen=$g")
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      case None => Array.empty[(Long, Long)]
    }
    val merged = scala.collection.mutable.LongMap.empty[Long]
    var total = 0L
    (prior ++ batchCounts).foreach { case (code, c) =>
      if (code == Sentinel) total += c
      else merged(code) = merged.getOrElse(code, 0L) + c
    }
    if (merged.size > K) {
      val kth = merged.values.toArray.sorted(Ordering[Long].reverse).apply(K)
      val keys = merged.keysIterator.toArray
      var i = 0
      while (i < keys.length) {
        val kk = keys(i); val v = merged(kk) - kth
        if (v <= 0) merged -= kk else merged(kk) = v
        i += 1
      }
    }
    val out = merged.toSeq :+ (Sentinel, total)
    import spark.implicits._
    out.toDF("code", "cnt").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/state/gen=$batchId")
  }

  /** Converged report ≡ the batch face: candidates from the final MG
    * generation, exact candidate-restricted recount over the admitted
    * corpus, θ = N/200 on the stream's own total.
    */
  def report(spark: SparkSession, root: String, dir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders => Encs}
    val lastGen = latestGenBefore(spark, root, Long.MaxValue)
      .getOrElse(sys.error(s"no MG state under $root"))
    val state = spark.read.parquet(s"$root/state/gen=$lastGen")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = state.filter(_._1 == Sentinel).map(_._2).sum
    val candSet = state.map(_._1).filter(_ != Sentinel).toSet
    val candB = spark.sparkContext.broadcast(candSet)
    graft.Tables.load(spark, dir, "documents")
      .filter(length(col("text")) >= 3)
      .select(col("text")).as(Encs.STRING)
      .mapPartitions { it =>
        val cand = candB.value
        val cnt = scala.collection.mutable.LongMap.empty[Long]
        it.foreach { t =>
          var i = 0
          val m = t.length - 2
          while (i < m) {
            val code = (t.charAt(i).toLong << 32) |
              (t.charAt(i + 1).toLong << 16) | t.charAt(i + 2).toLong
            if (cand.contains(code)) cnt(code) = cnt.getOrElse(code, 0L) + 1
            i += 1
          }
        }
        cnt.iterator.map { case (code, c) =>
          (new String(Array(((code >> 32) & 0xFFFF).toChar,
            ((code >> 16) & 0xFFFF).toChar, (code & 0xFFFF).toChar)), c)
        }
      }(Encs.tuple(Encs.STRING, Encs.scalaLong))
      .toDF("gram", "cnt")
      .groupBy(col("gram")).agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") * 200 >= n)
      .select(col("gram"), col("cnt"),
        round(col("cnt") * lit(100.0) / n, 6).as("pct"))
  }
}
