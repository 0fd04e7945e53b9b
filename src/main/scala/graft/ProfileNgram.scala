package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch profiler for the q_dedup_ngram_jaccard sf0.1 constant —
  * times the full query and its stages separately, min-of-N.
  */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val b = EngineSession.builder(cpus.toInt, smallInputTuning = true)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Dedup

    def time(label: String, n: Int = 5)(f: => Long): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        val r = f
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, r)
      }
      println(f"$label%-28s min=${ts.map(_._1).min}%.3f all=${ts.map(t => f"${t._1}%.3f").mkString(",")} rows=${ts.head._2}")
    }

    val docs = Tables.load(spark, sfDir, "documents")
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROFILE_ITERS", "6").toInt
    val fullOnly = sys.env.contains("SPARK_GRAFT_PROFILE_FULL_ONLY")
    // warmup whole pipeline
    time("full (warmup+steady)", iters) {
      graft.queries.LlmOps.ngramJaccard(spark, sfDir).count()
    }
    if (fullOnly) {
      instrumented(spark, sfDir)
      spark.stop()
      return
    }
    // stage 1: scan + shingles + explode + hash (no agg)
    time("scan+shingle+hash") {
      docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
        .select(col("doc_id"), size(col("sh")).cast(LongType).as("n_sh"),
          explode(col("sh")).as("shingle"))
        .select(col("doc_id"), col("n_sh"), Dedup.hash60(col("shingle")).as("h"))
        .select(count(lit(1))).collect()(0).getLong(0)
    }
    // stage 1b: same but without md5 hash
    time("scan+shingle (no hash)") {
      docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
        .select(col("doc_id"), size(col("sh")).cast(LongType).as("n_sh"),
          explode(col("sh")).as("shingle"))
        .select(count(lit(1))).collect()(0).getLong(0)
    }
    // stage 2: posting build (BoundedPostings agg) + filter
    val posts = docs
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .select(col("doc_id"), size(col("sh")).cast(LongType).as("n_sh"),
        explode(col("sh")).as("shingle"))
      .select(col("doc_id"), col("n_sh"), Dedup.hash60(col("shingle")).as("h"))
      .groupBy("h")
      .agg(graft.functions.GraftFunctions
        .boundedPostings(col("doc_id"), col("n_sh"), 1000).as("p"))
      .filter(col("p.df") <= 1000)
      .select(col("p.ids").as("ds"), col("p.ws").as("ns"))
    time("posting build (agg)") { posts.select(count(lit(1))).collect()(0).getLong(0) }
    // stage 2b: posting build via plain collect_list for comparison
    time("posting build collect_list") {
      docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
        .select(col("doc_id"), size(col("sh")).cast(LongType).as("n_sh"),
          explode(col("sh")).as("shingle"))
        .select(col("doc_id"), col("n_sh"), Dedup.hash60(col("shingle")).as("h"))
        .groupBy("h")
        .agg(count(lit(1)).as("df"),
          collect_list(col("doc_id")).as("ids"),
          collect_list(col("n_sh")).as("ws"))
        .filter(col("df") <= 1000)
        .select(count(lit(1))).collect()(0).getLong(0)
    }
    // stage 3: pair enumeration + aggregate (from cached postings)
    val postsCached = posts.cache()
    postsCached.count()
    time("pairs from cached posts") {
      postsCached
        .filter(size(col("ds")) >= 2)
        .select(graft.functions.GraftFunctions
          .longPairsWeighted(col("ds"), col("ns"))
          .as(Seq("doc_a", "n_a", "doc_b", "n_b")))
        .repartition(8, col("doc_a"), col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
        .agg(count(lit(1)).as("inter"))
        .filter(col("inter").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("inter")).cast(DoubleType) >= 0.1)
        .select(count(lit(1))).collect()(0).getLong(0)
    }
    postsCached.unpersist()
    instrumented(spark, sfDir)

    // variant: no explicit repartition (let AQE rule)
    time("full, no pinned repartition") {
      val p = docs
        .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
        .select(col("doc_id"), size(col("sh")).cast(LongType).as("n_sh"),
          explode(col("sh")).as("shingle"))
        .select(col("doc_id"), col("n_sh"), Dedup.hash60(col("shingle")).as("h"))
        .groupBy("h")
        .agg(graft.functions.GraftFunctions
          .boundedPostings(col("doc_id"), col("n_sh"), 1000).as("p"))
        .filter(col("p.df") <= 1000)
        .select(col("p.ids").as("ds"), col("p.ws").as("ns"))
        .filter(size(col("ds")) >= 2)
        .select(graft.functions.GraftFunctions
          .longPairsWeighted(col("ds"), col("ns"))
          .as(Seq("doc_a", "n_a", "doc_b", "n_b")))
        .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
        .agg(count(lit(1)).as("inter"))
        .filter(col("inter").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("inter")).cast(DoubleType) >= 0.1)
      p.select(count(lit(1))).collect()(0).getLong(0)
    }
    spark.stop()
  }

  /** One instrumented full run (per-job wall, per-stage wall/tasks),
    * then a per-operator SQL-metrics dump of a second run.
    */
  private def instrumented(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Unit = {
    val jobTimes = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Int)]
    val stageInfo = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Int)]
    val listener = new org.apache.spark.scheduler.SparkListener {
      private val jobStart = scala.collection.mutable.Map.empty[Int, Long]
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart(js.jobId) = System.nanoTime()
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobTimes += ((je.jobId, System.nanoTime() - jobStart.getOrElse(je.jobId, 0L), 0))
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stageInfo += ((si.stageId, si.name.take(60),
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.numTasks))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val tq0 = System.nanoTime()
    graft.queries.LlmOps.ngramJaccard(spark, sfDir).count()
    val tq1 = System.nanoTime()
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    println(f"instrumented full run: ${(tq1 - tq0) / 1e9}%.3f")
    jobTimes.foreach { case (id, ns, _) => println(f"  job $id%3d ${ns / 1e9}%.3f s") }
    stageInfo.foreach { case (id, name, ms, nt) =>
      println(f"  stage $id%3d ${ms / 1e3}%.3f s tasks=$nt $name") }

    // per-operator SQL metrics of one steady run
    val dfm = graft.queries.LlmOps.ngramJaccard(spark, sfDir)
    dfm.collect()
    def dump(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.filter { case (_, m) =>
        m.metricType == "timing" || m.metricType == "nsTiming" ||
          m.name.exists(n => n.contains("time") || n.contains("rows") || n.contains("records"))
      }
      val ms = interesting.map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
      println(("  " * depth) + p.nodeName + " | " + ms)
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          dump(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          dump(q.plan, depth + 1)
        case s: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          dump(s.child, depth + 1)
        case other => other.children.foreach(dump(_, depth + 1))
      }
    }
    println("---- metrics dump ----")
    dump(dfm.queryExecution.executedPlan, 0)
  }
}
