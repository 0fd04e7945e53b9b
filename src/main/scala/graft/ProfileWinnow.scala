package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch profiler for the q_winnow_pairs sf0.1 constant — times the
  * full postings-shaped query and its stages separately, min-of-N.
  */
object ProfileWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val b = EngineSession.builder(cpus.toInt, smallInputTuning = true)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String, n: Int = 6)(f: => Long): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        val r = f
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, r)
      }
      println(f"$label%-30s min=${ts.map(_._1).min}%.3f all=${ts.map(t => f"${t._1}%.3f").mkString(",")} rows=${ts.head._2}")
    }

    val docs = Tables.load(spark, sfDir, "documents")
    time("full postings plan") {
      graft.queries.LlmOps.winnowPairs(spark, sfDir).count()
    }
    val fp = docs.select(col("doc_id"),
      explode(graft.functions.GraftFunctions.winnowHashes(col("text"), 5, 4))
        .as("fp"))
    time("scan+kernel+explode") {
      fp.select(count(lit(1))).collect()(0).getLong(0)
    }
    time("fp exchange + postings agg") {
      fp.groupBy("fp")
        .agg(graft.functions.GraftFunctions
          .boundedPostings(col("doc_id"), lit(0L), 1000).as("p"))
        .select(count(lit(1))).collect()(0).getLong(0)
    }
    time("postings + pair gen (no 2nd exch)") {
      fp.groupBy("fp")
        .agg(graft.functions.GraftFunctions
          .boundedPostings(col("doc_id"), lit(0L), 1000).as("p"))
        .filter(col("p.df") <= 1000 && size(col("p.ids")) >= 2)
        .select(graft.functions.GraftFunctions.longPairs(col("p.ids"))
          .as(Seq("doc_a", "doc_b")))
        .select(count(lit(1))).collect()(0).getLong(0)
    }
    time("full, AQE pair exchange") {
      fp.groupBy("fp")
        .agg(graft.functions.GraftFunctions
          .boundedPostings(col("doc_id"), lit(0L), 1000).as("p"))
        .filter(col("p.df") <= 1000 && size(col("p.ids")) >= 2)
        .select(graft.functions.GraftFunctions.longPairs(col("p.ids"))
          .as(Seq("doc_a", "doc_b")))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .count()
    }
    for (np <- Seq(8, 16, 32)) time(s"full, fp pinned $np + AQE pairs") {
      fp.repartition(np, col("fp"))
        .groupBy("fp")
        .agg(graft.functions.GraftFunctions
          .boundedPostings(col("doc_id"), lit(0L), 1000).as("p"))
        .filter(col("p.df") <= 1000 && size(col("p.ids")) >= 2)
        .select(graft.functions.GraftFunctions.longPairs(col("p.ids"))
          .as(Seq("doc_a", "doc_b")))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .count()
    }
    spark.stop()
  }
}
