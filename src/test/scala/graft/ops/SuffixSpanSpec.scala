package graft.ops

import graft.SparkSpec
import graft.queries.LlmOps
import org.apache.spark.sql.functions._

/** Cap-free duplicate coverage via prefix doubling: the doubling chain
  * reproduces direct 16-gram duplication structure exactly, coverage
  * dominates the rare-anchor-capped face, the documented hot-run gap
  * (a run hotter than maxOcc in every window) is CLOSED, and the plan
  * stays bounded with no cartesian.
  */
class SuffixSpanSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("sspan").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def toks(i: Range, p: String) = i.map(p + _).mkString(" ")

  test("doubling windows ≡ direct 16-gram duplication structure on the real corpus") {
    val viaDoubling = LlmOps.suffixDupWindows(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    // direct formulation: one 16-wide kernel gram per position, window
    // duplicated iff its value occurs in ≥2 distinct docs
    val g16 = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), posexplode(graft.functions.GraftFunctions
        .tokenGramHashes(col("text"), 16)).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("s"), col("h"))
    val dupH = g16.groupBy("h").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2).select("h")
    val direct = g16.join(dupH, Seq("h")).select("doc_id", "s").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(viaDoubling === direct,
      "prefix-doubling window duplication diverges from the direct 16-gram build")
    assert(viaDoubling.nonEmpty, "no duplicated windows found — face degenerate")
  }

  test("coverage dominates the rare-anchor-capped longest-span face per source") {
    val capped = LlmOps.dedupDocCoverage(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap // covered_tokens
    val free = LlmOps.dedupSuffixSpan(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    capped.foreach { case (src, covCapped) =>
      assert(free.getOrElse(src, 0L) >= covCapped,
        s"$src: cap-free coverage ${free.get(src)} < capped $covCapped")
    }
  }

  test("the hot-run gap is closed: a run shared by 40 docs (every window hotter than maxOcc) is covered") {
    val hotRun = toks(1 to 18, "hot") // 18 tokens ≥ minSpan 16
    val docs = (1L to 40L).map { id =>
      id -> s"${toks(1 to 5, s"u${id}x")} $hotRun ${toks(1 to 5, s"v${id}x")}"
    }
    val dir = writeDocs(docs)
    // the capped face misses it entirely: every 8-gram of the run
    // occurs 40 > maxOcc=32 times, so no anchor survives the rare gate
    assert(LlmOps.dedupLongestSpan(spark, dir).collect().isEmpty,
      "expected the rare-anchor cap to miss the hot run (the documented gap)")
    // the suffix-span face covers exactly the 18 run tokens in all 40 docs
    val got = LlmOps.dedupSuffixSpan(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(("spec", 40L, 0L, 40L * 18L, 40L * 28L, 40L * 3L)),
      s"got ${got.toSeq}")
  }

  test("plan: bounded shuffles, no cartesian, log-round doubling joins only") {
    val df = LlmOps.dedupSuffixSpan(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "all-pairs join leaked in")
    assert(PlanMetrics.exchangeCount(df) <= 12,
      s"expected log-round (doc,pos)-keyed exchanges only, got ${PlanMetrics.exchangeCount(df)}")
  }
}
