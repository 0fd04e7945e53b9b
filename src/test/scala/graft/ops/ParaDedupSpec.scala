package graft.ops

import graft.SparkSpec
import graft.queries.LlmOps
import org.apache.spark.sql.functions._

/** Paragraph/boilerplate dedup (the CCNet line-level pass over fixed
  * 20-token blocks): hand-built census ground truth (shared block
  * dropped everywhere, short tail blocks kept, a fully-boilerplate doc
  * emptied), driver brute-force replay on the real corpus, and the
  * bounded-shuffle plan.
  */
class ParaDedupSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("paradedup").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def toks(i: Range, p: String) = i.map(p + _).mkString(" ")

  test("hand corpus: shared block dropped from every doc, uniques kept, full-boilerplate doc emptied") {
    val boiler = toks(1 to 20, "b")
    val dir = writeDocs(Seq(
      1L -> s"$boiler ${toks(1 to 10, "u")}",              // blocks: boiler, u-tail
      2L -> s"${toks(1 to 20, "w")} $boiler ${toks(1 to 5, "x")}",
      3L -> toks(1 to 30, "y"),                            // 2 unique blocks
      4L -> boiler))                                       // emptied entirely
    val got = LlmOps.paraDedup(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // boiler occurs 3× (docs 1, 2, 4) → dropped everywhere; every other
    // block is unique. toks_after re-tokenizes the reassembled text:
    // doc1 10, doc2 25, doc3 30, doc4 0.
    assert(got.toSeq === Seq(("spec", 4L, 3L, 3L, 125L, 65L)))
  }

  test("real corpus ≡ driver brute-force replay (segmentation, freq gate, reassembly census)") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    val blocks = docs.map { case (id, src, t) =>
      val ts = t.trim.split("\\s+")
      (id, src, ts.grouped(20).map(_.mkString(" ")).toVector, ts.length)
    }
    val freq = blocks.flatMap(_._3).groupBy(identity).view.mapValues(_.size)
    val perSource = blocks.groupBy(_._2).view.map { case (src, ds) =>
      val rows = ds.map { case (_, _, bs, n0) =>
        val kept = bs.filter(freq(_) < 2)
        val clean = kept.mkString(" ")
        val n1 = if (clean.isEmpty) 0L
                 else clean.trim.split("\\s+").length.toLong
        (bs.size.toLong, kept.size.toLong, n0.toLong, n1)
      }
      src -> (rows.length.toLong,
        rows.count { case (nb, nk, _, _) => nk < nb }.toLong,
        rows.map { case (nb, nk, _, _) => nb - nk }.sum,
        rows.map(_._3).sum, rows.map(_._4).sum)
    }.toMap
    val got = LlmOps.paraDedup(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got === perSource)
    // non-degenerate: something was dropped, nothing inverted
    assert(got.values.map(_._3).sum > 0L, "no boilerplate found — face dead")
    got.values.foreach { case (_, _, _, before, after) =>
      assert(after <= before)
    }
  }

  test("incremental: delta cleaned against the staged base-frequency artifact ≡ the full-corpus rule") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    val blocksOf = (t: String) => t.trim.split("\\s+")
      .grouped(20).map(_.mkString(" ")).toVector
    // full-corpus frequencies, rule applied to delta docs only
    val freq = docs.flatMap(d => blocksOf(d._3)).groupBy(identity)
      .view.mapValues(_.size)
    val want = docs.filter(_._1 % 17 == 0).groupBy(_._2).view.map {
      case (src, ds) =>
        val rows = ds.map { case (_, _, t) =>
          val bs = blocksOf(t)
          val kept = bs.filter(freq(_) < 2)
          val clean = kept.mkString(" ")
          (bs.size.toLong, kept.size.toLong,
            t.trim.split("\\s+").length.toLong,
            if (clean.isEmpty) 0L else clean.split("\\s+").length.toLong)
        }
        src -> (rows.length.toLong,
          rows.count { case (nb, nk, _, _) => nk < nb }.toLong,
          rows.map { case (nb, nk, _, _) => nb - nk }.sum,
          rows.map(_._3).sum, rows.map(_._4).sum)
    }.toMap
    val got = LlmOps.paraDedupIncr(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got === want, "incremental clean != full-corpus rule on the delta")
    // the staged artifact is vocabulary-sized: one row per distinct
    // BASE block hash (never block instances, never text)
    val art = spark.read.parquet(graft.ops.StageOnce.tmp("para_freq_base", sf))
    val baseDistinct = docs.filter(_._1 % 17 != 0).flatMap(d => blocksOf(d._3))
      .distinct.length
    assert(art.count() === baseDistinct.toLong)
    assert(art.columns.toSet === Set("h", "cnt"), "artifact must carry counts only")
  }

  test("bloom tier ≡ broadcast tier: identical census, bloom filter in the plan, no cartesian") {
    val want = LlmOps.paraDedup(spark, sf).collect().map(_.toString).toSeq
    val df = LlmOps.paraDedupBloom(spark, sf)
    val got = df.collect().map(_.toString).toSeq
    assert(got === want, "bloom prefilter changed the verdicts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "bloom prefilter missing from the physical plan — the tier is a no-op")
    assert(!plan.contains("CartesianProduct"), "all-pairs join leaked in")
    // tiny FP budget also exercised: an undersized bloom (more FPs,
    // more suspects through the exact anti-join) must not change results
    val tight = LlmOps.paraDedupBloom(spark, sf, expectedDropKeys = 8)
      .collect().map(_.toString).toSeq
    assert(tight === want, "false positives leaked past the exact anti-join")
  }

  test("plan: bounded shuffles, no cartesian") {
    val df = LlmOps.paraDedup(spark, sf)
    df.collect()
    assert(PlanMetrics.exchangeCount(df) <= 5,
      s"expected hash/doc/source-keyed exchanges only, got ${PlanMetrics.exchangeCount(df)}")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "all-pairs join leaked in")
  }
}
