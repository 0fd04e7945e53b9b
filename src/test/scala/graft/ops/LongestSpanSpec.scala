package graft.ops

import graft.SparkSpec
import graft.queries.LlmOps
import org.apache.spark.sql.functions._

/** Arbitrary-length exact-substring dedup (seed-and-extend longest
  * shared run): hand-built ground truth (exact span boundaries,
  * maximality, the minSpan floor, pair fan-out), verbatim slice
  * verification on the real corpus, and the bounded-shuffle plan.
  */
class LongestSpanSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("lspan").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def toks(i: Range, p: String) = i.map(p + _).mkString(" ")

  test("hand corpus: exact span boundaries, maximality, minSpan floor, no same-doc pairs") {
    val shared = toks(1 to 20, "s") // the 20-token run
    val short = toks(1 to 10, "t") // 10 tokens: below the 16 floor
    val dir = writeDocs(Seq(
      1L -> s"${toks(1 to 10, "u")} $shared ${toks(1 to 10, "v")}",
      2L -> s"${toks(1 to 5, "w")} $shared ${toks(1 to 15, "x")}",
      3L -> s"$short ${toks(1 to 30, "y")} $short", // self-repeat only
      4L -> s"${toks(1 to 12, "z")} $short"))
    val got = LlmOps.dedupLongestSpan(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    // exactly one qualifying span: docs 1–2 share s1..s20; doc 1 offset
    // 11, doc 2 offset 6. The 10-token run (3–4, 4-internal) is under
    // the floor; doc 3's self-repeat must not pair with itself.
    assert(got.toSeq === Seq((1L, 2L, 11, 6, 20L)))
  }

  test("hand corpus: two disjoint runs in one pair are two rows; a 3-doc run is 3 pairs") {
    val runA = toks(1 to 16, "a")
    val runB = toks(1 to 18, "b")
    val dir = writeDocs(Seq(
      1L -> s"$runA ${toks(1 to 10, "f")} $runB",
      2L -> s"$runB ${toks(1 to 10, "g")} $runA",
      10L -> s"${toks(1 to 16, "c")}",
      11L -> s"${toks(1 to 3, "h")} ${toks(1 to 16, "c")}",
      12L -> s"${toks(1 to 16, "c")} ${toks(1 to 6, "k")}"))
    val got = LlmOps.dedupLongestSpan(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSet
    assert(got === Set(
      (1L, 2L, 1, 29, 16L), // runA: doc1 head, doc2 tail
      (1L, 2L, 27, 1, 18L), // runB: doc1 tail, doc2 head
      (10L, 11L, 1, 4, 16L), (10L, 12L, 1, 1, 16L), (11L, 12L, 4, 1, 16L)))
  }

  test("real corpus: every reported span is a verbatim token-slice match of length span_tokens") {
    val spans = LlmOps.dedupLongestSpan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    assert(spans.nonEmpty)
    val texts = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
      .map { case (id, t) => id -> t.trim.split("\\s+") }
    spans.foreach { case (a, b, as, bs, len) =>
      assert(len >= 16)
      val sa = texts(a).slice(as - 1, as - 1 + len.toInt)
      val sb = texts(b).slice(bs - 1, bs - 1 + len.toInt)
      assert(sa.length === len.toInt, s"span overruns doc $a")
      assert(sa.toSeq === sb.toSeq, s"span ($a,$b,$as,$bs,$len) not verbatim")
    }
    // and at least one span is EMBEDDED in a strictly longer doc — the
    // face localizes runs inside documents, not only doc ≡ doc pairs
    // (this corpus's dup pairs are containments: every span covers the
    // shorter side fully and sits inside the longer one, probed in
    // DuckDB before pinning)
    assert(spans.exists { case (a, b, _, _, len) =>
      len < math.max(texts(a).length, texts(b).length) })
  }

  test("doc coverage: interval union ≡ brute-force position marking; full-dup strictly below covered") {
    val spans = LlmOps.dedupLongestSpan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    // brute force: mark every covered token position per doc
    val marks = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Int]]()
    def mark(d: Long, s: Int, len: Long): Unit = {
      val set = marks.getOrElseUpdate(d, scala.collection.mutable.Set[Int]())
      (s until s + len.toInt).foreach(set += _)
    }
    spans.foreach { case (a, b, as, bs, len) => mark(a, as, len); mark(b, bs, len) }
    val got = LlmOps.dedupDocCoverage(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val srcOf = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    val wantCovered = marks.toSeq.groupBy { case (d, _) => srcOf(d) }
      .view.mapValues(_.map(_._2.size.toLong).sum).toMap
    got.foreach { case (src, docsCov, docsFull, covTok, totTok) =>
      assert(covTok === wantCovered.getOrElse(src, 0L),
        s"$src covered tokens diverge from brute force")
      assert(docsFull <= docsCov && covTok <= totTok)
    }
    // non-degenerate on this corpus: some covered docs are NOT full dups
    assert(got.map(_._2).sum > got.map(_._3).sum,
      "every covered doc is a full dup — the partial-coverage signal is dead")
    assert(got.map(_._3).sum > 0L, "no full dups found — census dead")
  }

  test("plan: bounded shuffles, no cartesian") {
    val df = LlmOps.dedupLongestSpan(spark, sf)
    df.collect()
    assert(PlanMetrics.exchangeCount(df) <= 6,
      s"expected gram/occ/pair-keyed exchanges only, got ${PlanMetrics.exchangeCount(df)}")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "all-pairs join leaked in")
  }
}
