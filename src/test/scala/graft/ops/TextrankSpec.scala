package graft.ops

import graft.SparkSpec
import graft.queries.LlmOps

/** TextRank window extraction: hand-computed ranks on a constructed
  * path-graph document, the per-doc stop-token df cap, and real-corpus
  * shape invariants.
  */
class TextrankSpec extends SparkSpec {
  import spark.implicits._

  private def win(tokens: Seq[String]): String = {
    require(tokens.size == 20)
    tokens.mkString(" ")
  }

  // doc 1: three 20-token windows chained w0–w1–w2 by 2-token overlaps
  private val w0 = win((1 to 18).map(i => s"a$i") ++ Seq("s1", "s2"))
  private val w1 = win(Seq("s1", "s2") ++ (1 to 16).map(i => s"b$i") ++ Seq("t1", "t2"))
  private val w2 = win(Seq("t1", "t2") ++ (1 to 18).map(i => s"c$i"))

  test("hand-computed: path graph ranks the middle window first; ties break by wi") {
    val docs = Seq((1L, s"$w0 $w1 $w2")).toDF("doc_id", "text")
    val got = LlmOps.textrankOver(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // graph: 0–1–2 path. r0 = 1e6 each; deg = (1, 2, 1)
    // iter1: r(0)=r(2)=(15e6+85·5e5)//100=575000, r(1)=(15e6+85·2e6)//100=1850000
    // iter2: r(0)=r(2)=(15e6+85·925000)//100=936250, r(1)=(15e6+85·1150000)//100=1127500
    assert(got.toSeq === Seq((1L, 1, 1127500L, 1L), (1L, 0, 936250L, 2L)))
  }

  test("per-doc stop-token cap: a token spanning >8 windows builds no edges") {
    // 10 windows, each sharing ONLY the token "stop" (plus 2 repeats of
    // it to also exercise within-window dedup) — df(stop) = 10 > 8, so
    // the doc has no edges and no ranked windows
    val filler = (1 to 1000).map(i => s"u$i").iterator
    val text = (0 until 10).map { _ =>
      win(Seq("stop", "stop", "stop") ++ (1 to 17).map(_ => filler.next()))
    }.mkString(" ")
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    assert(LlmOps.textrankOver(docs).count() === 0)
  }

  test("shared counts are DISTINCT tokens: repeats within a window add nothing") {
    // w0/w1 share only token "x" but it appears twice in each window —
    // distinct shared = 1 < minShared = 2, so still no edge
    val wa = win(Seq("x", "x") ++ (1 to 18).map(i => s"p$i"))
    val wb = win(Seq("x", "x") ++ (1 to 18).map(i => s"q$i"))
    val docs = Seq((3L, s"$wa $wb")).toDF("doc_id", "text")
    assert(LlmOps.textrankOver(docs).count() === 0)
  }

  test("real corpus: ≤2 rows per doc, rn ∈ {1,2} dense, ranks positive") {
    val rows = LlmOps.textrank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val rns = rs.map(_._4).sorted.toSeq
      assert(rns === (1L to rns.length).toSeq, s"doc $doc rn not dense: $rns")
      assert(rs.length <= 2, s"doc $doc has ${rs.length} rows")
      assert(rs.forall(_._3 > 0), s"doc $doc nonpositive rank")
      // rn order agrees with (rank desc, wi) order
      val byRn = rs.sortBy(_._4).map(r => (-r._3, r._2)).toSeq
      assert(byRn === byRn.sorted, s"doc $doc rn disagrees with rank order")
    }
  }

  test("map-only plan shape: no aggregate exchanges, let-bound kernel stays single-copy") {
    // the r16 rework runs the whole per-doc kernel in-row: at most the
    // size-conditional spread + the output sort may exchange, and the
    // let-binding must keep each pipeline step evaluated ONCE — a
    // regression to inlined withColumn steps multiplied array_sort
    // ~100× in the optimized plan (924 nodes) and made sf0.001
    // unrunnable
    val df = LlmOps.textrank(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected ≤2 exchanges, got $exchanges")
    val sorts = "array_sort".r.findAllIn(plan).length
    // the kernel holds 4 array_sorts (hw0, cps, nodes, top-2); allow
    // headroom for plan-string repetition but fail the collapse class
    assert(sorts <= 12, s"array_sort duplicated in plan: $sorts copies")
  }
}
