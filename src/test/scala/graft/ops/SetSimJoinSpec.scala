package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PPJoin: the prefix-filtered join must equal brute force exactly (no
  * false negatives — the theorem the operator exists to honor), the
  * threshold gate must be integer-exact, and the real-corpus face must
  * find exactly the planted near-dup pairs.
  */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def toks(sets: (Long, Seq[String])*) =
    sets.toSeq.flatMap { case (id, ts) => ts.distinct.map(id -> _) }
      .toDF("doc_id", "token")

  private def brute(sets: Map[Long, Set[String]], tNum: Int, tDen: Int) = {
    val ids = sets.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      inter = (sets(i) & sets(j)).size
      un = (sets(i) | sets(j)).size
      if inter * tDen >= un * tNum
    } yield (i, j, inter.toLong, un.toLong)).toSet
  }

  test("duplicate-input robustness: raw exploded tokens ≡ distinct tokens (in-aggregate collect_set dedup)") {
    // a caller passing raw (non-distinct) exploded tokens must get the
    // same pairs — per-doc dedup rides the doc-keyed collect_set, and
    // the inflated df counts only re-weight the (still total) prefix
    // order, which the theorems tolerate
    val dup = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "b"), (2L, "d"),
      (3L, "x"), (3L, "x"), (3L, "y")).toDF("doc_id", "token")
    val dist = dup.distinct()
    def run(df: org.apache.spark.sql.DataFrame) =
      SetSimJoin.ppjoin(df, 1, 2).collect().map(_.toString).sorted.toSeq
    assert(run(dup) === run(dist))
    // same for the cross face, both sides duplicated
    val bDup = Seq((10L, "a"), (10L, "a"), (10L, "b"), (10L, "c"))
      .toDF("doc_id", "token")
    def runCross(b: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame) =
      SetSimJoin.ppjoinCross(b, c, 1, 2)
        .collect().map(_.toString).sorted.toSeq
    assert(runCross(bDup, dup) === runCross(bDup.distinct(), dist))
    assert(runCross(bDup, dup).nonEmpty, "cross probe found nothing — vacuous")
  }

  test("prefix-filtered join ≡ brute force on a mixed-overlap corpus") {
    val sets = Map(
      1L -> Set("a", "b", "c", "d"),        // =2 exactly at τ=1/2 vs 2
      2L -> Set("a", "b", "c", "e"),        // jacc(1,2) = 3/5 ≥ 1/2
      3L -> Set("a", "b", "x", "y", "z"),   // jacc(1,3) = 2/7 < 1/2
      4L -> Set("p", "q"),                  // disjoint
      5L -> Set("a", "b", "c", "d"),        // identical to 1
      6L -> Set("c", "d"))                  // jacc(1,6) = 2/4 = 1/2 boundary
    val got = SetSimJoin.ppjoin(
        toks(sets.toSeq.map { case (k, v) => k -> v.toSeq }: _*), 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === brute(sets, 1, 2))
    // the boundary pair (1,6) at exactly τ is INCLUDED (≥, not >)
    assert(got.exists(p => p._1 == 1L && p._2 == 6L))
    // the below-threshold pair (1,3) is excluded
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L))
  }

  test("higher threshold keeps a subset; identical sets read jaccard 1.0") {
    val sets = Map(
      1L -> Set("a", "b", "c", "d"), 2L -> Set("a", "b", "c", "e"),
      5L -> Set("a", "b", "c", "d"))
    val df = toks(sets.toSeq.map { case (k, v) => k -> v.toSeq }: _*)
    val lo = SetSimJoin.ppjoin(df, 1, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hi = SetSimJoin.ppjoin(df, 9, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
    assert(hi.map(p => (p._1, p._2)).subsetOf(lo))
    assert(hi === Set((1L, 5L, 1.0)))
  }

  test("cross-only incremental join ≡ brute force on the cross slice, within-side pairs absent") {
    val got = graft.queries.LlmOps.ssjoinIncr(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), array_distinct(Dedup.shingles(col("text"), 3)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val exp = (for {
      bId <- sets.keys if bId % 10 == 0
      cId <- sets.keys if cId % 10 != 0
      inter = (sets(bId) & sets(cId)).size
      un = (sets(bId) | sets(cId)).size
      if inter * 2 >= un
    } yield (bId, cId)).toSet
    assert(got === exp)
    assert(got.forall { case (n, b) => n % 10 == 0 && b % 10 != 0 })
  }

  test("real corpus at τ=1/2 over trigram shingles: exactly the near-dup pairs, none missed") {
    val face = graft.queries.LlmOps.ssjoinPpjoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force the same shingle sets on the driver
    val sets = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), array_distinct(Dedup.shingles(col("text"), 3)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(face === brute(sets, 1, 2).map(p => (p._1, p._2)))
    assert(face.nonEmpty, "no near-dup pairs found — the face is dead on this corpus")
  }
}
