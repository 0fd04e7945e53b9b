package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trigram LIKE index: exact agreement with a brute-force contains
  * scan, live false-positive exposure (candidates > matches), and the
  * bucket partition pruning that makes the index a sub-corpus read.
  */
class TrigramIndexSpec extends SparkSpec {

  test("matches ≡ brute-force contains; candidates dominate matches and expose false positives") {
    val got = TrigramIndex.likeScan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq === TrigramIndex.patterns)
    val texts = graft.Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    got.foreach { case (p, cand, matches) =>
      assert(cand >= matches, s"'$p': candidates below matches")
      val brute = texts.count(_.contains(p)).toLong
      assert(matches === brute, s"'$p': $matches != brute $brute")
    }
    // the trigram AND is a filter, not the answer: somewhere trigrams
    // co-occur without adjacency and the verify step must cut them
    assert(got.exists { case (_, c, m) => c > m },
      "no false positives anywhere — the verify stage is untested")
    assert(got.forall(_._3 > 0L), "a pattern never matches — degenerate")
  }

  test("segment append: base + delta ≡ the one-shot index; base segment untouched by the append") {
    val got = TrigramIndex.likeScanIncr(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = TrigramIndex.likeScan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sameElements(want), "segmented search diverged from rebuild")
    // layout: two segments, delta-proportional append (the base
    // segment's files predate the delta's — overwrite went only under
    // seg=d1)
    val idx = graft.ops.StageOnce.tmp("trgm_index_incr", sf)
    val segs = new java.io.File(idx).listFiles()
      .map(_.getName).filter(_.startsWith("seg=")).sorted
    assert(segs.toSeq === Seq("seg=base", "seg=d1"))
  }

  test("the posting scan is partition-pruned to the query trigrams' buckets") {
    val plan = TrigramIndex.likeScan(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.matches("(?s).*PartitionFilters.*bucket.*"),
      "bucket filter did not reach the index scan as a partition filter")
  }
}
