package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("binnedIntervalJoin: inclusive bounds, per-key, bin-boundary-safe") {
    // intervals straddle bin boundaries (bin = 10s) on purpose
    val points = Seq(
      ("a", 1L, ts(5)), ("a", 2L, ts(10)), ("a", 3L, ts(19)),
      ("a", 4L, ts(20)), ("b", 5L, ts(5)), ("a", 6L, ts(100))
    ).toDF("k", "id", "t")
    val intervals = Seq(
      ("a", ts(5), ts(19)),  // covers bins 0 and 1
      ("b", ts(0), ts(9))
    ).toDF("k", "lo", "hi")
    val got = RangeJoin.binnedIntervalJoin(points, intervals,
      "k", "t", "lo", "hi", binSeconds = 10)
      .select("id").collect().map(_.getLong(0)).sorted
    // 1 (start-inclusive), 2 (mid), 3 (end-inclusive), 5 (key b);
    // 4 is past the end, 6 shares a key but no interval
    assert(got.toSeq == Seq(1L, 2L, 3L, 5L))
  }

  test("binnedIntervalJoin: one corrupt interval never kills the job") {
    val points = Seq(("a", 1L, ts(15)), ("a", 2L, ts(5))).toDF("k", "id", "t")
    // year-9999 end at binSeconds=3600 would be a ~70M-element sequence;
    // inverted and NULL-bounded rows are the other two corruption shapes
    val y9999 = Timestamp.valueOf("9999-12-31 23:59:59")
    val intervals = Seq(
      ("a", ts(10), ts(20)),        // sane — must still match point 1
      ("a", ts(0), y9999),          // pathological span
      ("a", ts(50), ts(40)),        // inverted
      ("a", null, ts(20))           // NULL bound
    ).toDF("k", "lo", "hi")
    val got = RangeJoin.binnedIntervalJoin(points, intervals,
      "k", "t", "lo", "hi", binSeconds = 3600, maxSpanBins = 1000)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
    val dropped = RangeJoin.pathologicalIntervals(intervals,
      "lo", "hi", binSeconds = 3600, maxSpanBins = 1000).count()
    assert(dropped == 3)
  }

  test("binnedIntervalJoin: no cross-key matches, no duplicate matches") {
    val points = Seq(("a", 1L, ts(15))).toDF("k", "id", "t")
    // interval spans 3 bins — the point must still match exactly once
    val intervals = Seq(("a", ts(0), ts(29)), ("b", ts(0), ts(29)))
      .toDF("k", "lo", "hi")
    val got = RangeJoin.binnedIntervalJoin(points, intervals,
      "k", "t", "lo", "hi", binSeconds = 10).collect()
    assert(got.length == 1)
  }
}
