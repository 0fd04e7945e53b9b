package graft.ops

import graft.SparkSpec
import graft.queries.Events
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel counts a stage only when it happens strictly after the prior stage") {
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    // user 1: full ordered funnel; user 2: click BEFORE signup (stops at
    // stage 1); user 3: purchase BEFORE click (stops at stage 2).
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "signup", 1.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 12:00:00"), 1L, "purchase", 1.0, "{}"),
      (4L, ts("2024-01-01 09:00:00"), 2L, "click", 1.0, "{}"),
      (5L, ts("2024-01-01 10:00:00"), 2L, "signup", 1.0, "{}"),
      (6L, ts("2024-01-01 10:00:00"), 3L, "signup", 1.0, "{}"),
      (7L, ts("2024-01-01 12:00:00"), 3L, "click", 1.0, "{}"),
      (8L, ts("2024-01-01 11:00:00"), 3L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.funnel(spark, dir)
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(got === Array(
      (1, "signup", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("trendSlope: exact rational slope on a constructed series") {
    val dir = java.nio.file.Files.createTempDirectory("trend").toString
    // type A daily counts: day0→1, day1→2, day2→3 ⇒ slope exactly 1
    val rows = for {
      (day, n) <- Seq((1, 1), (2, 2), (3, 3)); i <- 1 to n
    } yield (day * 100L + i, ts(f"2024-01-0$day 10:00:00"), i.toLong, "A", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.Events.trendSlope(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    assert(got === Array(("A", 6L, 6L, 1.0)))
  }

  test("anomalyDays flags exactly the >2-sigma day, integer-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("anomaly").toString
    // 9 days of 1 event + 1 day of 11: only the spike passes
    // (d·y − Σ)² > 4(d·Σy² − Σ²) ⟺ 8100 > 3600
    val rows = for {
      day <- 1 to 10; i <- 1 to (if (day == 10) 11 else 1)
    } yield (day * 100L + i, ts(f"2024-01-$day%02d 10:00:00"), i.toLong, "A", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.Events.anomalyDays(spark, dir)
      .as[(String, String, Long, Boolean)].collect()
    assert(got.count(_._4) === 1)
    assert(got.filter(_._4).head._2 === "2024-01-10")
  }

  test("cohort offsets are week-aligned, including pre-conversion activity") {
    val dir = java.nio.file.Files.createTempDirectory("cohort").toString
    // user 1 qualifies (purchase 150) in the week of Jan 8 (Mon), active
    // the week before (offset -1) and two weeks after (offset 2);
    // user 2 never qualifies and must not appear.
    Seq(
      (1L, ts("2024-01-03 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-10 10:00:00"), 1L, "purchase", 150.0, "{}"),
      (3L, ts("2024-01-24 10:00:00"), 1L, "click", 1.0, "{}"),
      (4L, ts("2024-01-10 10:00:00"), 2L, "purchase", 50.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.cohortRetention(spark, dir)
      .as[(String, Int, Long)].collect().sortBy(_._2)
    assert(got === Array(
      ("2024-01-08", -1, 1L), ("2024-01-08", 0, 1L), ("2024-01-08", 2, 1L)))
  }

  test("engagement coverage: repeats don't count; ts_full only at all 5 types") {
    val dir = java.nio.file.Files.createTempDirectory("engage").toString
    // user 1 hits all 5 types (completion = the LAST first-occurrence);
    // user 2 repeats one type many times — n_types stays 1, no ts_full
    val all = Seq("signup", "click", "view", "purchase", "error")
    val u1 = all.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, ts(s"2024-01-0${i + 1} 10:00:00"), 1L, t, 1.0, "{}")
    }
    val u2 = (6 to 8).map(i =>
      (i.toLong, ts(s"2024-01-0$i 10:00:00"), 2L, "click", 1.0, "{}"))
    (u1 ++ u2).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.engagementCoverage(spark, dir)
      .as[(Long, Long, Option[Timestamp])].collect().sortBy(_._1)
    assert(got === Array(
      (1L, 5L, Some(ts("2024-01-05 10:00:00"))),
      (2L, 1L, None)))
  }

  test("sessionTranscript: (ts, event_id) order incl. ties, 2h session split, loss-mask count") {
    val dir = java.nio.file.Files.createTempDirectory("transcript").toString
    Seq(
      // user 1, session A: two events TIED on ts — event_id must break
      // the tie (view id=10 before click id=11), then a purchase
      (11L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (10L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (12L, ts("2024-01-01 10:30:00"), 1L, "purchase", 1.0, "{}"),
      // user 1, session B: > 2h after session A's last event
      (13L, ts("2024-01-01 13:00:00"), 1L, "error", 1.0, "{}"),
      // user 2: single-event session
      (20L, ts("2024-01-01 09:00:00"), 2L, "signup", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.sessionTranscript(spark, dir)
      .as[(Long, Timestamp, Long, Long, String, Long)].collect()
      .sortBy(r => (r._1, r._2.getTime))
    assert(got === Array(
      (1L, ts("2024-01-01 10:00:00"), 3L, 1L, "view -> click -> purchase", 25L),
      (1L, ts("2024-01-01 13:00:00"), 1L, 0L, "error", 5L),
      (2L, ts("2024-01-01 09:00:00"), 1L, 0L, "signup", 6L)))
  }

  test("attribution: purchase and revenue conservation across touch buckets") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Events.lastTouchAttribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // every purchase lands in exactly one bucket
    val purchases = graft.Tables.loadEvents(spark, sf)
      .filter(col("event_type") === "purchase")
    assert(rows.map(_._2).sum == purchases.count(),
      "attributed purchase counts must partition the purchase set")
    // revenue conserves exactly (DECIMAL sums on both sides)
    val total = purchases.agg(
      graft.queries.Analytics.moneySum(col("value"))).collect()(0).getDouble(0)
    assert(math.abs(rows.map(_._3).sum - total) < 1e-6,
      s"attributed ${rows.map(_._3).sum} != total purchase revenue $total")
    // no purchase self-attributes: 'purchase' never appears as a touch
    assert(!rows.exists(_._1 == "purchase"))
  }

  test("ewmaDaily: integer-weight baseline, history-free NULL, spike fires on a 5x day") {
    val dir = java.nio.file.Files.createTempDirectory("ewma").toString
    // type A daily counts: 2,2,2,2 then 10 — a clean 5x spike
    val rows = for {
      (day, n) <- Seq((1, 2), (2, 2), (3, 2), (4, 2), (5, 10)); i <- 1 to n
    } yield (day * 100L + i, ts(f"2024-01-0$day 10:00:00"), i.toLong, "A", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.ewmaDaily(spark, dir).collect()
      .map(r => r.getString(1) -> (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))
      .toMap
    // day 1: no history → NULL baseline, no spike
    assert(got("2024-01-01") === ((2L, None, false)))
    // day 2: baseline = 2 (one lag, weight 128), steady day → no spike
    assert(got("2024-01-02") === ((2L, Some(2.0), false)))
    // day 5: baseline still 2 (4 lags of 2: num 480 / den 240), 10 > 2·2
    assert(got("2024-01-05") === ((10L, Some(2.0), true)))
  }

  test("regressionMulti recovers exact planted coefficients y = 10 + 2·x1 − 3·x2") {
    val dir = java.nio.file.Files.createTempDirectory("olsm").toString
    // days 0..13 (x1), weekend = x1 % 7 ∈ {5,6}; counts follow the
    // exact integer plane, so Cramer must recover it exactly
    val rows = for {
      x1 <- 0 to 13
      x2 = if (x1 % 7 >= 5) 1 else 0
      y = 10 + 2 * x1 - 3 * x2
      i <- 1 to y
    } yield ((x1 * 100 + i).toLong,
      ts(f"2024-01-${x1 + 1}%02d 10:00:00"), i.toLong, "A", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.regressionMulti(spark, dir).collect()(0)
    assert(r.getString(0) === "A" && r.getLong(1) === 14L)
    assert(r.getDouble(2) === 10.0) // intercept
    assert(r.getDouble(3) === 2.0)  // slope
    assert(r.getDouble(4) === -3.0) // weekend_lift
  }

  test("eventPaths counts exactly the consecutive triples per user timeline") {
    val dir = java.nio.file.Files.createTempDirectory("paths").toString
    // user 1: a,b,c,d → paths abc, bcd; user 2: a,b,c → abc
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "b", 1.0, "{}"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "c", 1.0, "{}"),
      (4L, ts("2024-01-01 10:03:00"), 1L, "d", 1.0, "{}"),
      (5L, ts("2024-01-01 11:00:00"), 2L, "a", 1.0, "{}"),
      (6L, ts("2024-01-01 11:01:00"), 2L, "b", 1.0, "{}"),
      (7L, ts("2024-01-01 11:02:00"), 2L, "c", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.eventPaths(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3)))
      .toMap
    assert(got === Map(("a", "b", "c") -> 2L, ("b", "c", "d") -> 1L))
  }

  test("theilSen ignores one wild outlier day that drags OLS") {
    val dir = java.nio.file.Files.createTempDirectory("tsen").toString
    // perfect slope 1 for 9 days, then one 100x day
    val rows = for {
      (x, y) <- ((0 to 8).map(i => (i, i + 1)) :+ ((9, 500))): Seq[(Int, Int)]
      i <- 1 to y
    } yield ((x * 1000 + i).toLong,
      ts(f"2024-01-${x + 1}%02d 10:00:00"), i.toLong, "A", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val med = Events.theilSenSlope(spark, dir).collect()(0).getDouble(2)
    val ols = Events.trendSlope(spark, dir).collect()(0).getDouble(3)
    assert(med === 1.0, s"median slope $med != 1.0")
    assert(ols > 10, s"OLS should be dragged by the outlier, got $ols")
  }
}
