package graft.ops

import graft.SparkSpec
import graft.queries.Curation
import org.apache.spark.sql.functions._

/** k-anonymity census: the generalization ladder must be monotone
  * (coarser QIs can only merge classes, never split them), the risk
  * must be live at L0, and the census numbers must match a direct
  * groupBy recomputation.
  */
class KAnonymitySpec extends SparkSpec {

  private lazy val rows = Curation.kAnonymity(spark, sf).collect()
    .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    .toMap

  test("ladder is monotone and live: coarsening only reduces rows at risk") {
    val (_, _, risk0, _) = rows("L0_nation_seg_bal100")
    val (_, _, risk1, _) = rows("L1_nation_seg_bal1000")
    val (_, _, risk2, _) = rows("L2_nation_seg")
    val (_, _, risk3, _) = rows("L3_nation")
    assert(risk0 > 0, "no risk at L0 — the census has nothing to say")
    assert(risk0 >= risk1 && risk1 >= risk2 && risk2 >= risk3,
      s"generalization increased risk: $risk0 → $risk1 → $risk2 → $risk3")
    assert(risk3 < risk0, "the ladder never helped on this corpus")
  }

  test("l-diversity: census ≡ direct recomputation; coarser QI is at least as diverse") {
    val ld = Curation.lDiversity(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val direct = graft.Tables.load(spark, sf, "customer")
      .groupBy(col("c_nationkey"))
      .agg(countDistinct(col("c_mktsegment")).as("l"))
    val (nc, minL, below, _) = ld("L2_nation")
    assert(nc === direct.count())
    assert(minL === direct.agg(min(col("l"))).head.getLong(0))
    assert(below === direct.filter(col("l") < 3).count())
    // merging classes can only keep or grow each class's sensitive set
    assert(ld("L2_nation")._2 >= ld("L1_nation_bal1000")._2)
    assert(minL >= 1 && ld("L1_nation_bal1000")._2 >= 1)
  }

  test("t-closeness: census ≡ brute-force EMD; coarsening cannot raise max_t") {
    val tc = Curation.tCloseness(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toMap
    // brute-force the ordered EMD for L2 (nation classes) on the driver
    val cust = graft.Tables.load(spark, sf, "customer")
      .select(col("c_nationkey").cast("long"),
        floor(col("c_acctbal") / 1000).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val buckets = cust.map(_._2).distinct.sorted
    val m = buckets.length
    val n = cust.length.toLong
    val globalCnt = cust.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val perClass = cust.groupBy(_._1).map { case (_, xs) =>
      val nc = xs.length.toLong
      val cnt = xs.groupBy(_._2).map { case (b, ys) => b -> ys.length.toLong }
      var cum = 0L; var num = 0L
      buckets.foreach { b =>
        cum += cnt.getOrElse(b, 0L) * n - globalCnt(b) * nc
        num += math.abs(cum)
      }
      (num, nc)
    }
    val expMax = perClass.map { case (num, nc) =>
      num.toDouble / (n * nc * (m - 1)) }.max
    val expAbove = perClass.count { case (num, nc) => num * 5 > n * nc * (m - 1) }
    val (ncl, maxT, above, _) = tc("L2_nation")
    assert(ncl === perClass.size)
    assert(math.abs(maxT - BigDecimal(expMax).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(above === expAbove.toLong)
    // merged classes have convex-combination distributions: EMD of a
    // merge never exceeds the max of its parts
    assert(tc("L2_nation")._2 <= tc("L1_nation_seg")._2 + 1e-12)
    assert(maxT >= 0.0 && maxT <= 1.0)
  }

  test("randomized response: estimator debiases the deterministic coin; flips really happen") {
    val rows = Curation.dpRandomizedResponse(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, _, repYes, est) =>
      // est = (4·reported_yes − n)/2, replayed exactly
      assert(est === (4L * repYes - n) / 2.0)
    }
    // privacy is live: some rows flipped (reported ≠ true in aggregate)
    assert(rows.exists { case (_, _, trueYes, repYes, _) => trueYes != repYes },
      "no nation shows any flipped bits — the coin is dead")
    // the coin is a fair 3/4: global flip fraction within 10% of 1/4
    val (totN, totTrue, totRep) =
      (rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._4).sum)
    // reported = true + flips_from_no − flips_from_yes; bound the net
    assert(math.abs(totRep - totTrue) < totN / 2,
      s"reported $totRep wildly off true $totTrue over $totN rows")
  }

  test("dp histogram: the geometric draw replays exactly; noise is live and bounded") {
    import graft.functions.GraftStrings
    val rows = Curation.dpHistogram(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // the exact noise-distribution replay: first even-hash trial index,
    // truncated at 16, two independent salts, z = g1 - g2
    def g(salt: String, cell: String): Long =
      (0 until 16).find(i =>
        GraftStrings.hash60(s"$salt:$cell:$i") % 2 == 0).getOrElse(16).toLong
    rows.foreach { case (seg, b, n, z, noisy, eps) =>
      val cell = s"$seg|$b"
      assert(z === g("g1", cell) - g("g2", cell), s"cell $cell draw drifted")
      assert(noisy === n + z, s"cell $cell release is not n + z")
      assert(eps === 0.693147)
      assert(math.abs(z) <= 32, s"cell $cell noise outside the truncation bound")
    }
    // noise is live (some cell moved) and useful (mean |z| near the
    // E|Z| = 4/3 of the alpha = 1/2 discrete Laplace — the utility bound)
    assert(rows.exists(_._4 != 0L), "every cell got zero noise — the coin is dead")
    val meanAbs = rows.map(r => math.abs(r._4)).sum.toDouble / rows.length
    assert(meanAbs <= 3.0, s"mean |z| $meanAbs far above the geometric's 4/3")
  }

  test("dp stream: versioned draws replay exactly; the accountant adds ln 2 per release") {
    import graft.functions.GraftStrings
    val rows = Curation.dpStreamMaterialize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    val byRelease = rows.groupBy(_._1)
    assert(byRelease.keySet === Set(0L, 1L), "exactly two releases")
    def g(salt: String, cell: String): Long =
      (0 until 16).find(i =>
        GraftStrings.hash60(s"$salt:$cell:$i") % 2 == 0).getOrElse(16).toLong
    rows.foreach { case (rel, seg, b, n, z, noisy, eps) =>
      val cell = s"$seg|$b"
      assert(z === g(s"g1r$rel", cell) - g(s"g2r$rel", cell),
        s"release $rel cell $cell draw drifted")
      assert(noisy === n + z)
      // exact: ln2's 6-decimal literal times 1 or 2 (×2 exact in IEEE)
      assert(eps === 0.693147 * (rel + 1),
        s"release $rel accountant drifted: $eps")
    }
    // release 1 re-reads everyone: exact counts cover the whole table
    // and dominate release 0's half cell-by-cell
    val n1 = byRelease(1L).map(_._4).sum
    assert(n1 === graft.Tables.load(spark, sf, "customer").count())
    val r0 = byRelease(0L).map(r => (r._2, r._3) -> r._4).toMap
    r0.foreach { case (cell, n0) =>
      val full = byRelease(1L).find(r => (r._2, r._3) == cell).map(_._4)
      assert(full.exists(_ >= n0), s"cell $cell shrank between releases")
    }
    // the two releases draw INDEPENDENT noise (versioned salts): some
    // cell's z differs between them on this corpus
    val z0 = byRelease(0L).map(r => (r._2, r._3) -> r._5).toMap
    assert(byRelease(1L).exists(r => z0.get((r._2, r._3)).exists(_ != r._5)),
      "every release-1 draw equals release 0 — salts not versioned")
  }

  test("dp threshold: release ≡ the replayed rule; suppression is live; counts stay out-of-band") {
    import graft.functions.GraftStrings
    val df = Curation.dpThresholdRelease(spark, sf)
    // unknown-domain contract: the exact count column must NOT ride the
    // release — only the noisy value and the (ε, δ) budget do
    assert(df.columns.toSeq === Seq("nation", "segment", "noisy", "epsilon", "delta"))
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // replay the whole mechanism from the raw table on the driver
    def g(salt: String, cell: String): Long =
      (0 until 16).find(i =>
        GraftStrings.hash60(s"$salt:$cell:$i") % 2 == 0).getOrElse(16).toLong
    val raw = graft.Tables.load(spark, sf, "customer")
      .groupBy(col("c_nationkey").cast("long").as("nation"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val replayed = raw.flatMap { case ((nation, seg), n) =>
      val cell = s"$nation|$seg"
      val noisy = n + g("t1", cell) - g("t2", cell)
      if (noisy >= 9L) Some((nation, seg) -> noisy) else None
    }
    assert(rows.view.mapValues(_._1).toMap === replayed,
      "released set or noisy values drifted from the replayed mechanism")
    // suppression is live: at least one populated cell stays unpublished
    assert(replayed.size < raw.size,
      s"threshold suppressed nothing (${raw.size} cells, all released)")
    // the budget constants are the exact inlined literals
    rows.values.foreach { case (_, eps, delta) =>
      assert(eps === 0.693147 && delta === 0.002604)
    }
  }

  test("dp quantiles: post-processing replays from the SAME release; budget unchanged; ordered") {
    import graft.functions.GraftStrings
    val rows = Curation.dpQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    def g(salt: String, cell: String): Long =
      (0 until 16).find(i =>
        GraftStrings.hash60(s"$salt:$cell:$i") % 2 == 0).getOrElse(16).toLong
    // replay: the same g1/g2 salts as dp_histogram (same randomness —
    // post-processing, not a fresh release), clamp, cumsum, 4·cum ≥ q·tot
    val hist = graft.Tables.load(spark, sf, "customer")
      .groupBy(col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / 1000).cast("long").as("b"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (seg, (q25, q50, q75, totalM, eps)) =>
      val cells = hist.filter(_._1 == seg).sortBy(_._2)
        .map { case (_, b, n) =>
          (b, math.max(n + g("g1", s"$seg|$b") - g("g2", s"$seg|$b"), 0L))
        }
      val tot = cells.map(_._2).sum
      assert(totalM === tot, s"$seg total drifted")
      def quant(q: Int): Long = {
        var cum = 0L
        cells.collectFirst { case (b, m) if { cum += m; 4 * cum >= q * tot } => b }.get
      }
      assert((q25, q50, q75) === ((quant(1), quant(2), quant(3))),
        s"$seg quantiles drifted")
      assert(q25 <= q50 && q50 <= q75, s"$seg quantiles unordered")
      // post-processing invariance: ε is the HISTOGRAM's ln 2, no addition
      assert(eps === 0.693147)
    }
  }

  test("census ≡ direct recomputation at L3") {
    val direct = graft.Tables.load(spark, sf, "customer")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"))
    val nClasses = direct.count()
    val atRisk = direct.filter(col("n") < 5)
      .agg(coalesce(sum(col("n")), lit(0L))).head.getLong(0)
    val (gotClasses, minSize, gotRisk, _) = rows("L3_nation")
    assert(gotClasses === nClasses)
    assert(gotRisk === atRisk)
    assert(minSize === direct.agg(min(col("n"))).head.getLong(0))
  }
}
