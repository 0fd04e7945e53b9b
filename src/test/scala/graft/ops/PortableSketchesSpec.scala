package graft.ops

import graft.SparkSpec
import graft.functions.{KmvAggregator, KmvBuf}
import org.apache.spark.sql.functions._

class PortableSketchesSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups with known distinct cardinalities, fed as a multiset
  private lazy val df = (
    (1 to 6000).map(i => ("g0", s"tok${i % 2000}")) ++
    (1 to 2000).map(i => ("g1", s"tok${i % 300}")) ++
    (1 to  200).map(i => ("g2", s"tok${i % 13}"))
  ).toDF("g", "v")

  private def exactNd = Map("g0" -> 2000, "g1" -> 300, "g2" -> 13)

  test("portable HLL estimate is within 15% of exact in each regime") {
    // the oracle-hashable face ships the RAW estimator (cross-engine ln
    // would risk 1-ulp drift), accurate above ~2.5m; below that the
    // standard linear-counting correction applies, computed here from
    // the same register table to show the sketch carries enough state
    val regs = PortableSketches.hllRegisters(df, Seq("g"), $"v")
    val est = PortableSketches.hllEstimate(regs, Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val occupied = regs.groupBy($"g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((g, nd) <- exactNd) {
      val corrected =
        if (est(g) > 2.5 * 256) est(g)
        else 256.0 * math.log(256.0 / (256 - occupied(g)))
      val rel = math.abs(corrected - nd) / nd
      assert(rel <= 0.15, s"group $g: hll=$corrected exact=$nd rel=$rel")
    }
  }

  test("HLL register tables merge by max: per-source union == global") {
    // split the corpus into two halves (deterministically, by value
    // hash), sketch each, merge via max — must equal the registers
    // built over everything at once
    val even = PortableSketches.hash40($"v") % 2 === 0
    val h1 = PortableSketches.hllRegisters(df.filter(even), Seq("g"), $"v")
    val h2 = PortableSketches.hllRegisters(df.filter(!even), Seq("g"), $"v")
    val merged = h1.union(h2).groupBy($"g", $"reg").agg(max($"r").as("r"))
    val global = PortableSketches.hllRegisters(df, Seq("g"), $"v")
    assert(merged.exceptAll(global).isEmpty && global.exceptAll(merged).isEmpty)
  }

  test("HLL is duplicate-insensitive: multiset ~ distinct input") {
    val a = PortableSketches.hllRegisters(df, Seq("g"), $"v")
    val b = PortableSketches.hllRegisters(df.distinct(), Seq("g"), $"v")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("KMV: exact below k, within 20% above; partitioning-invariant") {
    val k = 64
    val kmv = udaf(new KmvAggregator(k))
    def run(parts: Int) = df.repartition(parts)
      .select($"g", PortableSketches.hash40($"v").as("h"))
      .groupBy($"g").agg(kmv($"h").as("s"))
      .select($"g", $"s.n", $"s.kth")
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    val got = run(4)
    assert(got("g2") == ((13, 0L)), "below k the sketch IS the distinct set")
    for (g <- Seq("g0", "g1")) {
      val (n, kth) = got(g)
      assert(n == k && kth > 0)
      val est = (k - 1).toDouble * math.pow(2.0, 40) / kth.toDouble
      val rel = math.abs(est - exactNd(g)) / exactNd(g)
      assert(rel <= 0.20, s"group $g: kmv=$est exact=${exactNd(g)} rel=$rel")
    }
    // merge associativity under a different partitioning
    assert(run(37) == got, "sketch must not depend on partitioning")
  }

  test("KMV buffer invariants: sorted, distinct, capped") {
    val agg = new KmvAggregator(4)
    val b = Seq(9L, 3L, 9L, 7L, 1L, 5L, 3L, 2L)
      .foldLeft(agg.zero)(agg.reduce)
    assert(b.hs == List(1L, 2L, 3L, 5L))
    val m = agg.merge(KmvBuf(List(2L, 4L, 6L)), b)
    assert(m.hs == List(1L, 2L, 3L, 4L))
    assert(agg.merge(agg.zero, agg.zero).hs.isEmpty)
    assert(agg.finish(b).kth == 5L && agg.finish(KmvBuf(List(1L))).kth == 0L)
  }

  test("CMS never under-counts and is exact for hot keys at low load") {
    val occ = df.select($"v".as("token"))
    val sketch = PortableSketches.cmsSketch(occ, $"token", depth = 4, width = 512)
    val truth = occ.groupBy($"token").agg(count(lit(1)).as("true_ct"))
      .orderBy($"true_ct".desc, $"token").limit(10)
      .withColumnRenamed("token", "key")
    val est = PortableSketches.cmsEstimate(truth, sketch, 4, 512)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    est.foreach { case (t, c) =>
      assert(c >= t, "count-min must never underestimate")
      assert(c <= t + (6000 + 2000 + 200) / 100,
        s"estimate $c too far above truth $t for d=4,w=512")
    }
  }

  test("triangle stats match brute force on a known graph") {
    // K4 on 1..4 (4 triangles), a triangle 10,11,12, a path 20-21-22,
    // an isolated edge 30-31
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L), (21L, 22L),
      (30L, 31L)).toDF("doc_a", "doc_b")
    val r = Triangles.stats(edges).collect()(0)
    assert(r.getLong(0) == 12, "edges")
    assert(r.getLong(2) == 5, s"triangles: got ${r.getLong(2)}")
    // brute-force wedge count for cross-check: sum over oriented
    // out-degrees of C(d,2) — verify against an independent local count
    val es = edges.collect().map(x => (x.getLong(0), x.getLong(1)))
    val deg = es.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (v, xs) => v -> xs.length }
    def key(v: Long) = (deg(v), v)
    val out = es.map(e => if (Ordering[(Int, Long)].lt(key(e._1), key(e._2))) e else e.swap)
      .groupBy(_._1).map { case (_, xs) => xs.length.toLong }
    val expWedges = out.map(d => d * (d - 1) / 2).sum
    assert(r.getLong(1) == expWedges, s"wedges: got ${r.getLong(1)} want $expWedges")
  }

  test("weighted sample: deterministic, weight-monotone, zero-weight-free") {
    val docs = (1 to 2000).map(i => (i.toLong, (i % 100).toLong))
      .toDF("id", "w")
    val s1 = Sampling.weightedSample(docs, $"id", $"w", targetN = 50)
      .select($"id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.weightedSample(docs.repartition(17), $"id", $"w", targetN = 50)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same rows under any partitioning")
    assert(!s1.exists(id => id % 100 == 0), "zero-weight rows never sampled")
    // doubling targetN can only add rows (threshold grows monotonically)
    val s3 = Sampling.weightedSample(docs, $"id", $"w", targetN = 100)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s3))
    assert(s1.nonEmpty && s1.size < 2000)
  }

  test("kmv set algebra: exact regime below k; fractions partition the union; live error above k") {
    import org.apache.spark.sql.functions.{col, length, lit}
    // hand corpus: two sources with tiny vocabularies (union < k=16):
    // the estimator must DEGENERATE TO EXACT counts
    val dir = java.nio.file.Files.createTempDirectory("kmvso").toString
    Seq((1L, "a b c d", "sA"), (2L, "c d e f", "sB"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val hand = graft.queries.SketchOps.sketchKmvSetops(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6), r.getLong(7)))
    // A={a,b,c,d}, B={c,d,e,f}: union 6, inter 2, A\B 2 — exact regime
    assert(hand.toSeq === Seq(("sA", "sB", 6.0, 6L, 2.0, 2L, 2.0, 2L)))
    // real corpus: estimates live (union > k somewhere ⇒ est ≠ exact),
    // and the membership fractions PARTITION the pooled set:
    // est_inter + est_diff_ab ≤ est_union with equality iff B\A empty
    val rows = graft.queries.SketchOps.sketchKmvSetops(spark, sf).collect()
      .map(r => (r.getDouble(2), r.getLong(3), r.getDouble(4), r.getLong(5),
        r.getDouble(6), r.getLong(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (eu, _, ei, _, ed, _) =>
      assert(ei + ed <= eu + 1e-6)
      assert(ei >= 0 && ed >= 0)
    }
    assert(rows.exists { case (eu, nu, _, _, _, _) => eu != nu.toDouble },
      "every union estimate exact — k ≥ vocab, the degenerate-face class")
    // sanity: estimates land in the right decade (KMV at k=16 is coarse
    // but not wild on ~30-token vocabularies)
    rows.foreach { case (eu, nu, _, _, _, _) =>
      assert(eu > nu / 3.0 && eu < nu * 3.0, s"est_union $eu vs exact $nu")
    }
  }

  test("hll rollup: merged per-source registers equal the direct global sketch") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.SketchOps.sketchHllRollup(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.contains("ALL") && rows.size >= 2)
    // direct build over the whole corpus, no merge involved
    val occ = graft.Tables.load(spark, sf, "documents")
      .select(lit("ALL").as("scope"),
        explode(split(trim(col("text")), "\\s+")).as("token"))
    val direct = PortableSketches.hllEstimate(
      PortableSketches.hllRegisters(occ, Seq("scope"), col("token")),
      Seq("scope")).collect()(0).getDouble(1)
    assert(rows("ALL") == direct,
      s"rollup-from-sketches ${rows("ALL")} != direct $direct — merge lost registers")
    // the union estimate dominates every per-source estimate
    rows.filterKeys(_ != "ALL").values.foreach { v =>
      assert(rows("ALL") >= v, s"union estimate below a member: $rows")
    }
  }

  test("kmv overlap: k beyond the vocabularies degenerates to exact; k=16 estimates") {
    // k = 256 ≥ every per-source vocabulary on this corpus: the sketch
    // holds the whole hash set, so the estimator must equal the exact
    // jaccard on every pair (hash collisions aside — none at 40 bits
    // over ~31 tokens)
    val wide = graft.queries.SketchOps.sketchKmvOverlap(spark, sf, k = 256)
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    assert(wide.nonEmpty)
    wide.foreach { case (est, exact) =>
      assert(math.abs(est - exact) < 1e-9, s"k≥|set| must be exact: $est vs $exact")
    }
    // the default k = 16 genuinely estimates: some pair shows error,
    // and the error stays inside the KMV concentration regime
    val est16 = graft.queries.SketchOps.sketchKmvOverlap(spark, sf)
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    assert(est16.exists { case (e, x) => e != x }, "k=16 never estimated")
    est16.foreach { case (e, x) =>
      assert(math.abs(e - x) <= 0.25, s"estimator off the rails: $e vs $x")
    }
  }
}
