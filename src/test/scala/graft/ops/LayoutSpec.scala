package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"layout-$name").resolve("t").toString

  private lazy val df = (0L until 10000L).map(i => (i, s"cat${i % 5}", i * 2))
    .toDF("id", "cat", "v")

  test("writePartitioned: equality read prunes to one directory (PartitionFilters)") {
    val path = tmp("hive")
    Layout.writePartitioned(df, path, "cat")
    val read = spark.read.parquet(path).filter($"cat" === "cat3")
    assert(read.count() == 2000)
    val scan = read.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.partitionFilters.nonEmpty, "expected partition-level pruning")
    // only the matching directory's files are read
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files).forall(_.getPath.toString.contains("cat=cat3")))
  }

  test("writeRangeClustered: files carry disjoint id ranges") {
    val path = tmp("range")
    Layout.writeRangeClustered(df, path, $"id", nFiles = 8)
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min($"id").as("lo"), max($"id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(perFile.length == 8)
    perFile.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi < lo2, "file ranges must not overlap")
    }
  }

  test("zInterleave: bit i of a at 2i, bit i of b at 2i+1") {
    val got = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zInterleave($"a", $"b", 3).as("z"))
      .as[Long].collect()(0)
    // a=101, b=011 -> z bits (b2 a2 b1 a1 b0 a0) = 0 1 1 0 1 1 = 27
    assert(got == 27L)
  }

  test("writeZOrdered: both columns get tight per-file ranges; 1-D clustering leaves the other full-range") {
    // two independent dimensions — a row's x says nothing about its y
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(20000)((rnd.nextInt(1 << 12).toLong,
      rnd.nextInt(1 << 12).toLong)).toDF("x", "y")
    def avgSpans(path: String): (Double, Double) = {
      val rows = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
        .collect()
      (rows.map(_.getLong(1)).sum.toDouble / rows.length,
        rows.map(_.getLong(2)).sum.toDouble / rows.length)
    }
    val zPath = tmp("zorder"); val rPath = tmp("range1d")
    Layout.writeZOrdered(pts, zPath, $"x", $"y", nFiles = 16)
    Layout.writeRangeClustered(pts, rPath, $"x", nFiles = 16)
    val (zx, zy) = avgSpans(zPath)
    val (rx, ry) = avgSpans(rPath)
    val full = (1 << 12).toDouble
    // 16 files on a 2-D z-curve ≈ 4×4 tiles: each dimension's span ~1/4
    assert(zx < full * 0.45 && zy < full * 0.45, s"z spans: $zx $zy")
    assert(rx < full * 0.15, s"1-D x span: $rx")      // tight on the sort key
    assert(ry > full * 0.9, s"1-D y span: $ry")       // full-range on the other
    // same rows either way
    assert(spark.read.parquet(zPath).count() == 20000)
  }

  test("compact merges small files and preserves the data") {
    val inPath = tmp("frag")
    val outPath = tmp("compacted")
    df.repartition(64).write.parquet(inPath) // 64 tiny files
    val (before, after) = Layout.compact(spark, inPath, outPath,
      targetBytes = 10L * 1024 * 1024)
    assert(before == 64 && after < 8, s"before=$before after=$after")
    val a = spark.read.parquet(inPath).orderBy("id").collect()
    val b = spark.read.parquet(outPath).orderBy("id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("rangeBoundaries: sharded two-pass selection ≡ brute-force sorted pick") {
    // duplicates + skew: values are squares mod 97, so heavy ties
    val data = (1 to 5000).map(i => ((i * i) % 97).toDouble).toDF("v")
    val probs = Seq(0.1, 0.25, 0.5, 0.9, 1.0)
    val got = Layout.rangeBoundaries(data, "v", probs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = data.collect().map(_.getDouble(0)).sorted
    probs.foreach { p =>
      val expected = sorted(math.ceil(p * sorted.length).toInt - 1)
      assert(got(p) === expected, s"p=$p: got ${got(p)}, want $expected")
    }
    // p = 1.0 is the max — the last range partition's upper bound
    assert(got(1.0) === sorted.last)
  }

  test("z-order + 2D zone maps prune where 1D range clustering cannot") {
    val zDir = tmp("zo2d")
    val rDir = tmp("rc1d")
    // independent uniform dimensions (the earlier (i*7919)%1000 /
    // (i*104729)%1000 pair is a BIJECTION of i mod 1000 — a 1000-point
    // curve, not a 2-D cloud — whose zone envelopes sat one
    // range-sample wiggle away from the old corner-box assertion;
    // repartitionByRange samples with rdd-id-derived seeds, so
    // shared-JVM suite order moved file boundaries and flaked it).
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(20000)(
      (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong)).toDF("a", "b")
    Layout.writeZOrdered(data, zDir, col("a"), col("b"), nFiles = 16)
    Layout.writeRangeClustered(data, rDir, col("a"), nFiles = 16)
    // the discriminating predicate is on `b` ALONE: clustering on `a`
    // leaves every file's b-envelope full-range (uniform independent
    // dims), so a b-only zone-map check prunes NOTHING on the
    // range-clustered layout — while the Z-curve confines low-b rows
    // to the low-b half of each a-quadrant's z-interval, so only the
    // files whose interval touches one of those ~4 segments survive.
    // (The old corner-box form compared ~1/4-selectivity boxes where
    // quadrant-crossing envelope pollution left no reliable margin.)
    def candidatesB(dir: String): Int =
      ZoneMaps.collect(spark, dir, "b")
        .filter(col("max_v") >= 0L && col("min_v") <= 60L)
        .count().toInt
    val (zCand, rCand) = (candidatesB(zDir), candidatesB(rDir))
    assert(rCand >= 14, s"1-D layout should keep ~all 16 files: $rCand")
    assert(zCand <= 8, s"b-predicate kept $zCand of 16 z-ordered files")
    assert(zCand < rCand, s"zorder=$zCand rangeClustered=$rCand")
  }

  test("rangeBoundaries: boundaries actually balance a range layout") {
    val data = (1 to 10000).map(i => i.toDouble).toDF("v")
    val bounds = Layout.rangeBoundaries(data, "v", Seq(0.25, 0.5, 0.75))
      .collect().map(_.getDouble(1)).sorted
    // quarter boundaries of 1..10000 are exactly 2500/5000/7500
    assert(bounds.toSeq === Seq(2500.0, 5000.0, 7500.0))
  }
}
