package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CdcMerge / IncrementalAgg / ZoneMaps: the algebraic contracts that
  * make them safe to run as unattended maintenance at scale —
  * batch-fold associativity for CDC, partial-merge ≡ recompute for
  * IVM, and file-pruning soundness (never loses a row, provably opens
  * fewer files) for zone maps.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "s", "v")

  test("cdc: latest change per key wins; D deletes; I inserts; untouched pass through") {
    val changes = Seq(
      (2L, "b2", 21.0, "U", 1L), (2L, "b3", 22.0, "U", 2L), // two waves: seq 2 wins
      (3L, "c", 30.0, "D", 1L), // delete
      (9L, "i", 90.0, "I", 1L) // insert
    ).toDF("k", "s", "v", "op", "seq")
    val out = CdcMerge.applyLatestWins(base, changes, Seq("k"))
    assert(rows(out) === Set("1|a|10.0", "2|b3|22.0", "4|d|40.0", "9|i|90.0"))
    assert(out.columns.toSeq === base.columns.toSeq)
  }

  test("cdc: folding batches one at a time ≡ applying their union at once") {
    val b1 = Seq((1L, "a1", 11.0, "U", 1L), (2L, "x", 0.0, "D", 2L),
      (7L, "g", 70.0, "I", 3L)).toDF("k", "s", "v", "op", "seq")
    val b2 = Seq((2L, "b9", 29.0, "I", 4L), // re-insert after delete
      (7L, "g2", 71.0, "U", 5L), (1L, "z", 0.0, "D", 6L)).toDF("k", "s", "v", "op", "seq")
    val folded = CdcMerge.applyLatestWins(
      CdcMerge.applyLatestWins(base, b1, Seq("k")), b2, Seq("k"))
    val atOnce = CdcMerge.applyLatestWins(base, b1.unionByName(b2), Seq("k"))
    assert(rows(folded) === rows(atOnce))
    assert(rows(folded) === Set("2|b9|29.0", "3|c|30.0", "4|d|40.0", "7|g2|71.0"))
  }

  test("cdc: equal-seq tie resolves to the update, not the delete") {
    val changes = Seq((1L, "a9", 19.0, "U", 5L), (1L, "x", 0.0, "D", 5L))
      .toDF("k", "s", "v", "op", "seq")
    val out = CdcMerge.applyLatestWins(base, changes, Seq("k"))
    assert(rows(out.filter($"k" === 1L)) === Set("1|a9|19.0"))
  }

  test("cdc synthetic feed: no two changes share (key, seq, op) — the oracle-parity invariant") {
    // applyLatestWins breaks exact (key, seq, op) ties with an xxhash64
    // payload hash the DuckDB oracle cannot mirror; the q_cdc_merge gate
    // is sound only because the synthetic feed never produces such a tie.
    // Pin that invariant: over a base whose keys are unique (orders'
    // contract), every (key, seq, op) group in the feed has exactly one
    // row, so the tie-break clause is never consulted.
    val fakeOrders = (0L until 200L).map(k =>
      (k, k % 50, "O", 100.0 + k, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
    val feed = CdcMerge.syntheticOrderChanges(spark, fakeOrders)
    val maxGroup = feed.groupBy($"o_orderkey", $"seq", $"op")
      .count().agg(max($"count")).head.getLong(0)
    assert(maxGroup === 1L,
      "synthetic CDC feed emitted a (key, seq, op) tie — the DuckDB " +
        "oracle has no payload tie-break, so this would break the hash gate")
    // the insert leg's +10M key offset must not collide with any real key
    assert(feed.filter($"op" === "I").agg(min($"o_orderkey")).head.getLong(0) >
      fakeOrders.agg(max($"o_orderkey")).head.getLong(0))
  }

  private val fact = Seq(
    ("x", 1.25), ("x", 2.50), ("y", 3.75), ("y", 0.25), ("y", 9.00), ("z", 4.00)
  ).toDF("g", "v")

  test("ivm: merge of per-batch partials ≡ one-shot partial over the union") {
    val batches = Seq(fact.filter($"v" < 2.0), fact.filter($"v" >= 2.0 && $"v" < 4.0),
      fact.filter($"v" >= 4.0))
    val merged = IncrementalAgg.merge(
      batches.map(IncrementalAgg.partial(_, Seq("g"), "v")), Seq("g"))
    val oneShot = IncrementalAgg.partial(fact, Seq("g"), "v")
    assert(rows(merged) === rows(oneShot))
    // merge is insensitive to batch arrival order
    val reordered = IncrementalAgg.merge(
      batches.reverse.map(IncrementalAgg.partial(_, Seq("g"), "v")), Seq("g"))
    assert(rows(reordered) === rows(oneShot))
  }

  test("ivm: empty-batch partial is a merge identity") {
    val empty = IncrementalAgg.partial(fact.filter($"v" < 0), Seq("g"), "v")
    val merged = IncrementalAgg.merge(
      Seq(IncrementalAgg.partial(fact, Seq("g"), "v"), empty), Seq("g"))
    assert(rows(merged) === rows(IncrementalAgg.partial(fact, Seq("g"), "v")))
  }

  test("ivm signed: retraction cancels the insert; zero-net keys vanish") {
    val inserts = fact.withColumn("m", lit(1))
    val retractZ = fact.filter($"g" === "z").withColumn("m", lit(-1))
    val s1 = IncrementalAgg.partialSigned(inserts, Seq("g"), "v", "m")
    val s2 = IncrementalAgg.partialSigned(retractZ, Seq("g"), "v", "m")
    val net = IncrementalAgg.mergeSigned(Seq(s1, s2), Seq("g"))
    assert(net.filter($"g" === "z").count() === 0)
    val unsignedNoZ = IncrementalAgg.partialSigned(
      inserts.filter($"g" =!= "z"), Seq("g"), "v", "m")
    assert(rows(net) === rows(unsignedNoZ))
  }

  test("ivm state dir: replayed batches are idempotent; compaction preserves the aggregate") {
    val stateDir = java.nio.file.Files.createTempDirectory("ivm_state").toString
    val batches = Seq(fact.filter($"v" < 2.0), fact.filter($"v" >= 2.0 && $"v" < 4.0),
      fact.filter($"v" >= 4.0))
    batches.zipWithIndex.foreach { case (b, i) =>
      IncrementalAgg.appendPartial(b, Seq("g"), "v", stateDir, i.toLong)
    }
    val want = rows(IncrementalAgg.partial(fact, Seq("g"), "v"))
    assert(rows(IncrementalAgg.readState(spark, stateDir, Seq("g"))) === want)
    // at-least-once delivery: re-appending batch 1 overwrites its own
    // partial — the state does NOT double-count
    IncrementalAgg.appendPartial(batches(1), Seq("g"), "v", stateDir, 1L)
    assert(rows(IncrementalAgg.readState(spark, stateDir, Seq("g"))) === want)
    // compaction folds the partials without changing the aggregate
    // (into a FRESH id — reusing a live id is rejected, see below)
    IncrementalAgg.compactState(spark, stateDir, Seq("g"), intoBatchId = 100L)
    val dirs = new java.io.File(stateDir).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(dirs === Set("batch=100"))
    assert(rows(IncrementalAgg.readState(spark, stateDir, Seq("g"))) === want)
    // maintenance continues after compaction
    IncrementalAgg.appendPartial(fact.limit(0), Seq("g"), "v", stateDir, 3L)
    assert(rows(IncrementalAgg.readState(spark, stateDir, Seq("g"))) === want)
    // a replayed delivery of an ABSORBED batch (at-least-once redelivery
    // arriving after the compaction that folded it) is skipped via the
    // compacted partial's _absorbs marker, not double-counted
    IncrementalAgg.appendPartial(batches(1), Seq("g"), "v", stateDir, 1L)
    assert(rows(IncrementalAgg.readState(spark, stateDir, Seq("g"))) === want)
    // compacting into a still-existing batch id is refused
    intercept[IllegalArgumentException] {
      IncrementalAgg.compactState(spark, stateDir, Seq("g"), intoBatchId = 3L)
    }
    // ...and so is compacting into a PREVIOUSLY-ABSORBED id (its dir is
    // gone, but batch=100's _absorbs marker names it): reusing it and
    // crashing mid-delete would leave batch=1 and batch=100 each marking
    // the other absorbed — nothing live, manual recovery required
    intercept[IllegalArgumentException] {
      IncrementalAgg.compactState(spark, stateDir, Seq("g"), intoBatchId = 1L)
    }
  }

  test("ivm compaction: crash between rename and deletes still reads correctly") {
    // simulate the crash window the old delete-then-rename order got
    // wrong: the compacted partial has landed but an absorbed original
    // is still on disk. readState must NOT double-count the straggler.
    val stateDir = java.nio.file.Files.createTempDirectory("ivm_crash").toString
    val batches = Seq(fact.filter($"v" < 3.0), fact.filter($"v" >= 3.0))
    batches.zipWithIndex.foreach { case (b, i) =>
      IncrementalAgg.appendPartial(b, Seq("g"), "v", stateDir, i.toLong)
    }
    val want = rows(IncrementalAgg.partial(fact, Seq("g"), "v"))
    // keep a copy of batch=0, compact, then restore it — the on-disk
    // picture of a crash that deleted batch=1 but not batch=0
    val b0 = new java.io.File(stateDir, "batch=0")
    val saved = java.nio.file.Files.createTempDirectory("ivm_saved").toString
    org.apache.commons.io.FileUtils.copyDirectory(
      b0, new java.io.File(saved, "batch=0"))
    IncrementalAgg.compactState(spark, stateDir, Seq("g"), intoBatchId = 9L)
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(saved, "batch=0"), b0)
    val dirs = new java.io.File(stateDir).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(dirs === Set("batch=9", "batch=0")) // straggler present
    assert(rows(IncrementalAgg.readState(spark, stateDir, Seq("g"))) === want)
  }

  test("zone maps: pruned scan opens fewer files and loses no rows") {
    val dir = java.nio.file.Files.createTempDirectory("zm_spec").toString
    val data = (1 to 1000).map(i => (i.toLong, i % 7)).toDF("id", "tag")
    Layout.writeRangeClustered(data, dir, col("id"), nFiles = 10)
    val stats = ZoneMaps.collect(spark, dir, "id")
    assert(stats.count() === 10)
    val candidates = ZoneMaps.candidateFiles(stats, 150L, 250L)
    // 1000 ids over 10 range-clustered files => ~100-wide envelopes; a
    // 101-wide range must prune most files but needs at least one
    assert(candidates.nonEmpty && candidates.size <= 3,
      s"expected <=3 candidate files, got ${candidates.size}")
    val pruned = ZoneMaps.prunedScan(spark, dir, stats, "id", 150L, 250L)
    val full = spark.read.parquet(dir).filter($"id" >= 150L && $"id" <= 250L)
    assert(rows(pruned) === rows(full))
  }

  test("zone maps contract: files appended after collect() are invisible until refresh") {
    // the manifest semantics zone maps share with a lakehouse commit
    // log: stats are per-commit, not per-query — an unrefreshed stats
    // table silently hides new files from pruned reads, which is why
    // collect() must run as part of the write/commit path
    val dir = java.nio.file.Files.createTempDirectory("zm_stale").toString
    val data = (1 to 100).map(i => (i.toLong, i % 3)).toDF("id", "tag")
    Layout.writeRangeClustered(data, dir, col("id"), nFiles = 2)
    val stats = ZoneMaps.collect(spark, dir, "id").collect()
    val statsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(stats.toSeq),
      ZoneMaps.collect(spark, dir, "id").schema)
    (101 to 120).map(i => (i.toLong, i % 3)).toDF("id", "tag")
      .coalesce(1).write.mode("append").parquet(dir)
    val pruned = ZoneMaps.prunedScan(spark, dir, statsDf, "id", 90L, 120L)
    assert(pruned.agg(max($"id")).head.getLong(0) === 100L) // new file invisible
    val refreshed = ZoneMaps.collect(spark, dir, "id")
    val seen = ZoneMaps.prunedScan(spark, dir, refreshed, "id", 90L, 120L)
    assert(seen.agg(max($"id")).head.getLong(0) === 120L)
  }

  test("time travel diff face: updated keys carry both values, vanished keys a NULL new side") {
    val diff = graft.queries.Maintenance.timeTravel(spark, sf).collect()
    assert(diff.nonEmpty)
    val (gone, changed) = diff.partition(_.isNullAt(3))
    // vanished rows are exactly the retained 'P'-partition rows (the
    // commit-3 takedown); every one still has its v2 value
    assert(gone.nonEmpty && gone.forall(r => r.getString(1) == "P" && !r.isNullAt(2)))
    // changed rows are the %20==4 second update wave: +4000 over v2
    assert(changed.nonEmpty)
    changed.foreach { r =>
      assert(r.getString(0).toLong % 20 == 4)
      assert(math.abs(r.getDouble(3) - r.getDouble(2) - 4000.0) < 1e-9)
    }
    // nothing exists only on the live side (no wave-3 inserts)
    assert(diff.forall(!_.isNullAt(2)))
  }

  test("zone maps: disjoint range yields an empty, correctly-shaped result") {
    val dir = java.nio.file.Files.createTempDirectory("zm_spec2").toString
    val data = (1 to 100).map(i => (i.toLong, s"r$i")).toDF("id", "s")
    Layout.writeRangeClustered(data, dir, col("id"), nFiles = 4)
    val stats = ZoneMaps.collect(spark, dir, "id")
    val out = ZoneMaps.prunedScan(spark, dir, stats, "id", 5000L, 6000L)
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("id", "s"))
  }

  test("ivm: maintained aggregate ≡ Spark-side recompute; MV artifact is group-sized; emptied groups drop") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val got = graft.queries.Maintenance.ivmAggregate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // recompute the mutated state directly in Spark (independent of the
    // DuckDB oracle): same net-change rules applied row-wise
    val base = graft.Tables.load(spark, sf, "orders").select(
      year(col("o_orderdate")).cast(LongType).as("annee"),
      col("o_orderstatus").as("dep"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("v"),
      col("o_orderkey").as("k"))
    val want = base.filter(col("k") % 10 =!= 3 && col("dep") =!= "P")
      .select(col("annee"),
        when(col("k") % 20 === 4, col("v") + lit(5000.0).cast(DecimalType(18, 2)))
          .when(col("k") % 10 === 4, col("v") + lit(1000.0).cast(DecimalType(18, 2)))
          .otherwise(col("v")).as("v"))
      .unionByName(base.filter(col("k") % 10 === 7).select(col("annee"), col("v")))
      .groupBy(col("annee"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v")).cast(DecimalType(18, 2)).cast("double").as("total_usd"))
      .orderBy(col("annee"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.sameElements(want), "maintain != recompute")
    // the stored MV is |years|-sized (pre-aggregated, not row-level)
    val mv = spark.read.parquet(graft.ops.StageOnce.tmp("ivm_mv", sf))
    assert(mv.count() === mv.select("annee").distinct().count())
    assert(mv.count() <= 10)
    // counting-algorithm edge: a group whose rows all leave must DROP
    // from the maintained view, not linger at n=0
    val dir = java.nio.file.Files.createTempDirectory("ivm_edge").toString
    import spark.implicits._
    // year 2090: both keys are %10==3 deletes; year 2091 survives
    Seq((3L, 1L, "O", 10.0, "2090-01-01", "1-URGENT"),
      (13L, 1L, "O", 20.0, "2090-02-01", "1-URGENT"),
      (1L, 1L, "O", 30.0, "2091-01-01", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val edge = graft.queries.Maintenance.ivmAggregate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(edge.toSeq === Seq((2091L, 1L, 30.0)), s"got ${edge.toSeq}")
  }

  test("ivm min/max under deletes: maintain ≡ recompute; rescan bounded to touched groups, per side") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val M = graft.queries.Maintenance
    // face ≡ Spark-side recompute from the mutated base (independent of
    // the DuckDB oracle)
    val got = M.ivmMinMax(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val want = M.ivmMutatedBase(spark, sf)
      .groupBy(col("annee"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(DecimalType(18, 2))).cast(DecimalType(18, 2))
          .cast("double").as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .orderBy(col("annee")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.sameElements(want), "min/max maintain != recompute")
    // the per-side flags are LIVE on the real corpus: some side rescans
    // somewhere, some side folds blindly somewhere
    val flags = M.ivmMinMaxMerged(spark, sf)
      .select(col("annee"), col("need_min"), col("need_max")).collect()
      .map(r => (r.getBoolean(1), r.getBoolean(2)))
    assert(flags.exists(f => f._1 || f._2), "no group ever rescans — rule dead")
    assert(flags.exists(f => !f._1) && flags.exists(f => !f._2),
      "every group rescans both sides — blind-fold path dead")
    // hand fixture: one group whose deleted row is strictly interior
    // (NO rescan, extrema fold blindly) and one whose minimum leaves
    // (min-side rescan only); the rescan leg must read EXACTLY the
    // touched group's mutated rows
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivm_mm").toString
    Seq(
      // 2090: k=3 (v=20) deleted but interior; k=1/k=2 untouched
      (1L, 1L, "O", 10.0, "2090-01-01", "1-URGENT"),
      (2L, 1L, "O", 30.0, "2090-02-01", "1-URGENT"),
      (3L, 1L, "O", 20.0, "2090-03-01", "1-URGENT"),
      // 2091: k=13 (v=5) is the min AND leaves → min rescan; k=17
      // (v=8) duplicates in; k=11 (v=50) untouched max
      (11L, 1L, "O", 50.0, "2091-01-01", "1-URGENT"),
      (13L, 1L, "O", 5.0, "2091-02-01", "1-URGENT"),
      (17L, 1L, "O", 8.0, "2091-03-01", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val edge = M.ivmMinMax(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(edge.toSeq === Seq(
      (2090L, 2L, 40.0, 10.0, 30.0),
      (2091L, 3L, 66.0, 8.0, 50.0)), s"got ${edge.toSeq}")
    val merged = M.ivmMinMaxMerged(spark, dir)
    val fl = merged.select(col("annee"), col("need_min"), col("need_max"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2)))
      .toMap
    assert(fl(2090L) === ((false, false)), "interior delete must not rescan")
    assert(fl(2091L) === ((true, false)), "removed min must rescan min only")
    // bounded rescan: the leg's input is exactly the touched group's
    // mutated rows (2091: k=11, k=17, k=17-dup = 3 rows; 2090 never read)
    val touched = merged.filter(col("need_min") || col("need_max"))
      .select(col("annee"))
    val legRows = M.ivmMutatedBase(spark, dir)
      .join(broadcast(touched), Seq("annee")).count()
    assert(legRows === 3L, s"rescan read $legRows rows, want 3 (touched group only)")
  }

  test("bilateral ivm: maintain ≡ recompute under a moving dimension; the ΔS leg reads affected fact rows only") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val M = graft.queries.Maintenance
    val got = M.ivmJoinDim(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // independent Spark recompute: mutated fact ⋈ mutated dim
    val dim = graft.Tables.load(spark, sf, "customer")
      .select(col("c_custkey"),
        when(col("c_custkey") % 7 === 2,
          (col("c_nationkey").cast(LongType) + 7) % 25)
          .otherwise(col("c_nationkey").cast(LongType)).as("nation"))
    val base = graft.Tables.load(spark, sf, "orders").select(
      col("o_custkey"), col("o_orderstatus").as("dep"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("v"),
      col("o_orderkey").as("k"))
    val want = base.filter(col("k") % 10 =!= 3 && col("dep") =!= "P")
      .select(col("o_custkey"),
        when(col("k") % 20 === 4, col("v") + lit(5000.0).cast(DecimalType(18, 2)))
          .when(col("k") % 10 === 4, col("v") + lit(1000.0).cast(DecimalType(18, 2)))
          .otherwise(col("v")).as("v"))
      .unionByName(base.filter(col("k") % 10 === 7).select(col("o_custkey"), col("v")))
      .join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy(col("nation"))
      .agg(count(lit(1)).as("n"), sum(col("v")).cast(DecimalType(18, 2))
        .cast("double").as("rev"))
      .orderBy(col("nation")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.sameElements(want), "bilateral maintain != recompute")
    // the dim change is LIVE: the static-dim face must NOT agree (a
    // moved customer's orders credit a different nation)
    val staticDim = M.ivmJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(!got.sameElements(staticDim),
      "dim change invisible — bilateral face degenerate")
    // count conservation: moving customers between nations never
    // changes the total order count
    assert(got.map(_._2).sum === staticDim.map(_._2).sum)
    // plan: broadcast joins on both delta legs, no cartesian
    val plan = M.ivmJoinDim(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("ivm join view: maintain ≡ Spark recompute; delta joins the dim broadcast, fact never re-joined") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val df = graft.queries.Maintenance.ivmJoin(spark, sf)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val cust = graft.Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val base = graft.Tables.load(spark, sf, "orders").select(
      col("o_custkey"), col("o_orderstatus").as("dep"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("v"),
      col("o_orderkey").as("k"))
    val want = base.filter(col("k") % 10 =!= 3 && col("dep") =!= "P")
      .select(col("o_custkey"),
        when(col("k") % 20 === 4, col("v") + lit(5000.0).cast(DecimalType(18, 2)))
          .when(col("k") % 10 === 4, col("v") + lit(1000.0).cast(DecimalType(18, 2)))
          .otherwise(col("v")).as("v"))
      .unionByName(base.filter(col("k") % 10 === 7).select(col("o_custkey"), col("v")))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast(LongType).as("nation"))
      .agg(count(lit(1)).as("n"), sum(col("v")).cast(DecimalType(18, 2))
        .cast("double").as("rev"))
      .orderBy(col("nation"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.sameElements(want), "join-view maintain != recompute")
    // plan: the dim side of the delta join is broadcast, and the plan's
    // only parquet joins are delta-vs-dim + MV-vs-delta — the base
    // fact join is staged out (its MV artifact is read, not rebuilt)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "delta-dim join not broadcast")
    assert(!plan.contains("CartesianProduct"))
  }
}
