package graft.queries

import graft.Tables
import graft.ops.{CdcMerge, IncrementalAgg, Layout, StageOnce, ZoneMaps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Change row for the streaming CDC materializer's memory feed —
  * the declared dv3f columns the feed carries, plus op/seq.
  */
private[queries] case class CdcChangeRow(
    uid: String, annee: String, dep: String, libdep: String,
    nbtrans: Long, valeurfonc_sum: Double, op: String, seq: Long)

/** Net change row for the streaming-IVM memory feed: (group, Δcount,
  * Δsum) plus the order key for batch slicing.
  */
private[queries] case class IvmChangeRow(annee: Long, dn: Long, dv: Double,
    k: Long)

/** Change row for the streaming MIN/MAX-IVM feed: (group, removed
  * value, inserted value) — either side nullable — plus the order key
  * for batch slicing.
  */
private[queries] case class IvmMmChangeRow(annee: Long,
    old_v: java.lang.Double, new_v: java.lang.Double, k: Long)

/** CDC event row for the streaming-SCD2 memory feed (v is null for
  * deletes).
  */
private[queries] case class Scd2EventRow(k: Long, v: Option[Double],
    seq: Long, op: String)

/** Table-maintenance query surface: CDC merge (MERGE INTO with
  * deletes), incremental aggregate maintenance, and zone-map file
  * skipping — the lakehouse upkeep operations a 100 TB warehouse runs
  * between queries, each exercised through the driver's DuckDB gate so
  * the maintained/pruned results are proven equal to the from-scratch
  * formulations.
  */
object Maintenance {

  private val orderCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")

  /** MERGE with latest-wins I/U/D semantics over a deterministic
    * synthetic change batch (two update waves on overlapping keys prove
    * the per-key sequence resolution; deletes prove rows vanish;
    * inserts prove new keys appear). Oracle re-derives the same net
    * table in SQL.
    */
  def cdcMerge(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "orders")
      .select(orderCols.map(col): _*)
    // The change batch is an INPUT in the real operation (a CDC feed
    // delivers it); deriving it from `orders` inline is test
    // scaffolding, and left inline it re-scans orders 4 legs × 2
    // consumers per run — 9 file scans where the production shape has
    // 1 base scan + a small delta read. Stage the synthetic feed once
    // per JVM and read it like the feed it stands for.
    val feedDir = StageOnce.tmp("cdc_feed", dir)
    StageOnce(feedDir) {
      CdcMerge.syntheticOrderChanges(spark, base)
        .coalesce(4).write.mode("overwrite").parquet(feedDir)
    }
    CdcMerge.applyLatestWins(base, spark.read.parquet(feedDir),
      keys = Seq("o_orderkey"))
  }

  val cdcMergeSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      |  FROM orders),
      |changes AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority,
      |         'D' AS op, 1 AS seq FROM base WHERE o_orderkey % 10 = 3
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1000.0, o_orderpriority,
      |         'U', 1 FROM base WHERE o_orderkey % 10 = 4
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 5000.0, o_orderpriority,
      |         'U', 2 FROM base WHERE o_orderkey % 20 = 4
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice, o_orderpriority,
      |         'I', 1 FROM base WHERE o_orderkey % 10 = 7),
      |latest AS (
      |  SELECT * FROM (
      |    SELECT c.*, row_number() OVER (PARTITION BY o_orderkey
      |      ORDER BY seq DESC, op DESC) AS rn FROM changes c) WHERE rn = 1)
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      |FROM base b
      |WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.o_orderkey = b.o_orderkey)
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      |FROM latest WHERE op <> 'D'""".stripMargin

  /** Shared dv3f-shaped projection of `orders` for the CDC table faces:
    * uid = order key, partition/cod = order status, one long + one
    * double metric. Deterministic at every SF and reproducible in SQL.
    */
  private def ordersAsStaging(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey").cast(StringType).as("uid"),
      year(col("o_orderdate")).cast(StringType).as("annee"),
      col("o_orderstatus").as("dep"),
      col("o_orderpriority").as("libdep"),
      col("o_orderstatus").as("cod"),
      col("o_custkey").as("nbtrans"),
      col("o_totalprice").as("valeurfonc_sum"))

  /** PARTITIONED CDC merge ([[graft.dv3f.Upsert.mergeCdcPartitioned]])
    * through its oracle face: orders loaded as a dv3f-shaped table
    * partitioned on `dep` (= order status), then three change waves
    * applied across TWO commits — point deletes, two overlapping
    * update waves (latest-wins across commits), inserts into a NEW
    * partition ('N'), and a full-partition takedown (every 'P' key
    * deleted, so the partition VANISHES from the marker map). The
    * oracle re-derives the net table in SQL; hash equality proves the
    * multi-commit partitioned protocol converges to the same rows as
    * a from-scratch derivation. Spec-level evidence (partition-pruned
    * reads, marker layout, OCC races) stays in UpsertSpec — this row
    * pins the DATAFLOW result. Staged once per JVM; bench iterations
    * measure the versioned partitioned read.
    */
  def cdcMergePartitioned(spark: SparkSession, dir: String): DataFrame = {
    graft.dv3f.Upsert.read(spark, stagedCdcPartTable(spark, dir))
      .select(col("uid"), col("annee"), col("dep"), col("libdep"),
        col("nbtrans"), col("valeurfonc_sum"))
  }

  /** The three-commit partitioned CDC table shared by the partitioned-
    * merge and time-travel faces — staged once per JVM, whoever runs
    * first builds it.
    */
  private def stagedCdcPartTable(spark: SparkSession, dir: String): String = {
    import graft.dv3f.{Dv3fConfig, Upsert}
    val table = Dv3fConfig.departement
    val target = StageOnce.tmp("cdc_part_tbl", dir) + "/t"
    StageOnce(target) {
      val base = ordersAsStaging(Tables.load(spark, dir, "orders"))
      val key = col("uid").cast(LongType)
      // commit 1: everything inserts (seq 1)
      Upsert.mergeCdcPartitioned(spark, target,
        base.withColumn("op", lit("I")).withColumn("seq", lit(1L)),
        table, partitionCol = "dep")
      // commit 2: point deletes + first update wave + new-partition
      // inserts (seq 2)
      val w2 = base.filter(key % 10 === 3)
        .withColumn("op", lit("D")).withColumn("seq", lit(2L))
        .unionByName(base.filter(key % 10 === 4)
          .withColumn("valeurfonc_sum", col("valeurfonc_sum") + 1000.0)
          .withColumn("op", lit("U")).withColumn("seq", lit(2L)))
        .unionByName(base.filter(key % 10 === 7)
          .withColumn("uid", (key + 10000000L).cast(StringType))
          .withColumn("dep", lit("N"))
          .withColumn("op", lit("I")).withColumn("seq", lit(2L)))
      Upsert.mergeCdcPartitioned(spark, target, w2, table, partitionCol = "dep")
      // commit 3: second update wave (seq 3, beats seq 2 on the %20
      // half) + full-partition takedown of 'P' (seq 4 so the delete
      // outranks this wave's update on any overlapping key)
      val w3 = base.filter(key % 20 === 4)
        .withColumn("valeurfonc_sum", col("valeurfonc_sum") + 5000.0)
        .withColumn("op", lit("U")).withColumn("seq", lit(3L))
        .unionByName(base.filter(col("dep") === "P")
          .withColumn("op", lit("D")).withColumn("seq", lit(4L)))
      Upsert.mergeCdcPartitioned(spark, target, w3, table, partitionCol = "dep")
    }
    target
  }

  /** INCREMENTAL VIEW MAINTENANCE of an aggregate (the counting
    * algorithm — Gupta, Mumick & Subrahmanian, SIGMOD 1993, the
    * standard every IVM engine implements): a per-year (COUNT, SUM)
    * materialized view over orders is maintained under the partitioned
    * CDC face's NET change set — rows leaving carry (−1, −v), in-place
    * updates carry (0, Δv), rows entering carry (+1, +v) — by ONE
    * group-keyed outer merge of the stored MV with the delta
    * aggregate. The maintained path never re-aggregates the base: the
    * MV is a staged parquet artifact (read-only here), the delta
    * aggregate is change-feed-sized, and the merge touches |groups|
    * rows — at 100 TB this is the difference between a view refresh
    * that costs ∝ delta and one that costs a corpus scan. The oracle
    * RECOMPUTES the aggregate from the mutated table state from
    * scratch: "maintain ≡ recompute" is the IVM correctness contract,
    * hash-checked. (The delta here is derived in-flight from orders —
    * the stand-in for a delivered change feed, the q_cdc_merge
    * staged-input convention; the MV-side economics are unaffected.)
    * Sums ride DECIMAL(18,2) end to end (the moneySum rule) and only
    * cast to double in the final projection, so maintain-vs-recompute
    * equality is exact, not float-accumulation luck.
    */
  /** The base-aggregate MV snapshot shared by the batch and streaming
    * IVM faces — staged once per JVM, whoever runs first builds it.
    */
  private def stagedIvmMv(spark: SparkSession, dir: String): String = {
    val mvPath = StageOnce.tmp("ivm_mv", dir)
    StageOnce(mvPath) {
      Tables.load(spark, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast(LongType).as("annee"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("s"))
        .write.mode("overwrite").parquet(mvPath)
    }
    mvPath
  }

  /** The per-year NET change rows (annee, dn, dv, k) — one row per
    * mutated order, carrying the order key for feed slicing.
    */
  private def ivmChangeRows(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "orders").select(
      year(col("o_orderdate")).cast(LongType).as("annee"),
      col("o_orderstatus").as("dep"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("v"),
      col("o_orderkey").as("k"))
    val leaving = base.filter(col("k") % 10 === 3 || col("dep") === "P")
      .select(col("annee"), lit(-1L).as("dn"), (-col("v")).as("dv"), col("k"))
    val changing = base.filter(col("k") % 10 =!= 3 && col("dep") =!= "P" &&
        col("k") % 10 === 4)
      .select(col("annee"), lit(0L).as("dn"),
        when(col("k") % 20 === 4, lit(5000.0)).otherwise(lit(1000.0))
          .cast(DecimalType(18, 2)).as("dv"), col("k"))
    val entering = base.filter(col("k") % 10 === 7)
      .select(col("annee"), lit(1L).as("dn"), col("v").as("dv"), col("k"))
    leaving.unionByName(changing).unionByName(entering)
  }

  def ivmAggregate(spark: SparkSession, dir: String): DataFrame = {
    val mvPath = stagedIvmMv(spark, dir)
    val delta = ivmChangeRows(spark, dir)
      .groupBy(col("annee"))
      .agg(sum(col("dn")).as("dn"), sum(col("dv")).as("dv"))
    spark.read.parquet(mvPath)
      .join(delta, Seq("annee"), "full_outer")
      .select(col("annee"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_rows"),
        (coalesce(col("s"), lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))) +
          coalesce(col("dv"), lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))))
          .cast(DecimalType(18, 2)).cast(DoubleType).as("total_usd"))
      .filter(col("n_rows") > 0)
      .orderBy(col("annee"))
  }

  /** STREAMING IVM through its oracle face
    * ([[graft.streaming.IvmStream]]): the net change feed arrives as a
    * real StreamingQuery over a memory source in three micro-batches
    * (sliced by order key), WITH a kill-and-resume after batch 2, each
    * batch folding into a new MV generation by the counting-algorithm
    * merge — the continuous refresh loop a production MV runs. The
    * converged view is the batch face's exact result, so the oracle is
    * [[ivmAggregateSql]] VERBATIM: stream ≡ batch ≡ recompute, all
    * hash-checked. Staged once per JVM; bench iterations read the
    * materialized generations.
    */
  def ivmStreamMaterialize(spark: SparkSession, dir: String): DataFrame = {
    val mv0 = stagedIvmMv(spark, dir)
    val root = StageOnce.tmp("ivm_stream", dir)
    StageOnce(root) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val rows = ivmChangeRows(spark, dir)
        .select(col("annee"), col("dn"), col("dv").cast(DoubleType), col("k"))
        .collect().map(r => IvmChangeRow(r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getLong(3)))
      val ckpt = StageOnce.tmp("ivm_stream_ckpt", dir)
      val mem = MemoryStream[IvmChangeRow]
      def start() = graft.streaming.IvmStream.start(
        mem.toDS().toDF(), root, mv0, ckpt)
      val q1 = start()
      try {
        mem.addData(rows.filter(_.k % 3 == 0).toIndexedSeq)
        q1.processAllAvailable()
        mem.addData(rows.filter(_.k % 3 == 1).toIndexedSeq)
        q1.processAllAvailable()
      } finally q1.stop()
      val q2 = start() // kill-and-resume from the checkpoint
      try {
        mem.addData(rows.filter(_.k % 3 == 2).toIndexedSeq)
        q2.processAllAvailable()
      } finally q2.stop()
    }
    graft.streaming.IvmStream.view(spark, root)
  }

  /** IVM for MIN/MAX under deletes — the counting algorithm's known
    * hard case (Gupta, Mumick & Subrahmanian, SIGMOD 1993 §5: MIN/MAX
    * are not self-maintainable under deletions): COUNT/SUM fold deltas
    * blindly, but a deleted (or updated-away) value EQUAL to a group's
    * stored extremum invalidates that extremum, forcing a rescan of
    * the group's rows in the mutated base. The maintained plan applies
    * the textbook bounded-rescan rule per side:
    *
    *  - inserts only → new extremum = least/greatest(stored, inserted
    *    extremum), no base access;
    *  - a removal touching the stored min (resp. max) — detected by
    *    `removed_min == stored_min`, since no removed value can be
    *    smaller — marks the group for rescan of THAT side;
    *  - the rescan leg joins the mutated base against the broadcast
    *    touched-group set, so its cost is ∝ rows of touched groups
    *    (spec-pinned in MaintenanceSpec), never a full re-aggregation.
    *
    * COUNT/SUM ride the same merge counting-style (DECIMAL(18,2) end
    * to end). Oracle recomputes everything from the mutated base:
    * maintain ≡ recompute, hash-checked. Declared basis-mismatch cell
    * (BASELINE.md): the oracle's from-scratch recompute wins the tiny
    * SF by construction; the maintain path's cost stays ∝ delta +
    * touched groups at any scale.
    */
  def ivmMinMax(spark: SparkSession, dir: String): DataFrame = {
    val merged = ivmMinMaxMerged(spark, dir)
    val rescan = ivmMinMaxRescanLeg(spark, dir,
      merged.filter(col("need_min") || col("need_max")).select(col("annee")))
    merged.join(rescan, Seq("annee"), "left")
      .select(col("annee"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_rows"),
        (coalesce(col("s"), lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))) +
          coalesce(col("dv"), lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))))
          .cast(DecimalType(18, 2)).cast(DoubleType).as("total_usd"),
        when(col("need_min"), col("r_mn"))
          .otherwise(least(col("mn"), col("ins_mn"))).as("min_usd"),
        when(col("need_max"), col("r_mx"))
          .otherwise(greatest(col("mx"), col("ins_mx"))).as("max_usd"))
      .filter(col("n_rows") > 0)
      .orderBy(col("annee"))
  }

  /** The stored-MV ⋈ delta-aggregate merge with the per-side rescan
    * flags — package-visible so the spec can pin the touched-group
    * set independently of the final projection.
    */
  private[graft] def ivmMinMaxMerged(spark: SparkSession,
      dir: String): DataFrame = {
    val mvPath = StageOnce.tmp("ivm_minmax_mv", dir)
    StageOnce(mvPath) {
      Tables.load(spark, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast(LongType).as("annee"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("s"),
          min(col("o_totalprice")).as("mn"),
          max(col("o_totalprice")).as("mx"))
        .write.mode("overwrite").parquet(mvPath)
    }
    val dAgg = ivmMinMaxChangeRows(spark, dir)
      .groupBy(col("annee"))
      .agg(sum(when(col("new_v").isNull, -1L)
          .when(col("old_v").isNull, 1L).otherwise(0L)).as("dn"),
        sum(coalesce(col("new_v").cast(DecimalType(18, 2)),
            lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))) -
          coalesce(col("old_v").cast(DecimalType(18, 2)),
            lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2)))).as("dv"),
        min(col("new_v")).as("ins_mn"), max(col("new_v")).as("ins_mx"),
        min(col("old_v")).as("rem_mn"), max(col("old_v")).as("rem_mx"))
    spark.read.parquet(mvPath)
      .join(dAgg, Seq("annee"), "full_outer")
      .withColumn("need_min",
        coalesce(col("rem_mn") === col("mn"), lit(false)))
      .withColumn("need_max",
        coalesce(col("rem_mx") === col("mx"), lit(false)))
  }

  /** The (annee, old_v, new_v, k) change rows shared by the batch
    * min/max face and the streaming feed: an update is delete-old +
    * insert-new for the extremum rule; dn/dv for COUNT/SUM fall out of
    * the same rows (old-only → −1, new-only → +1, both → 0 and Δv).
    */
  private[graft] def ivmMinMaxChangeRows(spark: SparkSession,
      dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "orders").select(
      year(col("o_orderdate")).cast(LongType).as("annee"),
      col("o_orderstatus").as("dep"),
      col("o_totalprice").as("v"),
      col("o_orderkey").as("k"))
    val nullV = lit(null).cast(DoubleType)
    val leaving = base.filter(col("k") % 10 === 3 || col("dep") === "P")
      .select(col("annee"), col("v").as("old_v"), nullV.as("new_v"), col("k"))
    val changing = base.filter(col("k") % 10 =!= 3 && col("dep") =!= "P" &&
        col("k") % 10 === 4)
      .select(col("annee"), col("v").as("old_v"),
        (col("v") + when(col("k") % 20 === 4, lit(5000.0))
          .otherwise(lit(1000.0))).as("new_v"), col("k"))
    val entering = base.filter(col("k") % 10 === 7)
      .select(col("annee"), nullV.as("old_v"), col("v").as("new_v"), col("k"))
    leaving.unionByName(changing).unionByName(entering)
  }

  /** The bounded rescan: mutated-base rows of the touched groups ONLY
    * (broadcast semi-join on the group key), re-aggregated for fresh
    * extrema. Package-visible so the spec can count exactly what it
    * reads.
    */
  private[graft] def ivmMinMaxRescanLeg(spark: SparkSession, dir: String,
      groups: DataFrame): DataFrame =
    ivmMutatedBase(spark, dir)
      .join(broadcast(groups), Seq("annee"))
      .groupBy(col("annee"))
      .agg(min(col("v")).as("r_mn"), max(col("v")).as("r_mx"))

  /** The post-change table state (what the CDC merge would have left
    * behind) — the rescan leg's input, derived in-flight under the
    * declared staged-input convention.
    */
  private[graft] def ivmMutatedBase(spark: SparkSession,
      dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "orders").select(
      year(col("o_orderdate")).cast(LongType).as("annee"),
      col("o_orderstatus").as("dep"),
      col("o_totalprice").as("v"),
      col("o_orderkey").as("k"))
    base.filter(col("k") % 10 =!= 3 && col("dep") =!= "P")
      .select(col("annee"),
        when(col("k") % 20 === 4, col("v") + 5000.0)
          .when(col("k") % 10 === 4, col("v") + 1000.0)
          .otherwise(col("v")).as("v"))
      .unionByName(base.filter(col("k") % 10 === 7)
        .select(col("annee"), col("v")))
  }

  /** Streaming MIN/MAX IVM through its oracle face
    * ([[graft.streaming.IvmMinMaxStream]]): the (old_v, new_v) change
    * feed arrives as a real StreamingQuery over a memory source in
    * three micro-batches (sliced by order key) WITH a kill-and-resume
    * after batch 2, each batch folding into a new MV generation —
    * COUNT/SUM counting-style, extrema by blind insert-fold plus the
    * bounded touched-group rescan against the base snapshot + the
    * stream's own value log. The converged view is the batch face's
    * exact result, so the oracle is [[ivmMinMaxSql]] VERBATIM:
    * stream ≡ batch ≡ recompute, hash-checked through the restart.
    * Staged once per JVM; bench iterations read the materialized
    * generations.
    */
  def ivmMinMaxStreamMaterialize(spark: SparkSession, dir: String): DataFrame = {
    val basePath = StageOnce.tmp("ivm_mm_base", dir)
    StageOnce(basePath) {
      Tables.load(spark, dir, "orders")
        .select(year(col("o_orderdate")).cast(LongType).as("annee"),
          col("o_totalprice").as("v"))
        .write.mode("overwrite").parquet(basePath)
    }
    val root = StageOnce.tmp("ivm_mm_stream", dir)
    StageOnce(root) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val rows = ivmMinMaxChangeRows(spark, dir)
        .orderBy(col("k")).collect().map { r =>
          IvmMmChangeRow(r.getLong(0),
            if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1)),
            if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2)),
            r.getLong(3))
        }
      val ckpt = StageOnce.tmp("ivm_mm_stream_ckpt", dir)
      val mem = MemoryStream[IvmMmChangeRow]
      def start() = graft.streaming.IvmMinMaxStream.start(
        mem.toDS().toDF(), root, basePath, ckpt)
      val q1 = start()
      try {
        mem.addData(rows.filter(_.k % 3 == 0).toIndexedSeq)
        q1.processAllAvailable()
        mem.addData(rows.filter(_.k % 3 == 1).toIndexedSeq)
        q1.processAllAvailable()
      } finally q1.stop()
      val q2 = start() // kill-and-resume from the checkpoint
      try {
        mem.addData(rows.filter(_.k % 3 == 2).toIndexedSeq)
        q2.processAllAvailable()
      } finally q2.stop()
    }
    graft.streaming.IvmMinMaxStream.view(spark, root)
  }

  /** MIN/MAX IVM oracle: the full recompute from the mutated base. */
  val ivmMinMaxSql: String =
    """WITH base AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS annee,
      |         o_orderstatus AS dep, o_totalprice AS v, o_orderkey AS k
      |  FROM orders),
      |final AS (
      |  SELECT annee,
      |    CASE WHEN k % 20 = 4 THEN v + 5000.0
      |         WHEN k % 10 = 4 THEN v + 1000.0 ELSE v END AS v
      |  FROM base WHERE k % 10 <> 3 AND dep <> 'P'
      |  UNION ALL
      |  SELECT annee, v FROM base WHERE k % 10 = 7)
      |SELECT annee, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(CAST(sum(CAST(v AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
      |    AS total_usd,
      |  min(v) AS min_usd, max(v) AS max_usd
      |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  /** IVM of an aggregate over a JOIN view (the delta-join rule:
    * Δ(R ⋈ S) = ΔR ⋈ S when the dimension side is static between
    * refreshes — the production fact-stream/dim shape): per-nation
    * (order count, revenue) over orders ⋈ customer, maintained under
    * the same net change set as [[ivmAggregate]] by joining ONLY the
    * delta against the broadcastable customer dim and merging the
    * group-keyed result into the stored MV. The base join is never
    * re-executed: refresh cost ∝ |Δ| · (broadcast dim probe) +
    * |groups| — at 100 TB the fact side never re-shuffles. Oracle
    * recomputes the join + aggregate from the mutated fact table from
    * scratch (maintain ≡ recompute, hash-checked); DECIMAL(18,2)
    * end-to-end as in the aggregate face.
    */
  def ivmJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val mvPath = StageOnce.tmp("ivm_join_mv", dir)
    StageOnce(mvPath) {
      Tables.load(spark, dir, "orders")
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").cast(LongType).as("nation"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("s"))
        .write.mode("overwrite").parquet(mvPath)
    }
    val base = Tables.load(spark, dir, "orders").select(
      col("o_custkey"), col("o_orderstatus").as("dep"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("v"),
      col("o_orderkey").as("k"))
    val leaving = base.filter(col("k") % 10 === 3 || col("dep") === "P")
      .select(col("o_custkey"), lit(-1L).as("dn"), (-col("v")).as("dv"))
    val changing = base.filter(col("k") % 10 =!= 3 && col("dep") =!= "P" &&
        col("k") % 10 === 4)
      .select(col("o_custkey"), lit(0L).as("dn"),
        when(col("k") % 20 === 4, lit(5000.0)).otherwise(lit(1000.0))
          .cast(DecimalType(18, 2)).as("dv"))
    val entering = base.filter(col("k") % 10 === 7)
      .select(col("o_custkey"), lit(1L).as("dn"), col("v").as("dv"))
    val delta = leaving.unionByName(changing).unionByName(entering)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast(LongType).as("nation"))
      .agg(sum(col("dn")).as("dn"), sum(col("dv")).as("dv"))
    spark.read.parquet(mvPath)
      .join(delta, Seq("nation"), "full_outer")
      .select(col("nation"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
        (coalesce(col("s"), lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))) +
          coalesce(col("dv"), lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))))
          .cast(DecimalType(18, 2)).cast(DoubleType).as("revenue"))
      .filter(col("n_orders") > 0)
      .orderBy(col("nation"))
  }

  /** BILATERAL IVM of the join view — the delta-join rule's other half
    * (Gupta/Mumick/Subrahmanian §4: Δ(R⋈S) with BOTH sides changing):
    * the [[ivmJoin]] face assumes a static dimension; here a slice of
    * customers MOVES NATION between refreshes (the slowly-changing-
    * dimension event every warehouse sees), and the view is maintained
    * by the exact expansion
    *
    *   V_new − V_old = ΔR ⋈ S_old  +  R_new ⋈ ΔS
    *
    * (expand (R+ΔR)⋈(S+ΔS) and fold ΔR⋈ΔS into the second term). The
    * two legs are both BOUNDED:
    *  - ΔR ⋈ S_old: the fact delta against the broadcast OLD dim —
    *    ∝ |ΔR|, the [[ivmJoin]] leg unchanged;
    *  - R_new ⋈ ΔS: the mutated fact rows of the CHANGED customers
    *    ONLY (broadcast semi-join on the changed-key set; each
    *    contributes (−1, −v) at its old nation and (+1, +v) at its
    *    new one) — ∝ the changed customers' fact rows, the
    *    [[ivmMinMax]] bounded-rescan idea applied to a dimension
    *    change, never a full fact re-join.
    * Refresh cost ∝ |ΔR| + |affected fact rows| + |groups|; the base
    * join never re-executes. Oracle recomputes from the mutated fact ⋈
    * mutated dim (maintain ≡ recompute, hash-checked); DECIMAL(18,2)
    * end to end. Declared basis-mismatch bench cell with the other IVM
    * faces.
    */
  def ivmJoinDim(spark: SparkSession, dir: String): DataFrame = {
    val custOld = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast(LongType).as("nation"))
    val mvPath = StageOnce.tmp("ivm_joindim_mv", dir)
    StageOnce(mvPath) {
      // no broadcast HINT anywhere in this face: the dim is
      // corpus-proportional under amplification, so AQE's size check
      // must stay free to flip these joins to shuffle at scale (the
      // documented growth mode); at test SFs it still broadcasts
      Tables.load(spark, dir, "orders")
        .join(custOld, col("o_custkey") === col("c_custkey"))
        .groupBy(col("nation"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("s"))
        .write.mode("overwrite").parquet(mvPath)
    }
    val base = Tables.load(spark, dir, "orders").select(
      col("o_custkey"), col("o_orderstatus").as("dep"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("v"),
      col("o_orderkey").as("k"))
    // fact delta (the ivmJoin change rules), ⋈ the OLD dim
    val leaving = base.filter(col("k") % 10 === 3 || col("dep") === "P")
      .select(col("o_custkey"), lit(-1L).as("dn"), (-col("v")).as("dv"))
    val changing = base.filter(col("k") % 10 =!= 3 && col("dep") =!= "P" &&
        col("k") % 10 === 4)
      .select(col("o_custkey"), lit(0L).as("dn"),
        when(col("k") % 20 === 4, lit(5000.0)).otherwise(lit(1000.0))
          .cast(DecimalType(18, 2)).as("dv"))
    val entering = base.filter(col("k") % 10 === 7)
      .select(col("o_custkey"), lit(1L).as("dn"), col("v").as("dv"))
    val termA = leaving.unionByName(changing).unionByName(entering)
      .join(custOld, col("o_custkey") === col("c_custkey"))
      .select(col("nation"), col("dn"), col("dv"))
    // dim delta: every c_custkey % 7 == 2 customer moves nation
    val changedCust = custOld.filter(col("c_custkey") % 7 === 2)
      .select(col("c_custkey"), col("nation").as("nation_old"),
        ((col("nation") + 7) % 25).as("nation_new"))
    // R_new ⋈ ΔS: the mutated fact rows of changed customers only
    val rNew = base.filter(col("k") % 10 =!= 3 && col("dep") =!= "P")
      .select(col("o_custkey"),
        when(col("k") % 20 === 4, col("v") + lit(5000.0).cast(DecimalType(18, 2)))
          .when(col("k") % 10 === 4, col("v") + lit(1000.0).cast(DecimalType(18, 2)))
          .otherwise(col("v")).as("v"))
      .unionByName(base.filter(col("k") % 10 === 7)
        .select(col("o_custkey"), col("v")))
    val affected = rNew
      .join(changedCust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("nation_old"), col("nation_new"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val termB = affected
      .select(col("nation_old").as("nation"), (-col("n")).as("dn"),
        (-col("s")).as("dv"))
      .unionByName(affected.select(col("nation_new").as("nation"),
        col("n").as("dn"), col("s").as("dv")))
    val delta = termA.unionByName(termB)
      .groupBy(col("nation"))
      .agg(sum(col("dn")).as("dn"),
        sum(col("dv")).cast(DecimalType(18, 2)).as("dv"))
    spark.read.parquet(mvPath)
      .join(delta, Seq("nation"), "full_outer")
      .select(col("nation"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
        (coalesce(col("s"), lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))) +
          coalesce(col("dv"), lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))))
          .cast(DecimalType(18, 2)).cast(DoubleType).as("revenue"))
      .filter(col("n_orders") > 0)
      .orderBy(col("nation"))
  }

  /** Bilateral-IVM oracle: recompute from mutated fact ⋈ mutated dim. */
  val ivmJoinDimSql: String =
    """WITH base AS (
      |  SELECT o_custkey, o_orderstatus AS dep, o_totalprice AS v,
      |         o_orderkey AS k
      |  FROM orders),
      |final AS (
      |  SELECT o_custkey,
      |    CASE WHEN k % 20 = 4 THEN v + 5000.0
      |         WHEN k % 10 = 4 THEN v + 1000.0 ELSE v END AS v
      |  FROM base WHERE k % 10 <> 3 AND dep <> 'P'
      |  UNION ALL
      |  SELECT o_custkey, v FROM base WHERE k % 10 = 7),
      |dim AS (
      |  SELECT c_custkey,
      |    CAST(CASE WHEN c_custkey % 7 = 2 THEN (c_nationkey + 7) % 25
      |         ELSE c_nationkey END AS BIGINT) AS nation
      |  FROM customer)
      |SELECT d.nation, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(CAST(sum(CAST(f.v AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
      |    AS revenue
      |FROM final f JOIN dim d ON f.o_custkey = d.c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val ivmJoinSql: String =
    """WITH base AS (
      |  SELECT o_custkey, o_orderstatus AS dep, o_totalprice AS v,
      |         o_orderkey AS k
      |  FROM orders),
      |final AS (
      |  SELECT o_custkey,
      |    CASE WHEN k % 20 = 4 THEN v + 5000.0
      |         WHEN k % 10 = 4 THEN v + 1000.0 ELSE v END AS v
      |  FROM base WHERE k % 10 <> 3 AND dep <> 'P'
      |  UNION ALL
      |  SELECT o_custkey, v FROM base WHERE k % 10 = 7)
      |SELECT c.c_nationkey AS nation, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(CAST(sum(CAST(f.v AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
      |    AS revenue
      |FROM final f JOIN customer c ON f.o_custkey = c.c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** IVM oracle: the aggregate RECOMPUTED from the mutated table state
    * (the partitioned CDC face's final rows) — maintain ≡ recompute.
    */
  val ivmAggregateSql: String =
    """WITH base AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS annee,
      |         o_orderstatus AS dep, o_totalprice AS v, o_orderkey AS k
      |  FROM orders),
      |final AS (
      |  SELECT annee,
      |    CASE WHEN k % 20 = 4 THEN v + 5000.0
      |         WHEN k % 10 = 4 THEN v + 1000.0 ELSE v END AS v
      |  FROM base WHERE k % 10 <> 3 AND dep <> 'P'
      |  UNION ALL
      |  SELECT annee, v FROM base WHERE k % 10 = 7)
      |SELECT annee, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(CAST(sum(CAST(v AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
      |    AS total_usd
      |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  /** Time-travel audit ([[graft.dv3f.Upsert.readVersion]]) through an
    * oracle face: diff snapshot v2 (after the delete/update/insert
    * wave) against the live table (after the second update wave and
    * the 'P' partition takedown) on the shared three-commit CDC table.
    * Emits exactly the rows a between-versions audit reports — updated
    * keys with old/new values and vanished keys with a NULL new side.
    * keepCommits retains v2 alongside v3, so this exercises the real
    * vacuum-bounded history contract; the oracle re-derives both
    * versions' contents from scratch in SQL, proving readVersion
    * serves the COMMITTED historical state, not a reconstruction.
    */
  def timeTravel(spark: SparkSession, dir: String): DataFrame = {
    import graft.dv3f.Upsert
    val target = stagedCdcPartTable(spark, dir)
    val prev = Upsert.readVersion(spark, target, 2)
      .select(col("uid"), col("dep"), col("valeurfonc_sum").as("v_old"))
    val live = Upsert.read(spark, target)
      .select(col("uid"), col("valeurfonc_sum").as("v_new"))
    prev.join(live, Seq("uid"), "full_outer")
      .filter(col("v_old").isNull || col("v_new").isNull ||
        col("v_old") =!= col("v_new"))
      .select(col("uid"), col("dep"), col("v_old"), col("v_new"))
  }

  val timeTravelSql: String =
    """WITH base AS (
      |  SELECT CAST(o_orderkey AS VARCHAR) AS uid, o_orderstatus AS dep,
      |         o_totalprice AS v, o_orderkey AS k
      |  FROM orders),
      |v2 AS (
      |  SELECT uid, dep,
      |    CASE WHEN k % 10 = 4 THEN v + 1000.0 ELSE v END AS v_old
      |  FROM base WHERE k % 10 <> 3
      |  UNION ALL
      |  SELECT CAST(k + 10000000 AS VARCHAR), 'N', v FROM base WHERE k % 10 = 7),
      |live AS (
      |  SELECT uid,
      |    CASE WHEN k % 20 = 4 THEN v + 5000.0
      |         WHEN k % 10 = 4 THEN v + 1000.0 ELSE v END AS v_new
      |  FROM base WHERE k % 10 <> 3 AND dep <> 'P'
      |  UNION ALL
      |  SELECT CAST(k + 10000000 AS VARCHAR), v FROM base WHERE k % 10 = 7)
      |SELECT coalesce(v2.uid, live.uid) AS uid, v2.dep, v2.v_old, live.v_new
      |FROM v2 FULL JOIN live ON v2.uid = live.uid
      |WHERE v2.v_old IS NULL OR live.v_new IS NULL OR v2.v_old <> live.v_new""".stripMargin

  val cdcMergePartitionedSql: String =
    """WITH base AS (
      |  SELECT CAST(o_orderkey AS VARCHAR) AS uid,
      |         CAST(year(o_orderdate) AS VARCHAR) AS annee,
      |         o_orderstatus AS dep, o_orderpriority AS libdep,
      |         o_custkey AS nbtrans, o_totalprice AS valeurfonc_sum,
      |         o_orderkey AS k
      |  FROM orders)
      |SELECT uid, annee, dep, libdep, nbtrans,
      |  CASE WHEN k % 20 = 4 THEN valeurfonc_sum + 5000.0
      |       WHEN k % 10 = 4 THEN valeurfonc_sum + 1000.0
      |       ELSE valeurfonc_sum END AS valeurfonc_sum
      |FROM base
      |WHERE k % 10 <> 3 AND dep <> 'P'
      |UNION ALL
      |SELECT CAST(k + 10000000 AS VARCHAR), annee, 'N', libdep, nbtrans,
      |  valeurfonc_sum
      |FROM base WHERE k % 10 = 7""".stripMargin

  /** Streaming CDC materializer ([[graft.streaming.CdcStream]])
    * through its oracle face: a REAL StreamingQuery over a memory
    * change feed (a deterministic ~2% slice of orders), three
    * micro-batches — inserts, then updates+deletes, then a second
    * update wave — each folding into the versioned table via
    * mergeCdc with a checkpoint. The oracle re-derives the final
    * table in SQL, so the stream's exactly-once visible state is
    * hash-checked, not just spec-asserted. Staged once per JVM (the
    * stream runs to completion at stage time); bench iterations
    * measure the materialized read.
    */
  def cdcStreamMaterialize(spark: SparkSession, dir: String): DataFrame = {
    import graft.dv3f.Dv3fConfig
    val table = Dv3fConfig.departement
    val target = StageOnce.tmp("cdc_stream_tbl", dir) + "/t"
    StageOnce(target) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val feed = ordersAsStaging(Tables.load(spark, dir, "orders"))
        .filter(col("uid").cast(LongType) % 100 < 2)
        .select("uid", "annee", "dep", "libdep", "nbtrans", "valeurfonc_sum")
        .collect().map { r =>
          (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
            r.getLong(4), r.getDouble(5))
        }
      val ckpt = StageOnce.tmp("cdc_stream_ckpt", dir)
      val mem = MemoryStream[CdcChangeRow]
      val q = graft.streaming.CdcStream.start(mem.toDS().toDF(), target,
        table, ckpt)
      try {
        def rows(f: ((String, String, String, String, Long, Double)) => Boolean,
            mutate: Double => Double, op: String, seq: Long) =
          feed.filter(f).map { case (uid, an, dep, li, nb, v) =>
            CdcChangeRow(uid, an, dep, li, nb, mutate(v), op, seq)
          }.toIndexedSeq
        mem.addData(rows(_ => true, identity, "I", 1L))
        q.processAllAvailable()
        mem.addData(
          rows(t => t._1.toLong % 10 == 3, identity, "D", 2L) ++
            rows(t => t._1.toLong % 10 == 4, _ + 1000.0, "U", 2L))
        q.processAllAvailable()
        mem.addData(rows(t => t._1.toLong % 20 == 4, _ + 5000.0, "U", 3L))
        q.processAllAvailable()
      } finally q.stop()
    }
    graft.dv3f.Upsert.read(spark, target)
      .select(col("uid"), col("annee"), col("dep"), col("libdep"),
        col("nbtrans"), col("valeurfonc_sum"))
  }

  val cdcStreamMaterializeSql: String =
    """WITH base AS (
      |  SELECT CAST(o_orderkey AS VARCHAR) AS uid,
      |         CAST(year(o_orderdate) AS VARCHAR) AS annee,
      |         o_orderstatus AS dep, o_orderpriority AS libdep,
      |         o_custkey AS nbtrans, o_totalprice AS valeurfonc_sum,
      |         o_orderkey AS k
      |  FROM orders WHERE o_orderkey % 100 < 2)
      |SELECT uid, annee, dep, libdep, nbtrans,
      |  CASE WHEN k % 20 = 4 THEN valeurfonc_sum + 5000.0
      |       WHEN k % 10 = 4 THEN valeurfonc_sum + 1000.0
      |       ELSE valeurfonc_sum END AS valeurfonc_sum
      |FROM base WHERE k % 10 <> 3""".stripMargin

  /** Incrementally-maintained lineitem aggregate: three disjoint delta
    * batches partial-aggregated independently, then merged — the
    * maintained state must hash-match the one-shot GROUP BY the oracle
    * runs (exact-decimal sums make the equality bitwise, not
    * approximate).
    */
  def incrAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val keys = Seq("l_returnflag", "l_linestatus")
    val partials = (0 until 3).map(i =>
      IncrementalAgg.partial(li.filter(col("l_orderkey") % 3 === i), keys, "l_quantity"))
    IncrementalAgg.merge(partials, keys)
      .select(col("l_returnflag"), col("l_linestatus"), col("n"),
        col("sum_").cast(DoubleType).as("sum_qty"),
        col("min_").as("min_qty"), col("max_").as("max_qty"))
  }

  val incrAggSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** The PERSISTED exactly-once face of the same aggregate: three delta
    * batches appended as batch-stamped partials (batch 1 appended
    * TWICE — the at-least-once replay the protocol absorbs), state
    * compacted mid-stream, then read back. Must still hash-match the
    * one-shot GROUP BY oracle: replay-idempotence and compaction are
    * thereby oracle-checked, not just spec-asserted.
    */
  def incrAggState(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val keys = Seq("l_returnflag", "l_linestatus")
    val stateDir = StageOnce.tmp("ivm_state", dir)
    StageOnce(stateDir) {
      (0 until 3).foreach { i =>
        IncrementalAgg.appendPartial(
          li.filter(col("l_orderkey") % 3 === i), keys, "l_quantity",
          stateDir, i.toLong)
      }
      // replayed delivery of batch 1 + a compaction pass
      IncrementalAgg.appendPartial(
        li.filter(col("l_orderkey") % 3 === 1), keys, "l_quantity",
        stateDir, 1L)
      IncrementalAgg.compactState(spark, stateDir, keys, intoBatchId = 100L)
    }
    IncrementalAgg.readState(spark, stateDir, keys)
      .select(col("l_returnflag"), col("l_linestatus"), col("n"),
        col("sum_").cast(DoubleType).as("sum_qty"),
        col("min_").as("min_qty"), col("max_").as("max_qty"))
  }

  val incrAggStateSql: String = incrAggSql

  /** Zone-map-pruned date-range scan: lineitem is laid out
    * range-clustered on l_shipdate (once per JVM), a per-file min/max
    * stats table is collected (once), and the query opens only the
    * files whose envelope intersects the range — LayoutSpec asserts the
    * file-list shrink; this oracle row asserts the pruned scan loses no
    * rows vs the full-scan filter.
    */
  def zonemapScan(spark: SparkSession, dir: String): DataFrame = {
    val clustered = StageOnce.tmp("zm_lineitem", dir)
    val statsPath = StageOnce.tmp("zm_stats", dir)
    StageOnce(clustered) {
      Layout.writeRangeClustered(
        Tables.load(spark, dir, "lineitem"), clustered, col("l_shipdate"),
        nFiles = 16)
      ZoneMaps.collect(spark, clustered, "l_shipdate")
        .coalesce(1).write.mode("overwrite").parquet(statsPath)
    }
    val stats = spark.read.parquet(statsPath)
    val (lo, hi) = (java.sql.Timestamp.valueOf("1996-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("1996-03-31 23:59:59"))
    ZoneMaps.prunedScan(spark, clustered, stats, "l_shipdate", lo, hi)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_price"))
  }

  val zonemapScanSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <= TIMESTAMP '1996-03-31 23:59:59'
      |GROUP BY l_returnflag""".stripMargin

  /** Z-order + two-dimension zone maps: lineitem laid out on the
    * Morton curve over (l_partkey, l_suppkey), per-file min/max
    * collected for BOTH columns, and a conjunctive range query prunes
    * the file list through both envelopes before any footer I/O.
    * Range-clustering on one column leaves the other full-range in
    * every file (its zone maps prune nothing); the Z-curve gives both
    * columns ~sqrt-factor-tighter envelopes, so two-dimensional
    * predicates skip most files — LayoutSpec pins the file-count
    * shrink, this oracle row pins that pruning loses no rows.
    */
  def zorderScan(spark: SparkSession, dir: String): DataFrame = {
    val clustered = StageOnce.tmp("zo_lineitem", dir)
    val statsPath = StageOnce.tmp("zo_stats", dir)
    StageOnce(clustered) {
      Layout.writeZOrdered(
        Tables.load(spark, dir, "lineitem")
          .select("l_partkey", "l_suppkey", "l_extendedprice", "l_returnflag"),
        clustered, col("l_partkey"), col("l_suppkey"), nFiles = 16)
      ZoneMaps.collectMany(spark, clustered, Seq("l_partkey", "l_suppkey"))
        .coalesce(1).write.mode("overwrite").parquet(statsPath)
    }
    val stats = spark.read.parquet(statsPath)
    // data-derived bounds (~1/8 × 1/4 selectivity at every SF); the
    // oracle derives the same bounds with scalar subqueries
    val m = Tables.load(spark, dir, "lineitem")
      .agg(max(col("l_partkey")), max(col("l_suppkey"))).head
    val (pLo, pHi, sLo, sHi) = (0L, m.getLong(0) / 8, 0L, m.getLong(1) / 4)
    val files = stats
      .filter(col("max_l_partkey") >= pLo && col("min_l_partkey") <= pHi &&
        col("max_l_suppkey") >= sLo && col("min_l_suppkey") <= sHi)
      .select("file_path").collect().map(_.getString(0)).toSeq
    val all = spark.read.parquet(clustered)
    val src = if (files.isEmpty) all.limit(0)
              else spark.read.schema(all.schema).parquet(files: _*)
    src.filter(col("l_partkey").between(pLo, pHi) &&
        col("l_suppkey").between(sLo, sHi))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_price"))
  }

  val zorderScanSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |WHERE l_partkey BETWEEN 0 AND (SELECT max(l_partkey) // 8 FROM lineitem)
      |  AND l_suppkey BETWEEN 0 AND (SELECT max(l_suppkey) // 4 FROM lineitem)
      |GROUP BY l_returnflag""".stripMargin

  // ---------------------------------------------------------- top-k IVM

  private[graft] val topK = 5
  private[graft] val topKBuf = 6

  /** IVM of a TOP-K view under inserts and deletes — the third
    * classically non-self-maintainable aggregate, after MIN/MAX
    * ([[ivmMinMax]]): a delete can promote a row the view never stored.
    * The standard fix (Yi et al., "Efficient Maintenance of
    * Materialized Top-k Views", ICDE 2003) is to store a k′ > k BUFFER
    * and only rescan a group when deletions eat the buffer below k:
    *
    *  - the stored MV is each group's top-k′ rows under the total
    *    order (value DESC, key ASC) — k′ = 6 over k = 5 here, so the
    *    buffer absorbs churn but the rescan path genuinely fires on
    *    this corpus (both regimes live at every SF, spec-pinned);
    *  - removals that MISS the buffer are ignored soundly: a row
    *    outside the top-k′ is strictly after every buffer row in the
    *    total order, so it cannot be in the top-k while ≥ k buffer
    *    rows survive;
    *  - removals that hit the buffer shrink it; inserts merge into the
    *    surviving buffer and the top-k is re-ranked over that
    *    buffer-sized set (one window over ≤ |groups|·k′ + |Δ| rows);
    *  - a group rescans only when its buffer was FULL (k′ rows — a
    *    partial buffer already holds the whole group, so deletes can
    *    never expose unseen rows) AND survivors < k. The rescan leg
    *    joins the mutated base against the BROADCAST touched-group
    *    set: cost ∝ touched groups' rows, never a full re-rank.
    *
    * Change set: [[ivmMinMaxChangeRows]] verbatim (family coherence —
    * one synthetic CDC feed drives all three hard-case faces). Oracle
    * ranks the mutated base from scratch: maintain ≡ recompute,
    * hash-checked. Declared basis-mismatch cell (BASELINE.md) like the
    * other IVM faces: the oracle's from-scratch window wins the tiny
    * SF by construction; the maintain path's cost is ∝ Δ + touched
    * groups at any scale.
    */
  def ivmTopK(spark: SparkSession, dir: String): DataFrame =
    ivmTopKMaintain(ivmTopKBuffer(spark, dir),
      ivmMinMaxChangeRows(spark, dir),
      ivmTopKMutatedBase(spark, dir))

  /** The stored top-k′ buffer MV, staged once per (JVM, dir) — the
    * artifact a production top-k view keeps beside itself.
    */
  private[graft] def ivmTopKBuffer(spark: SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mvPath = StageOnce.tmp("ivm_topk_mv", dir)
    StageOnce(mvPath) {
      val w = Window.partitionBy(col("annee"))
        .orderBy(col("v").desc, col("k").asc)
      Tables.load(spark, dir, "orders")
        .select(year(col("o_orderdate")).cast(LongType).as("annee"),
          col("o_totalprice").as("v"), col("o_orderkey").as("k"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= topKBuf)
        .select(col("annee"), col("v"), col("k"))
        .write.mode("overwrite").parquet(mvPath)
    }
    spark.read.parquet(mvPath)
  }

  /** Which groups must rescan: buffer was FULL (a partial buffer holds
    * the whole group) and deletions left fewer than k survivors.
    * Package-visible so the spec can pin both regimes live on the real
    * corpus.
    */
  private[graft] def ivmTopKNeedRescan(buf: DataFrame,
      ch: DataFrame): DataFrame = {
    // removals that hit the buffer: stream the delta against the
    // BROADCAST buffer (|groups|·k' rows) — never the other way round,
    // so at 100 TB the delta is map-side-filtered and nothing
    // delta-sized is ever broadcast.
    val hits = ch.filter(col("old_v").isNotNull)
      .select(col("annee"), col("k"))
      .join(broadcast(buf.select(col("annee"), col("k"))),
        Seq("annee", "k"), "left_semi")
    val surv = buf.join(broadcast(hits), Seq("annee", "k"), "left_anti")
    buf.groupBy(col("annee")).agg(count(lit(1)).as("n_buf"))
      .join(surv.groupBy(col("annee")).agg(count(lit(1)).as("n_surv")),
        Seq("annee"), "left")
      .filter(col("n_buf") === topKBuf &&
        coalesce(col("n_surv"), lit(0L)) < topK)
      .select(col("annee"))
  }

  /** The maintain merge, factored over its three inputs so the spec
    * can drive hand fixtures through the exact production path:
    * `buf` (annee, v, k) stored top-k′ rows, `ch` (annee, old_v,
    * new_v, k) change rows, `mutatedBase` (annee, v, k) the post-change
    * table state the bounded rescan leg reads.
    */
  private[graft] def ivmTopKMaintain(buf: DataFrame, ch: DataFrame,
      mutatedBase: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hits = ch.filter(col("old_v").isNotNull)
      .select(col("annee"), col("k"))
      .join(broadcast(buf.select(col("annee"), col("k"))),
        Seq("annee", "k"), "left_semi")
    val surv = buf.join(broadcast(hits), Seq("annee", "k"), "left_anti")
    val needRescan = ivmTopKNeedRescan(buf, ch)
    val inserts = ch.filter(col("new_v").isNotNull)
      .select(col("annee"), col("new_v").as("v"), col("k"))
    val w = Window.partitionBy(col("annee"))
      .orderBy(col("v").desc, col("k").asc)
    val mergeLeg = surv.unionByName(inserts)
      .join(broadcast(needRescan), Seq("annee"), "left_anti")
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= topK)
    // the bounded rescan: mutated base restricted to the touched
    // groups (broadcast semi-join), re-ranked for a fresh top-k
    val rescanLeg = mutatedBase
      .join(broadcast(needRescan), Seq("annee"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= topK)
    mergeLeg.unionByName(rescanLeg)
      .select(col("annee"), col("rnk"), col("k").as("o_key"), col("v"))
      .orderBy(col("annee"), col("rnk"))
  }

  /** The post-change table state WITH keys (what the CDC merge leaves
    * behind) — [[ivmMutatedBase]] plus the order key the top-k rows
    * must carry.
    */
  private[graft] def ivmTopKMutatedBase(spark: SparkSession,
      dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "orders").select(
      year(col("o_orderdate")).cast(LongType).as("annee"),
      col("o_orderstatus").as("dep"),
      col("o_totalprice").as("v"),
      col("o_orderkey").as("k"))
    base.filter(col("k") % 10 =!= 3 && col("dep") =!= "P")
      .select(col("annee"),
        when(col("k") % 20 === 4, col("v") + 5000.0)
          .when(col("k") % 10 === 4, col("v") + 1000.0)
          .otherwise(col("v")).as("v"),
        col("k"))
      .unionByName(base.filter(col("k") % 10 === 7)
        .select(col("annee"), col("v"), col("k")))
  }

  val ivmTopKSql: String =
    s"""WITH base AS (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS annee,
       |         o_orderstatus AS dep, o_totalprice AS v, o_orderkey AS k
       |  FROM orders),
       |final AS (
       |  SELECT annee,
       |    CASE WHEN k % 20 = 4 THEN v + 5000.0
       |         WHEN k % 10 = 4 THEN v + 1000.0 ELSE v END AS v, k
       |  FROM base WHERE k % 10 <> 3 AND dep <> 'P'
       |  UNION ALL
       |  SELECT annee, v, k FROM base WHERE k % 10 = 7),
       |ranked AS (
       |  SELECT annee, v, k,
       |    row_number() OVER (PARTITION BY annee ORDER BY v DESC, k ASC)
       |      AS rnk
       |  FROM final)
       |SELECT annee, CAST(rnk AS BIGINT) AS rnk, k AS o_key, v
       |FROM ranked WHERE rnk <= $topK ORDER BY annee, rnk""".stripMargin

  /** Streaming top-k IVM through its oracle face
    * ([[graft.streaming.IvmTopKStream]]): the (old_v, new_v, k) change
    * feed arrives as a real StreamingQuery over a memory source in
    * three micro-batches (sliced by order key, as for the min/max
    * stream) WITH a kill-and-resume after batch 2, each batch folding
    * the k′-buffer generation forward — buffer-hit deletes, re-rank
    * with inserts, the maintained EXHAUSTIVE flag, and the log-aware
    * bounded rescan. Converged ≡ batch ≡ recompute: the oracle is
    * [[ivmTopKSql]] VERBATIM. Staged once per JVM; bench iterations
    * read the materialized generations.
    */
  def ivmTopKStreamMaterialize(spark: SparkSession, dir: String): DataFrame = {
    val basePath = StageOnce.tmp("ivm_topk_base", dir)
    StageOnce(basePath) {
      Tables.load(spark, dir, "orders")
        .select(year(col("o_orderdate")).cast(LongType).as("annee"),
          col("o_totalprice").as("v"), col("o_orderkey").as("k"))
        .write.mode("overwrite").parquet(basePath)
    }
    val root = StageOnce.tmp("ivm_topk_stream", dir)
    StageOnce(root) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val rows = ivmMinMaxChangeRows(spark, dir)
        .collect().map(r => IvmMmChangeRow(r.getLong(0),
          if (r.isNullAt(1)) null else Double.box(r.getDouble(1)),
          if (r.isNullAt(2)) null else Double.box(r.getDouble(2)),
          r.getLong(3)))
      val ckpt = StageOnce.tmp("ivm_topk_stream_ckpt", dir)
      val mem = MemoryStream[IvmMmChangeRow]
      def start() = graft.streaming.IvmTopKStream.start(
        mem.toDS().toDF(), root, basePath, ckpt)
      val q1 = start()
      try {
        mem.addData(rows.filter(_.k % 3 == 0).toIndexedSeq)
        q1.processAllAvailable()
        mem.addData(rows.filter(_.k % 3 == 1).toIndexedSeq)
        q1.processAllAvailable()
      } finally q1.stop()
      val q2 = start() // kill-and-resume from the checkpoint
      try {
        mem.addData(rows.filter(_.k % 3 == 2).toIndexedSeq)
        q2.processAllAvailable()
      } finally q2.stop()
    }
    graft.streaming.IvmTopKStream.view(spark, root)
  }

  // ------------------------------------------------- count-distinct IVM

  /** IVM for COUNT(DISTINCT) — the FOURTH non-self-maintainable
    * aggregate, closing the Gupta/Mumick/Subrahmanian hard-case set
    * (counting ✓, min/max ✓, top-k ✓): a distinct count cannot fold
    * deltas blindly because only the FIRST arrival and the LAST
    * departure of a value move it, so the view keeps the textbook
    * SUPPORT table — per (group, value) multiplicities — beside the
    * per-group distinct counts. Refresh:
    *
    *  - the change feed nets to ±1 rows per (group, customer);
    *  - the support table is probed for the TOUCHED keys only — a
    *    broadcast LEFT-SEMI prune (map-side, no shuffle of the support
    *    table; at 100 TB this is the point lookup a KV-backed MV does
    *    in O(|Δ|)) — and the stored distinct count moves by
    *    |multiplicity 0 → >0| − |multiplicity >0 → 0| per group;
    *  - COUNT(*) rides counting-style on the same rows.
    *
    * The insert wave arrives from NEW customer ids (o_custkey +
    * 10 000 000 — a crawl of first-time buyers), so BOTH flip
    * directions are live: gained (first arrival) and lost (last
    * departure), spec-pinned. Oracle recomputes count + distinct from
    * the mutated base from scratch (maintain ≡ recompute,
    * hash-checked). Declared basis-mismatch cell with the other IVM
    * faces.
    */
  def ivmDistinct(spark: SparkSession, dir: String): DataFrame = {
    val supportPath = StageOnce.tmp("ivm_distinct_support", dir)
    StageOnce(supportPath) {
      ivmDistinctBaseRows(spark, dir)
        .groupBy(col("annee"), col("cust"))
        .agg(count(lit(1)).as("cnt"))
        .write.mode("overwrite").parquet(supportPath)
    }
    val distPath = StageOnce.tmp("ivm_distinct_mv", dir)
    StageOnce(distPath) {
      spark.read.parquet(supportPath).groupBy(col("annee"))
        .agg(count(lit(1)).as("nd"), sum(col("cnt")).as("n"))
        .write.mode("overwrite").parquet(distPath)
    }
    val delta = ivmDistinctChangeRows(spark, dir)
      .groupBy(col("annee"), col("cust"))
      .agg(sum(col("d")).as("d"))
      .filter(col("d") =!= 0L)
    // touched-key lookup: the support table is never shuffled — the
    // broadcast semi-join prunes it map-side to the delta's keys
    val touchedSupport = spark.read.parquet(supportPath)
      .join(broadcast(delta.select(col("annee"), col("cust"))),
        Seq("annee", "cust"), "left_semi")
    val flips = delta
      .join(broadcast(touchedSupport), Seq("annee", "cust"), "left")
      .select(col("annee"), col("d"),
        coalesce(col("cnt"), lit(0L)).as("old_cnt"))
      .withColumn("new_cnt", col("old_cnt") + col("d"))
      .groupBy(col("annee"))
      .agg(sum(when(col("old_cnt") === 0L && col("new_cnt") > 0L, 1L)
          .otherwise(0L)).as("gained"),
        sum(when(col("old_cnt") > 0L && col("new_cnt") <= 0L, 1L)
          .otherwise(0L)).as("lost"),
        sum(col("d")).as("dn"))
    spark.read.parquet(distPath)
      .join(flips, Seq("annee"), "full_outer")
      .select(col("annee"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("nd"), lit(0L)) + coalesce(col("gained"), lit(0L)) -
          coalesce(col("lost"), lit(0L))).as("n_distinct_cust"))
      .filter(col("n_rows") > 0L)
      .orderBy(col("annee"))
  }

  /** (annee, cust) base rows shared by the support build and the
    * oracle's semantics.
    */
  private def ivmDistinctBaseRows(spark: SparkSession,
      dir: String): DataFrame =
    Tables.load(spark, dir, "orders").select(
      year(col("o_orderdate")).cast(LongType).as("annee"),
      col("o_custkey").as("cust"))

  /** ±1 support deltas from the family change feed: leavers and the
    * 'P'-status purge net −1 per order; the insert wave (+1) arrives
    * from NEW customer ids so first-arrival flips are live; the
    * %10 == 4 price updates touch no customer and contribute nothing.
    * Package-visible so the spec can pin both flip directions.
    */
  private[graft] def ivmDistinctChangeRows(spark: SparkSession,
      dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "orders").select(
      year(col("o_orderdate")).cast(LongType).as("annee"),
      col("o_orderstatus").as("dep"),
      col("o_custkey").as("cust"),
      col("o_orderkey").as("k"))
    base.filter(col("k") % 10 === 3 || col("dep") === "P")
      .select(col("annee"), col("cust"), lit(-1L).as("d"))
      .unionByName(base.filter(col("k") % 10 === 7)
        .select(col("annee"), (col("cust") + 10000000L).as("cust"),
          lit(1L).as("d")))
  }

  val ivmDistinctSql: String =
    """WITH base AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS annee,
      |         o_orderstatus AS dep, o_custkey AS c, o_orderkey AS k
      |  FROM orders),
      |final AS (
      |  SELECT annee, c FROM base WHERE k % 10 <> 3 AND dep <> 'P'
      |  UNION ALL
      |  SELECT annee, c + 10000000 FROM base WHERE k % 10 = 7)
      |SELECT annee, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(DISTINCT c) AS BIGINT) AS n_distinct_cust
      |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- SCD2

  /** TYPE-2 SLOWLY-CHANGING-DIMENSION history builder — the other face
    * of the CDC feed [[cdcMerge]] applies destructively: instead of
    * latest-wins overwrite, every version is kept as a validity
    * interval (Kimball's SCD type 2, the standard warehouse shape for
    * "what did this row say at time t"). Events are the SAME synthetic
    * feed as [[cdcMergeSql]]'s change batches plus a seq-0 initial
    * load; one key-partitioned window turns the event stream into
    * intervals: valid_to = lead(seq), a delete event closes the last
    * version without opening one, is_current = interval still open.
    *
    * Face output is the CHANGED slice only (keys with at least one
    * post-load event — the unchanged 70% would be census noise);
    * [[Upsert]]'s time travel answers the same question by storing
    * full snapshots, this answers it in one table with one window.
    * Scale: one exchange (hash by key), no joins, state per key
    * bounded by its version count.
    */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = scd2Events(spark, dir)
    val wk = Window.partitionBy(col("k"))
    val w = wk.orderBy(col("seq"))
    ev.withColumn("valid_to", lead(col("seq"), 1).over(w))
      .withColumn("last_seq", max(col("seq")).over(wk))
      .filter(col("op") =!= "D" && col("last_seq") >= 1L)
      .select(col("k").as("o_orderkey"), col("v").as("price"),
        col("seq").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("o_orderkey"), col("valid_from"))
  }

  /** The (k, v, seq, op) CDC event stream shared by the batch history
    * builder and the streaming fold's memory feed: seq-0 initial load
    * plus the family's synthetic I/U/D batches.
    */
  private[graft] def scd2Events(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
    val nullV = lit(null).cast(DoubleType)
    base.select(col("k"), col("v"), lit(0L).as("seq"), lit("I").as("op"))
      .unionByName(base.filter(col("k") % 10 === 3)
        .select(col("k"), nullV.as("v"), lit(1L).as("seq"), lit("D").as("op")))
      .unionByName(base.filter(col("k") % 10 === 4)
        .select(col("k"), (col("v") + 1000.0).as("v"), lit(1L).as("seq"),
          lit("U").as("op")))
      .unionByName(base.filter(col("k") % 20 === 4)
        .select(col("k"), (col("v") + 5000.0).as("v"), lit(2L).as("seq"),
          lit("U").as("op")))
      .unionByName(base.filter(col("k") % 10 === 7)
        .select((col("k") + 10000000L).as("k"), col("v"), lit(1L).as("seq"),
          lit("I").as("op")))
  }

  /** Streaming SCD2 through its oracle face
    * ([[graft.streaming.Scd2Stream]]): the CDC event feed arrives as a
    * real StreamingQuery over a memory source in three seq-ordered
    * micro-batches (the seq-1 wave sliced by key parity, then the
    * seq-2 wave) WITH a kill-and-resume after batch 2; each batch
    * closes touched keys' open versions and opens new ones against the
    * previous history generation — the MERGE-based SCD2 a warehouse
    * runs continuously. Converged ≡ batch ≡ recompute: the oracle is
    * [[scd2HistorySql]] VERBATIM. Staged once per JVM; bench
    * iterations read the materialized generations.
    */
  def scd2StreamMaterialize(spark: SparkSession, dir: String): DataFrame = {
    val hist0 = StageOnce.tmp("scd2_stream_hist0", dir)
    StageOnce(hist0) {
      Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"),
          lit(0L).as("valid_from"), lit(null).cast(LongType).as("valid_to"))
        .write.mode("overwrite").parquet(hist0)
    }
    val root = StageOnce.tmp("scd2_stream", dir)
    StageOnce(root) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val rows = scd2Events(spark, dir).filter(col("seq") >= 1L)
        .collect().map(r => Scd2EventRow(r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getLong(2), r.getString(3)))
      val ckpt = StageOnce.tmp("scd2_stream_ckpt", dir)
      val mem = MemoryStream[Scd2EventRow]
      def start() = graft.streaming.Scd2Stream.start(
        mem.toDS().toDF(), root, hist0, ckpt)
      val q1 = start()
      try {
        mem.addData(rows.filter(e => e.seq == 1L && e.k % 2 == 0).toIndexedSeq)
        q1.processAllAvailable()
        mem.addData(rows.filter(e => e.seq == 1L && e.k % 2 == 1).toIndexedSeq)
        q1.processAllAvailable()
      } finally q1.stop()
      val q2 = start() // kill-and-resume from the checkpoint
      try {
        mem.addData(rows.filter(_.seq == 2L).toIndexedSeq)
        q2.processAllAvailable()
      } finally q2.stop()
    }
    graft.streaming.Scd2Stream.view(spark, root)
  }

  /** The event-union + interval-window core, shared by the history
    * oracle and the as-of oracle (which can't carry its ORDER BY).
    */
  private val scd2CoreSql: String =
    """base AS (SELECT o_orderkey AS k, o_totalprice AS v FROM orders),
      |ev AS (
      |  SELECT k, v, 0 AS seq, 'I' AS op FROM base
      |  UNION ALL
      |  SELECT k, NULL, 1, 'D' FROM base WHERE k % 10 = 3
      |  UNION ALL
      |  SELECT k, v + 1000.0, 1, 'U' FROM base WHERE k % 10 = 4
      |  UNION ALL
      |  SELECT k, v + 5000.0, 2, 'U' FROM base WHERE k % 20 = 4
      |  UNION ALL
      |  SELECT k + 10000000, v, 1, 'I' FROM base WHERE k % 10 = 7),
      |histx AS (
      |  SELECT k, v, seq, op,
      |    lead(seq) OVER (PARTITION BY k ORDER BY seq) AS valid_to,
      |    max(seq) OVER (PARTITION BY k) AS last_seq
      |  FROM ev),
      |hist AS (
      |  SELECT k AS o_orderkey, v AS price,
      |    CAST(seq AS BIGINT) AS valid_from, CAST(valid_to AS BIGINT)
      |      AS valid_to, valid_to IS NULL AS is_current
      |  FROM histx WHERE op <> 'D' AND last_seq >= 1)""".stripMargin

  val scd2HistorySql: String =
    s"""WITH $scd2CoreSql
       |SELECT * FROM hist ORDER BY o_orderkey, valid_from""".stripMargin

  /** AS-OF probe over the SCD2 history — the point-in-time question the
    * interval table exists to answer ("what did the changed slice look
    * like at time t"), for every refresh epoch t ∈ {0, 1, 2}: live-key
    * count and exact-decimal price total of the versions whose interval
    * covers t. One broadcast of the 3-row probe relation against the
    * history (an interval join, cost ∝ |history|); the t = 0 census is
    * the pre-change snapshot, the t = 2 census must agree with the
    * latest-wins CDC merge (cross-pinned in the spec via the history's
    * current rows). Oracle replays the identical interval predicate
    * over the same event-derived history.
    */
  def scd2AsOf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val probes = Seq(0L, 1L, 2L).toDF("t")
    scd2History(spark, dir)
      .join(broadcast(probes),
        col("valid_from") <= col("t") &&
          (col("valid_to").isNull || col("valid_to") > col("t")))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_live"),
        sum(col("price").cast(DecimalType(18, 2)))
          .cast(DecimalType(18, 2)).cast(DoubleType).as("total_price"))
      .orderBy(col("t"))
  }

  val scd2AsOfSql: String =
    s"""WITH $scd2CoreSql,
       |probes(t) AS (VALUES (0), (1), (2))
       |SELECT CAST(t AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS n_live,
       |  CAST(CAST(sum(CAST(price AS DECIMAL(18,2))) AS DECIMAL(18,2))
       |    AS DOUBLE) AS total_price
       |FROM hist JOIN probes
       |  ON valid_from <= t AND (valid_to IS NULL OR valid_to > t)
       |GROUP BY 1 ORDER BY 1""".stripMargin
}
