package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** SKYLINE (Pareto frontier) — the multi-criteria "best tradeoffs"
  * operator (Börzsönyi, Kossmann & Stocker, ICDE 2001): the parts no
  * other part beats on BOTH price (minimize) and size (maximize). The
  * defining semantics are quadratic (no dominator exists — the
  * oracle's NOT EXISTS spelling, and exactly what a naive engine runs);
  * the 2-D skyline collapses to a PREFIX MAXIMUM over the price order
  * (Kung, Luccia & Preparata's sort-based O(n log n) identity, 1975):
  *
  *   p is dominated  ⟺  max{size | price < p.price} ≥ p.size
  *                       OR max{size | price = p.price} > p.size
  *
  * so the distributed plan never compares pairs:
  *
  *  1. collapse the corpus to one row per distinct price
  *     (groupBy price → max size; the one corpus-sized exchange,
  *     map-side combined);
  *  2. prefix-max that relation with a DISTRIBUTED SCAN — range
  *     repartition by price, per-partition max collected to the driver
  *     (#partitions rows, parameter-sized), exclusive prefix over the
  *     partition maxima broadcast back as each partition's carry-in,
  *     and a per-partition window for the within-partition prefix.
  *     No single-partition window anywhere: the global-order prefix is
  *     carry + local run, the classic two-level scan;
  *  3. join the per-price verdicts back and keep rows at their price's
  *     max size that strictly beat everything cheaper.
  *
  * Work is one aggregate + one |distinct-price|-sized scan + one join
  * — the same shape at 100 TB, where the NOT EXISTS spelling is
  * corpus² and unrunnable. Equal (price, size) ties are BOTH kept
  * (neither strictly dominates), which the identity handles without a
  * special case.
  */
object Skyline {

  private val scanPartitions = 32

  /** q_skyline: the (minimize p_retailprice, maximize p_size) Pareto
    * frontier of `part`, as (p_partkey, price, size) rows.
    */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val part = Tables.load(spark, dir, "part")
      .select(col("p_partkey"),
        col("p_retailprice").as("price"),
        col("p_size").cast(LongType).as("size"))
    val perPrice = part.groupBy(col("price")).agg(max(col("size")).as("gmax"))
    val ranged = CacheBin.pin(
      perPrice.repartitionByRange(scanPartitions, col("price"))
        .withColumn("pid", spark_partition_id()))
    // per-partition maxima: #partitions rows — a parameter-sized
    // collect (the documented exception class), never data-sized
    val partMax = ranged.groupBy(col("pid")).agg(max(col("gmax")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = partMax.keys.toSeq.sorted
    val carries = pids.zip(pids.scanLeft(-1L) { (acc, pid) =>
      math.max(acc, partMax(pid))
    }).map { case (pid, carry) => (pid, carry) }
    val carryDf = spark.createDataFrame(carries).toDF("pid", "carry")
    // range partitioner keeps equal prices in one partition, so the
    // within-partition exclusive run + the partition carry IS the
    // global strict-prefix max
    val w = Window.partitionBy(col("pid")).orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val verdicts = ranged
      .join(broadcast(carryDf), Seq("pid"), "left")
      .withColumn("prev_max",
        greatest(coalesce(max(col("gmax")).over(w), lit(-1L)),
          coalesce(col("carry"), lit(-1L))))
      .select(col("price"), col("gmax"), col("prev_max"))
    part.join(verdicts, Seq("price"))
      .filter(col("size") === col("gmax") && col("prev_max") < col("size"))
      .select(col("p_partkey"), col("price"), col("size"))
      .orderBy(col("p_partkey"))
  }

  /** GROUPED skyline — the frontier per brand (the "best tradeoffs
    * within each product line" shape). Grouping makes the identity
    * fully partition-parallel: the prefix max is a window PARTITIONED
    * BY brand (no cross-partition carry needed at all — the two-level
    * scan is only required for the global frontier), so the plan is
    * one (brand, price) aggregate + one brand-keyed window + the
    * join-back. Scale: every exchange is brand-keyed; a skewed brand
    * costs its own per-price relation, never pairs.
    */
  def skylineByBrand(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val part = Tables.load(spark, dir, "part")
      .select(col("p_brand"), col("p_partkey"),
        col("p_retailprice").as("price"),
        col("p_size").cast(LongType).as("size"))
    val perPrice = part.groupBy(col("p_brand"), col("price"))
      .agg(max(col("size")).as("gmax"))
    val w = Window.partitionBy(col("p_brand")).orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val verdicts = perPrice
      .withColumn("prev_max", coalesce(max(col("gmax")).over(w), lit(-1L)))
    part.join(verdicts, Seq("p_brand", "price"))
      .filter(col("size") === col("gmax") && col("prev_max") < col("size"))
      .select(col("p_brand"), col("p_partkey"), col("price"), col("size"))
      .orderBy(col("p_brand"), col("p_partkey"))
  }

  val skylineByBrandSql: String =
    """SELECT p.p_brand, p.p_partkey, p.p_retailprice AS price,
      |  CAST(p.p_size AS BIGINT) AS size
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE q.p_brand = p.p_brand
      |    AND q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      |ORDER BY p.p_brand, p.p_partkey""".stripMargin

  /** The defining quadratic semantics — the oracle runs what "skyline"
    * MEANS, the engine runs the sort-based identity; a divergence
    * anywhere (tie handling, strictness, float compare) hash-fails.
    */
  val skylineSql: String =
    """SELECT p.p_partkey, p.p_retailprice AS price,
      |  CAST(p.p_size AS BIGINT) AS size
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      |ORDER BY p.p_partkey""".stripMargin
}
