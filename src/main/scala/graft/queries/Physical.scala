package graft.queries

import graft.Tables
import graft.ops.{Bucketing, Layout, Skew, StageOnce}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Physical-layout query surface: the skew / layout / bucketing
  * operators exercised through the DRIVER GATE, not only specs. All
  * three are semantics-preserving physical rewrites, so each has an
  * ordinary SQL oracle — the gate proves the rewritten plan computes
  * the same relation while the plan-asserting specs (SkewSpec,
  * LayoutSpec, BucketingSpec) prove the physical shape.
  */
object Physical {

  /** Salted two-phase aggregation over orders (hot-key defense): result
    * must equal the plain GROUP BY — the salt only spreads phase 1.
    */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedAggregate(
      Tables.load(spark, dir, "orders"),
      Seq("o_orderpriority"), saltBuckets = 8,
      partials = scala.collection.immutable.ListMap(
        "n" -> (count(lit(1)), (c: Column) => sum(c)),
        "sales_usd" -> (sum(col("o_totalprice").cast(DecimalType(18, 2))),
          (c: Column) => sum(c).cast(DoubleType))))

  val saltedAggSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales_usd
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** Broadcast-replicated salted join over a Zipf-ish key (documents.
    * lang — the top language holds ~40% of the corpus): the build side
    * (per-language stats) is replicated once per salt, the probe side
    * salts randomly, and the join key becomes (lang, salt) so the hot
    * language spreads over saltBuckets reducers in the shuffle-join
    * regime. Semantics-preserving — the oracle is the plain join;
    * SkewSpec pins the salted physical shape (keys include the salt,
    * build fan-out ×saltBuckets).
    */
  def saltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val langDim = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("lang_docs"))
    Skew.saltedJoin(docs.select(col("doc_id"), col("lang")), langDim,
      "lang", saltBuckets = 8)
      .select(col("doc_id"), col("lang"), col("lang_docs"))
  }

  val saltedJoinSql: String =
    """WITH langs AS (SELECT lang, count(*) AS lang_docs FROM documents GROUP BY lang)
      |SELECT doc_id, d.lang, lang_docs
      |FROM documents d JOIN langs USING (lang)""".stripMargin

  /** Hive-partitioned write → pruned read: orders laid out by
    * o_orderstatus (once per JVM), then scanned with a partition filter
    * — planning-time pruning reads ONLY the matching directory. The
    * oracle filters the unpartitioned original, so layout round-trip
    * AND filter semantics are both checked.
    */
  def partitionPrunedScan(spark: SparkSession, dir: String): DataFrame = {
    val out = StageOnce.tmp("part_orders", dir)
    StageOnce(out) {
      Layout.writePartitioned(Tables.load(spark, dir, "orders"), out, "o_orderstatus")
    }
    spark.read.parquet(out)
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sales_usd"))
  }

  val partitionPrunedScanSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales_usd
      |FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority""".stripMargin

  /** Bucketed co-located join: both sides written bucketBy+sortBy on the
    * join key (once per JVM), joined with ZERO exchanges on the join
    * itself (BucketingSpec asserts the plan). The oracle is the plain
    * join — identical relation, shuffle-free plan.
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    // table names embed the dir hash (like the paths) — a fixed global
    // name would leak one dir's staging into another dir's query in the
    // same JVM; the catalog check also re-stages after a session swap
    val suffix = Integer.toHexString(dir.hashCode)
    val (tOrders, tLineitem) = (s"bj_orders_$suffix", s"bj_lineitem_$suffix")
    if (!spark.catalog.tableExists(tOrders) ||
        !spark.catalog.tableExists(tLineitem)) {
      val wh = StageOnce.tmp("bucket_wh", dir)
      Bucketing.writeBucketed(spark,
        Tables.load(spark, dir, "orders").select("o_orderkey", "o_orderpriority"),
        tOrders, "o_orderkey", 8, s"$wh/$tOrders")
      Bucketing.writeBucketed(spark,
        Tables.load(spark, dir, "lineitem")
          .select("l_orderkey", "l_extendedprice", "l_discount"),
        tLineitem, "l_orderkey", 8, s"$wh/$tLineitem")
    }
    Bucketing.coLocatedJoin(spark, tOrders, tLineitem,
      "o_orderkey", "l_orderkey")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
          .cast(DoubleType).as("revenue"))
  }

  val bucketedJoinSql: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  /** Exact range-partition boundaries over lineitem's price column —
    * percentile_disc semantics via the sharded two-pass cumulative (no
    * global sort; see Layout.rangeBoundaries). The oracle replays the
    * same integer-exact selection with a window cumsum.
    */
  def rangeBounds(spark: SparkSession, dir: String): DataFrame =
    Layout.rangeBoundaries(
      Tables.load(spark, dir, "lineitem"), "l_extendedprice",
      Seq(0.25, 0.5, 0.75, 0.9))

  val rangeBoundsSql: String =
    """WITH probs AS (SELECT CAST(p AS DOUBLE) AS p
      |    FROM (VALUES (0.25), (0.5), (0.75), (0.9)) t(p)),
      |d AS (SELECT l_extendedprice AS v, count(*) AS cnt
      |  FROM lineitem GROUP BY 1),
      |c AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM d),
      |n AS (SELECT count(*) AS n FROM lineitem)
      |SELECT p, min(v) AS boundary FROM probs, c, n
      |WHERE cum >= ceil(p * n) GROUP BY p""".stripMargin
}
