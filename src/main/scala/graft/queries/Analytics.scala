package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's analytics/query surface (Evidence pages + dbt models —
  * SURVEY.md §2.3, §2.6, §2.8-2.10), mapped onto the driver testdata per
  * FIXTURES.md §4: orders.o_orderdate→order_datetime,
  * o_totalprice→sales, o_orderpriority→category.
  *
  * Float determinism note: every sum over a money column goes through
  * DECIMAL(18,2) (exact arithmetic — identical in Spark and the DuckDB
  * oracle regardless of partition/accumulation order) and is cast back to
  * double at the end. Plain double sums are only used where the addends
  * are small integers stored as doubles (exactly representable).
  */
object Analytics {

  /** Exact money sum: associative-order-independent. */
  def moneySum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Evidence orders_by_month (reference:
    * evidence-workspace/pages/index.md:16-25): date_trunc month, count(*),
    * sum(sales), sum/count ratio, group by 1 order by 1 desc.
    * Covers A1, A2, A3, A5, F1, F8, O1, P6.
    */
  def ordersByMonth(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"))
      .agg(
        count(lit(1)).as("number_of_orders"),
        moneySum(col("o_totalprice")).as("sales_usd"))
      .withColumn("average_order_value",
        col("sales_usd") / col("number_of_orders"))
      .orderBy(col("order_month").desc)

  /** dbt my_second_dbt_model-shaped equality filter (P2) with a stable
    * projection.
    */
  def filterEq(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F" && col("o_orderkey") < 100)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** Evidence range predicate on timestamp (P4, reference: index.md:23)
    * with string→timestamp coercion, aggregated per status.
    */
  def filterRange(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1998-06-01"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sales_usd"))

  /** Evidence parameterized LIKE + date_part + GROUP BY ALL (P5, F2, F9,
    * A6 — reference: index.md:87-97). The LIKE over a numeric date_part
    * result exercises the implicit numeric→string cast (SURVEY.md §7.4.6).
    */
  def salesByCategoryLike(spark: SparkSession, dir: String,
      categoryPattern: String = "%HIGH%", yearPattern: String = "19%"): DataFrame =
    Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority").like(categoryPattern) &&
        expr("date_part('YEAR', o_orderdate)").cast(StringType).like(yearPattern))
      .groupBy(col("o_orderpriority").as("category"))
      .agg(moneySum(col("o_totalprice")).as("sales_usd"))

  /** Evidence distinct-via-group-by (A7, reference: index.md:69-74). */
  def distinctCategories(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("category"))
      .distinct()

  /** Evidence test-page preview (O3, reference: pages/test.md:9-14) —
    * ordered for determinism.
    */
  def limitPreview(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "region").orderBy("r_regionkey").limit(10)

  /** dbt my_first_dbt_model literal UNION ALL source (S5, U1 — reference:
    * dbt_core/models/example/my_first_dbt_model.sql:12-18).
    */
  def unionAllLiterals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Seq(Option(1)).toDF("id").union(Seq(Option.empty[Int]).toDF("id"))
  }

  /** A5/O1 through the SQL layer proper: GROUP BY ordinal + ORDER BY
    * ordinal DESC (reference: evidence-workspace/pages/index.md:24 —
    * `group by 1 ... order by 1 desc`), via spark.sql over a registered
    * view. Spark honors ordinals (groupByOrdinal/orderByOrdinal on by
    * default), matching DuckDB.
    */
  def sqlOrdinal(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT date_trunc('month', o_orderdate) AS order_month,
        |  count(*) AS number_of_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales_usd
        |FROM orders GROUP BY 1 ORDER BY 1 DESC""".stripMargin)
  }

  /** RECURSIVE CTE through the SQL layer (WITH RECURSIVE — Spark 4.x's
    * UnionLoop execution; the iterative-query surface every warehouse
    * SQL dialect ships and the one SQL feature the engine's own
    * iterative operators otherwise hand-roll): a level-synchronous walk
    * of the implicit customer binary tree (parent(k) = k/2 — every key
    * chains to root 0; the `> t.k` guard breaks 0's self-loop), emitting
    * the per-depth node census and exact
    * money rollup. Each iteration is ONE distributed join of the
    * frontier against the base table — the anchor/step shape CC's
    * pointer doubling and the BFS face compose manually; here Catalyst
    * drives the loop. The oracle runs the same WITH RECURSIVE statement
    * (DuckDB shares the surface), money in DECIMAL(18,2).
    *
    * OPTIMIZATION r16: the step join is written child-side as the
    * EQUI-join `c_custkey div 2 = t.k` rather than the textbook
    * `c_custkey IN (t.k*2, t.k*2+1)` the oracle keeps — identical sets
    * for non-negative keys (c div 2 = k ⟺ c ∈ {2k, 2k+1}; custkeys are
    * 0-based, and the `> t.k` root-loop guard is unchanged), but the IN
    * form is a disjunction Catalyst cannot extract join keys from, so
    * EVERY UnionLoop iteration ran a BroadcastNestedLoopJoin of the
    * frontier against the whole base table (~depth × |customer| ×
    * |frontier| comparisons); the div form plans each level as a
    * BroadcastHashJoin. Hash-identical at sf0.001/0.01/0.1; sf0.1
    * quiet A/B: 2.90 s → see OPTIMIZATION_r16.md.
    */
  def sqlRecursive(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "customer").createOrReplaceTempView("customer")
    // OPTIMIZATION r16: the recursive step is pure arithmetic — node
    // c's unique parent is c div 2 (c > parent ⟺ c ≥ 1, and nothing
    // below the root 0 is ever reachable since children must exceed
    // their parent) — so the fixpoint has a closed form: c is in the
    // tree iff its ENTIRE halving chain c div 2, c div 4, …, 0 exists
    // in customer, and depth(c) = bit length of c (exact via bin(),
    // no floating log). That replaces the UnionLoop — 15 sequential
    // join rounds at sf0.1, each with its own stage barrier and
    // broadcast build, levels growing with log(corpus) — with ONE
    // pass: explode each key's ≤ log₂(k) proper ancestors, anti-join
    // the misses, anti-join the survivors (nodes with intact chains),
    // aggregate. Depth-sequential work → two key-sized anti-joins at
    // any scale. Equivalence needs only custkey uniqueness (it is the
    // table's primary key), NOT contiguity — a gapped corpus drops
    // exactly the subtrees under a missing ancestor in both
    // formulations (SqlRecursiveSpec pins this against a literal
    // WITH RECURSIVE replay on a holed corpus). The ORACLE keeps the
    // textbook recursive-CTE formulation — equivalence is proven by
    // the driver's hash gate, not assumed.
    spark.sql(sqlRecursiveEngineSql)
  }

  private[graft] val sqlRecursiveEngineSql: String =
    """WITH nodes AS (
      |  SELECT c_custkey AS k,
      |    CASE WHEN c_custkey = 0 THEN 0
      |         ELSE length(bin(c_custkey)) END AS depth,
      |    c_acctbal
      |  FROM customer WHERE c_custkey >= 0),
      |missing AS (
      |  SELECT DISTINCT a.k
      |  FROM (SELECT k, explode(transform(sequence(1, depth),
      |          i -> shiftright(k, i))) AS p
      |        FROM nodes WHERE k >= 1) a
      |  LEFT ANTI JOIN customer c ON c.c_custkey = a.p),
      |tree AS (
      |  SELECT n.* FROM nodes n LEFT ANTI JOIN missing m ON n.k = m.k)
      |SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_usd
      |FROM tree GROUP BY 1 ORDER BY 1""".stripMargin

  val sqlRecursiveSql: String =
    """WITH RECURSIVE tree AS (
      |  SELECT c_custkey AS k, 0 AS depth, c_acctbal FROM customer
      |  WHERE c_custkey = 0
      |  UNION ALL
      |  SELECT c.c_custkey, t.depth + 1, c.c_acctbal
      |  FROM tree t JOIN customer c
      |    ON c.c_custkey IN (t.k * 2, t.k * 2 + 1)
      |    AND c.c_custkey > t.k)
      |SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_usd
      |FROM tree GROUP BY 1 ORDER BY 1""".stripMargin

  /** SQL-dialect PIVOT clause face (§2.6 T3's syntax sibling): the
    * DataFrame pivot exists as [[graft.dv3f.Reshape.pivotFirst]]; this
    * face exercises Spark's native `PIVOT (agg FOR col IN (...))`
    * clause, which DuckDB shares verbatim (SQL-standard surface, tested
    * on 1.0.0) — so the oracle IS the same statement, not a CASE-WHEN
    * paraphrase. Same pinned-values discipline as pivotFirst: the IN
    * list is the declared domain ('O','F'), never a distinct scan, so
    * the output schema is deterministic at any scale. Sums run in
    * exact DECIMAL(18,2) (order-independent money convention) and cast
    * to DOUBLE once at the end — hash-gate safe.
    *
    * Plan shape: pivot compiles to ONE hash aggregate keyed on
    * l_returnflag with 2 pivot-conditional sum slots — a single
    * exchange of |groups| rows, map-side combined; nothing
    * row-count-proportional crosses the wire at any scale.
    */
  def sqlPivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(sqlPivotSql)
  }

  val sqlPivotSql: String =
    """SELECT l_returnflag, CAST(o AS DOUBLE) AS qty_open,
      |  CAST(f AS DOUBLE) AS qty_filled
      |FROM (SELECT l_returnflag, l_linestatus,
      |    CAST(l_quantity AS DECIMAL(18,2)) AS qd FROM lineitem)
      |PIVOT (sum(qd) FOR l_linestatus IN ('O' AS o, 'F' AS f))
      |ORDER BY l_returnflag""".stripMargin

  /** SQL-dialect UNPIVOT clause face (§2.6 T1's syntax sibling of
    * [[graft.dv3f.Reshape.unpivotWide]]): Spark's native
    * `UNPIVOT (val FOR measure IN (...))`, shared verbatim by DuckDB.
    * The three lineitem measures are cast to exact DECIMAL(18,2)
    * BEFORE the unpivot so the long column has one lossless common
    * type (the clause requires it; the double ceiling would make the
    * sums order-dependent), then the rollup per measure name keeps
    * the result |measures|-sized.
    *
    * Plan shape: unpivot is a narrow generator (3 output rows per
    * input row, no exchange), and the only shuffle is the 3-group
    * aggregate — map-side combined, so the wire carries
    * 3 × |partitions| partial rows regardless of corpus size.
    */
  def sqlUnpivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(sqlUnpivotSql)
  }

  val sqlUnpivotSql: String =
    """SELECT measure, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(val) AS DOUBLE) AS total
      |FROM (SELECT CAST(l_quantity AS DECIMAL(18,2)) AS quantity,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS extendedprice,
      |    CAST(l_discount AS DECIMAL(18,2)) AS discount FROM lineitem)
      |UNPIVOT (val FOR measure IN (quantity, extendedprice, discount))
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Pearson CORRELATION MATRIX per group (quantity / extended price /
    * discount over lineitem, by return flag) — the sufficient-statistics
    * pattern of [[Events.regressionMulti]] applied to the classic BI
    * "which measures move together" question: ONE map-side-combined
    * pass collects the 9 moment sums in EXACT DECIMAL(18,2) arithmetic
    * (order-independent — the money-sum convention; the input columns
    * are all ≤ 2 dp so the cast is lossless), then each r is row-local
    * double math over IDENTICAL expression trees in both engines (the
    * moments are cast to double ONCE each; every subsequent op is one
    * correctly-rounded IEEE step, so round(r, 6) hash-gates). Built-in
    * corr() is deliberately not used: its internal accumulation order
    * is engine-private, which breaks cross-engine hash equality.
    */
  def corrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val d = (c: String) => col(c).cast(DecimalType(18, 2))
    val m = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag").as("flag")).agg(
        count(lit(1)).as("n"),
        sum(d("l_quantity")).cast(DoubleType).as("sq"),
        sum(d("l_extendedprice")).cast(DoubleType).as("sp"),
        sum(d("l_discount")).cast(DoubleType).as("sd"),
        sum(d("l_quantity") * d("l_quantity")).cast(DoubleType).as("sqq"),
        sum(d("l_extendedprice") * d("l_extendedprice")).cast(DoubleType).as("spp"),
        sum(d("l_discount") * d("l_discount")).cast(DoubleType).as("sdd"),
        sum(d("l_quantity") * d("l_extendedprice")).cast(DoubleType).as("sqp"),
        sum(d("l_quantity") * d("l_discount")).cast(DoubleType).as("sqd"),
        sum(d("l_extendedprice") * d("l_discount")).cast(DoubleType).as("spd"))
    def r(sxy: Column, sx: Column, sy: Column, sxx: Column, syy: Column) =
      round((col("n") * sxy - sx * sy) /
        sqrt((col("n") * sxx - sx * sx) * (col("n") * syy - sy * sy)), 6)
    m.select(col("flag"), col("n"),
        r(col("sqp"), col("sq"), col("sp"), col("sqq"), col("spp")).as("r_qty_price"),
        r(col("sqd"), col("sq"), col("sd"), col("sqq"), col("sdd")).as("r_qty_disc"),
        r(col("spd"), col("sp"), col("sd"), col("spp"), col("sdd")).as("r_price_disc"))
      .orderBy(col("flag"))
  }

  val corrMatrixSql: String =
    """WITH m AS (SELECT l_returnflag AS flag, count(*)::BIGINT AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
      |    CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sd,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
      |      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sqq,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spp,
      |    CAST(sum(CAST(l_discount AS DECIMAL(18,2))
      |      * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sdd,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
      |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
      |      * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sqd,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS spd
      |  FROM lineitem GROUP BY 1)
      |SELECT flag, n,
      |  round((n * sqp - sq * sp)
      |    / sqrt((n * sqq - sq * sq) * (n * spp - sp * sp)), 6) AS r_qty_price,
      |  round((n * sqd - sq * sd)
      |    / sqrt((n * sqq - sq * sq) * (n * sdd - sd * sd)), 6) AS r_qty_disc,
      |  round((n * spd - sp * sd)
      |    / sqrt((n * spp - sp * sp) * (n * sdd - sd * sd)), 6) AS r_price_disc
      |FROM m ORDER BY 1""".stripMargin

  /** A6 through the SQL layer proper: GROUP BY ALL (reference:
    * evidence-workspace/pages/index.md:95).
    */
  def sqlGroupByAll(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY ALL""".stripMargin)
  }

  /** The Evidence `${inputs.*}` surface done right (SURVEY §3.3):
    * named-parameter spark.sql — parameters are BOUND, not interpolated,
    * so the dashboard's user inputs can't inject SQL. Covers P5 + O2
    * through the SQL layer.
    */
  def sqlParams(spark: SparkSession, dir: String,
      category: String = "%HIGH%", year: String = "19%"): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_orderpriority AS category,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales_usd
        |FROM orders WHERE o_orderpriority LIKE :category
        |  AND CAST(date_part('YEAR', o_orderdate) AS STRING) LIKE :year
        |GROUP BY ALL ORDER BY sales_usd DESC""".stripMargin,
      Map("category" -> category, "year" -> year))
  }

  /** Broadcast dimension join: nation ⋈ region (SURVEY.md §2.4 — the
    * testdata join surface). region is tiny at ANY scale factor → always
    * broadcast; no shuffle of nation.
    */
  def joinNationRegion(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "nation")
      .join(broadcast(Tables.load(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).cast(LongType).as("n_nations"))

  /** Fact-to-fact join: orders ⋈ lineitem revenue per priority. Both sides
    * scale with sf → shuffle hash/sort-merge join on the key; AQE picks.
    * Only the 3 needed columns are scanned on each side (column pruning).
    */
  def joinOrdersLineitem(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders").select("o_orderkey", "o_orderpriority")
    val l = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
          .as("rev"))
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("rev")).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Window function (extension surface, SURVEY.md §2.7): top-3 orders per
    * priority by price, deterministic tiebreak on key.
    */
  def topOrdersPerPriority(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
  }

  /** Hierarchical aggregation: ROLLUP over (status, priority) with
    * grouping_id to tag subtotal levels (extension past the reference's
    * flat GROUP BYs; Catalyst expands to one Expand + aggregation).
    */
  def rollupCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))

  /** BAG-semantics set operations (INTERSECT ALL / EXCEPT ALL —
    * completing the §2.9 dialect next to the DISTINCT-semantics
    * [[setOps]]): per-month order-priority MULTISETS from the two
    * halves of 1995, intersected and differenced with multiplicity —
    * the dialect face warehouse reconciliation queries lean on
    * ("which rows survived with their counts"). Both engines share
    * the SQL-standard surface, so the oracle is the same statement.
    * Plans compile to one aggregate per side + the all-variant
    * set-op (Catalyst rewrites to a count-carrying join — no row
    * explosion beyond the surviving multiplicity).
    */
  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(setOpsAllSql)
  }

  val setOpsAllSql: String =
    """SELECT o_orderpriority, 'both' AS op FROM (
      |  SELECT o_orderpriority FROM orders
      |  WHERE o_orderdate BETWEEN '1995-01-01' AND '1995-06-30'
      |  INTERSECT ALL
      |  SELECT o_orderpriority FROM orders
      |  WHERE o_orderdate BETWEEN '1995-07-01' AND '1995-12-31') a
      |UNION ALL
      |SELECT o_orderpriority, 'h1_surplus' FROM (
      |  SELECT o_orderpriority FROM orders
      |  WHERE o_orderdate BETWEEN '1995-01-01' AND '1995-06-30'
      |  EXCEPT ALL
      |  SELECT o_orderpriority FROM orders
      |  WHERE o_orderdate BETWEEN '1995-07-01' AND '1995-12-31') b""".stripMargin

  /** Set operations: priorities present in BOTH halves of 1995, and
    * those only in H1 (INTERSECT / EXCEPT — §2.9 had only UNION ALL).
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val h1 = o.filter(col("o_orderdate").between("1995-01-01", "1995-06-30"))
      .select(col("o_orderpriority"))
    val h2 = o.filter(col("o_orderdate").between("1995-07-01", "1995-12-31"))
      .select(col("o_orderpriority"))
    h1.intersect(h2).withColumn("op", lit("both"))
      .unionByName(h1.except(h2).withColumn("op", lit("h1_only")))
  }

  /** Window frames: per-status running order count and 3-month moving
    * average of monthly sales (ROWS BETWEEN frames — §2.7 extension
    * beyond ranking).
    */
  def runningWindows(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderstatus"),
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sales"))
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("month"))
    monthly
      .withColumn("running_n",
        sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("sales_ma3",
        avg(col("sales")).over(w.rowsBetween(-2, 0)))
      .withColumn("sales_ma3", round(col("sales_ma3"), 4))
      .select("o_orderstatus", "month", "n", "running_n", "sales_ma3")
  }

  /** TPC-H Q5-shaped 5-way join: revenue per nation for one region and
    * year, customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region
    * with the Q5 "local supplier" condition (c_nationkey = s_nationkey).
    * The plan to want at 100 TB: date filter pushed into the orders
    * scan, ONE shuffle for the fact-fact orders⋈lineitem join, and the
    * genuinely constant-size dims (region 5 rows, nation 25 rows —
    * fixed regardless of sf) explicitly broadcast. customer and
    * supplier scale linearly with sf (150k·sf / 10k·sf rows), so they
    * carry NO user hint: at bench scale AQE/autoBroadcastJoinThreshold
    * still picks a broadcast, and at 100× it is free to fall back to a
    * shuffle join instead of being forced into a multi-GB broadcast
    * build on every executor.
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1996-01-01"))
      .select("o_orderkey", "o_custkey")
    val lineitem = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
          .as("rev"))
    val supplier = Tables.load(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val nation = Tables.load(spark, dir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    val region = Tables.load(spark, dir, "region")
      .filter(col("r_name") === "ASIA").select("r_regionkey")
    orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier,
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
  }

  /** TPC-H Q3-shaped shipping-priority query: top-10 undelivered orders
    * by revenue for one market segment (o_orderpriority standing in for
    * the fixture-absent ship priority) — two fact joins with BOTH date
    * filters pushed into their scans, exact-decimal revenue, and a
    * TakeOrderedAndProject for the top-k (per-partition k, no global
    * sort materialization). Tie-broken by order key for cross-engine
    * determinism.
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1995-03-15"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val lineitem = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1995-03-15"))
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
          .as("rev"))
    orders
      .join(customer, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val shippingPrioritySql: String =
    """SELECT o_orderkey, o_orderdate, o_orderpriority,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** Semi/anti join surface as an explicit query: customers active in
    * 1995 that churned in 1996 (EXISTS ∧ NOT EXISTS). Both sides reduce
    * to ONE shuffle each on the join key and carry no payload columns.
    */
  def churnedCustomers(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer").select("c_custkey")
    def ordersIn(year: Int) = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(s"$year-01-01") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01"))
      .select(col("o_custkey"))
    customer
      .join(ordersIn(1995), col("c_custkey") === col("o_custkey"), "left_semi")
      .join(ordersIn(1996), col("c_custkey") === col("o_custkey"), "left_anti")
  }

  /** CUBE grouping (all 4 grouping sets of two dims, vs ROLLUP's 3),
    * with grouping_id distinguishing the levels — one Expand + one
    * aggregation, the same single-shuffle shape as rollup.
    */
  def cubeCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        grouping_id().cast(LongType).as("gid"))

  val cubeCountsSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin

  /** Window navigation functions (lag/lead/first_value): per-customer
    * order timeline — days since the previous order, the next order's
    * key, and the first order's key. The ORDER BY carries o_orderkey as
    * a TIEBREAK: two orders on the same date would otherwise make
    * lead/lag nondeterministic across partitionings (and engines).
    * One shuffle on the partition key, one sort within partitions.
    */
  def windowNavigation(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("gap_days",
        datediff(col("o_orderdate").cast("date"),
          lag(col("o_orderdate"), 1).over(w).cast("date")).cast(LongType))
      .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
      .withColumn("first_key", first(col("o_orderkey")).over(w))
      .select("o_custkey", "o_orderkey", "gap_days", "next_key", "first_key")
  }

  val windowNavigationSql: String =
    """SELECT o_custkey, o_orderkey,
      |  (o_orderdate::DATE - (lag(o_orderdate) OVER w)::DATE) AS gap_days,
      |  lead(o_orderkey) OVER w AS next_key,
      |  first_value(o_orderkey) OVER w AS first_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  /** Order-deterministic string aggregation (LISTAGG face): the sorted
    * distinct statuses per priority, concatenated. collect_set is
    * order-nondeterministic under parallelism — array_sort before the
    * join is what makes the result reproducible across partitionings,
    * the same reason the oracle needs ORDER BY inside string_agg.
    */
  def stringAggStatuses(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"),
        count(lit(1)).as("n"))

  val stringAggStatusesSql: String =
    """SELECT o_orderpriority,
      |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
      |    AS statuses,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** Explicit GROUPING SETS (the general form ROLLUP/CUBE specialize):
    * per-status and per-priority marginals plus the grand total, tagged
    * by grouping_id — still ONE Expand + one aggregation, so the cost
    * is sets× the input rows into a single shuffle, not one job per set.
    */
  def groupingSetsCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), grouping_id().cast(LongType).as("gid"))

  val groupingSetsCountsSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin

  /** FULL OUTER join (completes the join-type matrix): high-balance
    * customers against their count of big orders, keeping customers
    * with no qualifying orders AND order-groups whose customer misses
    * the balance cut — both null sides are non-empty by construction.
    * Shuffle join on the key; either side may be null-extended, so no
    * broadcast shortcut exists (Spark correctly refuses to broadcast a
    * full-outer side).
    */
  def fullOuterActivity(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_name"))
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") > 250000)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big_orders"))
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"), col("n_big_orders"))
  }

  val fullOuterActivitySql: String =
    """WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000),
      |o AS (SELECT o_custkey, count(*) AS n_big_orders FROM orders
      |  WHERE o_totalprice > 250000 GROUP BY 1)
      |SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey, c.c_name,
      |  o.n_big_orders
      |FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey""".stripMargin

  /** Correlated scalar subquery (per-row subquery referencing the outer
    * row): per order, its lineitem count. Catalyst DECORRELATES this
    * into an aggregate + left join — the plan a hand-written join would
    * produce, which is exactly why the declarative form is safe at
    * scale. Integer-exact, so the oracle agrees bit-for-bit.
    */
  def sqlCorrelated(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders_v")
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT o_orderkey,
        |  (SELECT count(*) FROM lineitem_v l
        |   WHERE l.l_orderkey = o.o_orderkey) AS n_items
        |FROM orders_v o WHERE o_orderkey < 100""".stripMargin)
  }

  val sqlCorrelatedSql: String =
    """SELECT o_orderkey,
      |  (SELECT count(*) FROM lineitem l
      |   WHERE l.l_orderkey = o.o_orderkey) AS n_items
      |FROM orders o WHERE o_orderkey < 100""".stripMargin

  /** The full ranking-function family beyond row_number, with REAL ties
    * (price bucketed to 10k so rank ≠ dense_rank ≠ row_number):
    * rank/dense_rank/percent_rank/cume_dist over the tie-carrying
    * ordering, ntile over a fully-determinized ordering (unique
    * tie-break key — ntile depends on total row order, so it must never
    * see an ambiguous sort). percent_rank/cume_dist are exact rationals
    * → IEEE-deterministic across engines.
    */
  def rankingFamily(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucket = (floor(col("o_totalprice") / 10000) * 10000).cast(LongType)
    val wTies = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("price_bucket").desc)
    val wTotal = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("price_bucket").desc, col("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"),
        bucket.as("price_bucket"))
      .select(col("o_orderpriority"), col("o_orderkey"), col("price_bucket"),
        rank().over(wTies).as("rk"),
        dense_rank().over(wTies).as("drk"),
        percent_rank().over(wTies).as("pr"),
        cume_dist().over(wTies).as("cd"),
        ntile(4).over(wTotal).as("quartile"))
  }

  val rankingFamilySql: String =
    """SELECT o_orderpriority, o_orderkey,
      |  CAST(floor(o_totalprice / 10000) * 10000 AS BIGINT) AS price_bucket,
      |  CAST(rank() OVER wt AS INT) AS rk,
      |  CAST(dense_rank() OVER wt AS INT) AS drk,
      |  percent_rank() OVER wt AS pr,
      |  cume_dist() OVER wt AS cd,
      |  CAST(ntile(4) OVER wn AS INT) AS quartile
      |FROM orders
      |WINDOW
      |  wt AS (PARTITION BY o_orderpriority
      |    ORDER BY floor(o_totalprice / 10000) * 10000 DESC),
      |  wn AS (PARTITION BY o_orderpriority
      |    ORDER BY floor(o_totalprice / 10000) * 10000 DESC, o_orderkey)""".stripMargin

  /** Equi-width histogram of line-item price (extension surface): a
    * single hash aggregation on the computed bucket — the profile/
    * distribution op. Bucket arithmetic is plain IEEE double ops, so
    * the oracle agrees bit-for-bit.
    */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy((floor(col("l_extendedprice") / 1000) * 1000)
        .cast(LongType).as("bucket_lo"))
      .agg(count(lit(1)).as("n"))

  /** Percentile recompute (extension surface — the reference's quartile
    * columns arrive precomputed; SURVEY.md §2.7): exact interpolated
    * quantiles per group, same definition as DuckDB quantile_cont.
    */
  def quantitiesQuartiles(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("q25"),
        expr("percentile(l_quantity, 0.5)").as("median"),
        expr("percentile(l_quantity, 0.75)").as("q75"))

  /** Lineitem revenue restricted to urgent orders via the bloom-pruned
    * semi join (ops.BloomPrune): the bloom subquery drops non-matching
    * fact rows map-side before the join; the exact semi join removes
    * the ≤1% false positives, so the oracle is a plain EXISTS.
    */
  def bloomSemiRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val urgent = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    graft.ops.BloomPrune
      .semiJoinBloom(li, col("l_orderkey"), urgent, col("o_orderkey"),
        expectedKeys = 100000)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_items"))
  }

  /** LATERAL correlated subquery with per-row LIMIT: for each region,
    * its top-2 nations by customer count. Catalyst decorrelates the
    * lateral into an aggregate + window-rank + join (the same plan the
    * hand-written window formulation produces) — declarative top-k-per-
    * group without collecting anything to the driver.
    */
  def sqlLateral(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "region").createOrReplaceTempView("region_v")
    Tables.load(spark, dir, "nation").createOrReplaceTempView("nation_v")
    Tables.load(spark, dir, "customer").createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT r.r_name, t.n_name, t.n_cust
        |FROM region_v r,
        |LATERAL (
        |  SELECT n.n_name, count(*) AS n_cust
        |  FROM nation_v n JOIN customer_v c ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  GROUP BY n.n_name
        |  ORDER BY n_cust DESC, n.n_name
        |  LIMIT 2) t""".stripMargin)
  }

  val sqlLateralSql: String =
    """SELECT r.r_name, t.n_name, t.n_cust
      |FROM region r,
      |LATERAL (
      |  SELECT n.n_name, count(*) AS n_cust
      |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
      |  WHERE n.n_regionkey = r.r_regionkey
      |  GROUP BY n.n_name
      |  ORDER BY n_cust DESC, n.n_name
      |  LIMIT 2) t""".stripMargin

  /** IGNORE NULLS window navigation: carry the last purchase amount
    * forward across each user's event timeline (the classic
    * last-observation-carried-forward shape — gap-filling sensor/price
    * streams). The carried value is copied, never recomputed, so floats
    * stay bit-identical; o_orderkey-style tiebreak on event_id keeps
    * lead/last deterministic. One shuffle on user_id, one sort.
    */
  def windowIgnoreNulls(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.loadEvents(spark, dir)
      .withColumn("last_purchase",
        last(when(col("event_type") === "purchase", col("value")),
          ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("last_purchase"))
  }

  val windowIgnoreNullsSql: String =
    """SELECT event_id, user_id, event_type,
      |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase
      |FROM events""".stripMargin

  /** Blocked fuzzy matching over part names (ops.FuzzyMatch): pairs of
    * distinct names within 2 edits, blocked on the last name token so
    * the self-join never goes all-pairs. Runs on the distinct-name
    * vocabulary, not the row dimension.
    */
  def fuzzyPartNames(spark: SparkSession, dir: String): DataFrame =
    graft.ops.FuzzyMatch.blockedPairs(
      Tables.load(spark, dir, "part"),
      value = col("p_name"),
      blockKey = element_at(split(col("p_name"), " "), -1),
      maxDist = 2)

  val fuzzyPartNamesSql: String =
    """WITH names AS (SELECT DISTINCT p_name AS value,
      |    list_extract(string_split(p_name, ' '), len(string_split(p_name, ' '))) AS blk
      |  FROM part)
      |SELECT a.value AS value_a, b.value AS value_b,
      |  levenshtein(a.value, b.value) AS dist
      |FROM names a JOIN names b ON a.blk = b.blk AND a.value < b.value
      |WHERE levenshtein(a.value, b.value) <= 2""".stripMargin
}
