package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Headline aggregate (the TPC-H Q1 shape over the testdata): grouped
  * scan-aggregate — partial (map-side) + final hash aggregation, one
  * shuffle on the 6-group key, whole plan in whole-stage codegen.
  */
object Reference {
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        Analytics.moneySum(col("l_extendedprice")).as("sum_base_price"),
        count(lit(1)).as("count_order"))
}

/** DuckDB oracle for the full DV3F pipeline (q_dv3f_pipeline): the
  * FIXTURES.md §1 payload inlined as VALUES, then the same
  * unpivot → split-on-last-underscore → pivot → sha256-uid chain the
  * Spark side runs via graft.dv3f.Reshape.transform.
  */
object Dv3fOracle {
  private val metrics = Seq("nbtrans", "valeurfonc_sum", "valeurfonc_q25",
    "valeurfonc_median", "valeurfonc_q75", "pxm2_q25", "pxm2_median",
    "pxm2_q75", "sbati_sum", "sbati_median")

  private val wideCols = Seq(
    "nbtrans_cod111", "valeurfonc_sum_cod111", "valeurfonc_q25_cod111",
    "valeurfonc_median_cod111", "valeurfonc_q75_cod111", "pxm2_q25_cod111",
    "pxm2_median_cod111", "pxm2_q75_cod111", "sbati_sum_cod111",
    "sbati_median_cod111", "nbtrans_cod121", "valeurfonc_sum_cod121",
    "valeurfonc_median_cod121", "pxm2_median_cod121")

  private def pivotExpr(m: String): String = {
    val e = s"max(CASE WHEN metric = '$m' THEN valeur END)"
    if (m == "nbtrans") s"CAST($e AS BIGINT) AS $m" else s"$e AS $m"
  }

  private val wideValues: String =
    s"""  SELECT * FROM (VALUES
       |    ('2019','85','Vendée', CAST(7543 AS DOUBLE), 1.23e9, 98000.0,
       |     152000.0, 231000.0, 1450.5, 1980.0, 2610.75, 812345.0, 95.0,
       |     312.0, 4.1e7, CAST(NULL AS DOUBLE), 2100.0),
       |    ('2020','85','Vendée', 8012.0, 1.41e9, NULL, NULL, NULL, NULL,
       |     NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL)
       |  ) AS t(annee, dep, libdep, ${wideCols.mkString(", ")})""".stripMargin

  val pipelineSql: String =
    s"""WITH wide AS (
       |$wideValues
       |), melted AS (
       |  SELECT annee, dep, libdep, metric AS cod_full, valeur
       |  FROM wide UNPIVOT (valeur FOR metric IN (${wideCols.mkString(", ")}))
       |), split AS (
       |  SELECT annee, dep, libdep,
       |    regexp_extract(cod_full, '^(.*)_([^_]*)$$', 1) AS metric,
       |    regexp_replace(regexp_extract(cod_full, '^(.*)_([^_]*)$$', 2), 'cod', '') AS cod,
       |    valeur
       |  FROM melted
       |), piv AS (
       |  SELECT annee, dep, libdep, cod,
       |    ${metrics.map(pivotExpr).mkString(",\n    ")}
       |  FROM split GROUP BY annee, dep, libdep, cod
       |)
       |SELECT sha256(annee || dep || cod) AS uid, annee, dep, libdep, cod,
       |  ${metrics.mkString(", ")}
       |FROM piv""".stripMargin

  /** Oracle for q_dv3f_agg_pushdown: the same wide fixture melted to
    * the source's long rows (JSON serialization drops null metric
    * fields, so the emitted cells are exactly the non-null ones) and
    * aggregated per annee — the numbers the pushed-down partial +
    * Spark's final merge must reproduce.
    */
  val aggPushdownSql: String = {
    val branches = wideCols
      .map(c => s"  SELECT annee, $c AS valeur FROM wide WHERE $c IS NOT NULL")
    s"""WITH wide AS (
       |$wideValues
       |), melted AS (
       |${branches.mkString("\n  UNION ALL\n")}
       |)
       |SELECT 'departement' AS scope, '85' AS code, annee,
       |  CAST(count(*) AS BIGINT) AS n_cells,
       |  CAST(count(valeur) AS BIGINT) AS n_vals,
       |  min(valeur) AS min_v, max(valeur) AS max_v
       |FROM melted GROUP BY annee ORDER BY annee""".stripMargin
  }
}
