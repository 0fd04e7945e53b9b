package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connector smoke queries (SURVEY.md §2.1 S6): the reference workspace
  * declares csv- and jdbc-family sources
  * (evidence-workspace/evidence.plugins.yaml:29-41) but never exercises
  * them; these queries exercise the matching Spark built-ins with a
  * genuine write-then-read round trip per format, oracle-checked against
  * the same data's parquet form. The round trip is the point: values
  * must survive the format's own serialization (CSV quoting, JDBC type
  * mapping), not just the happy path of an already-clean file.
  */
object Connectors {

  private def tmp(name: String, dir: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_${name}_${Integer.toHexString(dir.hashCode)}").getAbsolutePath

  /** CSV scan: nation exported to CSV (header, default quoting) and read
    * back through `spark.read.format("csv")` with an explicit schema —
    * streaming-file-source style, no inference job. The aggregate result
    * must match the parquet original, so the format's own serialization
    * is covered, not assumed.
    */
  def csvScan(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(spark, dir, "nation")
    val out = tmp("csv_nation", dir)
    nation.write.mode("overwrite").option("header", "true").csv(out)
    spark.read.format("csv")
      .schema(nation.schema)
      .option("header", "true")
      .load(out)
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_name"),
        max(length(col("n_name"))).as("max_name_len"))
  }

  val csvScanSql: String =
    """SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name,
      |  CAST(max(length(n_name)) AS INT) AS max_name_len
      |FROM nation GROUP BY n_regionkey""".stripMargin

  /** JDBC scan: nation written to an embedded Derby database through
    * `format("jdbc")` and read back the same way (Derby ships with
    * Spark). In-memory DB here; on a cluster the URL points at a real
    * server and nothing else changes. Values cross the JDBC type
    * mapping (BIGINT/CLOB) both ways before the aggregate.
    */
  def jdbcScan(spark: SparkSession, dir: String): DataFrame = {
    // keep Derby from dropping a derby.log into the working directory
    System.setProperty("derby.stream.error.field", "java.lang.System.err")
    val url = s"jdbc:derby:memory:graft_${Integer.toHexString(dir.hashCode)};create=true"
    val nation = Tables.load(spark, dir, "nation")
    nation.write.mode("overwrite").format("jdbc")
      .option("url", url).option("dbtable", "nation").save()
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", "nation").load()
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_name"),
        max(length(col("n_name"))).as("max_name_len"))
  }

  val jdbcScanSql: String = csvScanSql
}
