package graft.ops

import graft.{SparkSpec, Tables}
import graft.queries.Connectors

/** Connector round-trip specs: values must survive each format's own
  * serialization, and the JDBC read side must be range-partitioned
  * (one connection per partition, not a single-threaded drain).
  */
class ConnectorsSpec extends SparkSpec {

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Number](0).longValue ->
      (r.getAs[Number](1).longValue, r.getString(2))).toMap

  test("csv round trip matches the parquet original") {
    val viaCsv = asMap(Connectors.csvScan(spark, sf))
    val direct = asMap(
      Tables.load(spark, sf, "nation")
        .groupBy("n_regionkey")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.min(
            org.apache.spark.sql.functions.col("n_name")).as("first_name")))
    assert(viaCsv == direct)
  }

  test("orc, json and xml round trips match the csv round trip") {
    val viaCsv = asMap(Connectors.csvScan(spark, sf))
    assert(asMap(Connectors.orcScan(spark, sf)) == viaCsv)
    assert(asMap(Connectors.jsonScan(spark, sf)) == viaCsv)
    assert(asMap(Connectors.xmlScan(spark, sf)) == viaCsv)
  }

  test("csv malformed rows: PERMISSIVE captures, FAILFAST raises, DROPMALFORMED skips") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("csv_bad").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/x.csv"),
      "1,alpha\nnot_a_number,beta\n3,gamma\n")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("_corrupt", StringType)))
    // PERMISSIVE (default): bad row lands with NULL id + raw line captured
    val permissive = spark.read.schema(schema)
      .option("columnNameOfCorruptRecord", "_corrupt").csv(dir)
    val rows = permissive.collect().sortBy(r => Option(r.getString(1)).getOrElse(""))
    assert(rows.length == 3)
    val bad = permissive.filter(org.apache.spark.sql.functions.col("_corrupt").isNotNull)
      .collect()
    assert(bad.length == 1 && bad(0).getString(2).startsWith("not_a_number"))
    // DROPMALFORMED: bad row silently skipped. Two subtleties pinned
    // here: a declared corrupt-record column keeps rows representable
    // (so use the bare schema), and count() prunes every column so the
    // parser never sees the bad field — materialize to apply the mode.
    assert(spark.read.schema(StructType(schema.fields.dropRight(1)))
      .option("mode", "DROPMALFORMED").csv(dir).collect().length == 2)
    // FAILFAST: the batch dies loudly instead of loading garbage
    intercept[org.apache.spark.SparkException] {
      spark.read
        .schema(StructType(schema.fields.dropRight(1)))
        .option("mode", "FAILFAST").csv(dir).collect()
    }
  }

  test("jdbc scan reads through >1 range-bounded partition") {
    val df = Connectors.jdbcScan(spark, sf)
    // the scan under the aggregate: JDBCRelation with numPartitions=4
    val scanPlan = df.queryExecution.executedPlan.toString
    assert(scanPlan.contains("JDBCRelation(nation) [numPartitions=4]"),
      s"jdbc read not range-partitioned:\n$scanPlan")
    // and the partitioned read agrees with the parquet original
    val viaJdbc = asMap(df)
    val direct = asMap(Connectors.csvScan(spark, sf))
    assert(viaJdbc == direct)
  }

  test("second JDBC dialect: pruned+filtered read through an in-process Spark Thrift Server") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.sources.HiveJdbcDialect.register()
    // reserved-word column name: the read below only works if our
    // registered hive2 dialect backtick-quotes identifiers (Spark's
    // default dialect emits "order", which HiveQL rejects)
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "name", "order")
      .createOrReplaceGlobalTempView("hive_dialect_src")
    spark.conf.set("hive.server2.thrift.port", "0") // ephemeral port
    val server = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithSparkSession(spark, false)
    try {
      val port = server.getServices.toArray.collectFirst {
        case s: org.apache.hive.service.cli.thrift.ThriftCLIService =>
          s.getPortNumber
      }.get
      val back = spark.read.format("jdbc")
        .option("url", s"jdbc:hive2://localhost:$port/default")
        .option("driver", "org.apache.hive.jdbc.HiveDriver")
        .option("dbtable", "global_temp.hive_dialect_src")
        .load()
        .filter(col("order") >= 20L) // filter pushdown quotes `order`
        .select(col("id"), col("order")) // column pruning over the wire
      val got = back.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((2L, 20L), (3L, 30L)))
    } finally server.stop()
  }

  test("dbf round trip matches the csv round trip") {
    assert(asMap(Connectors.dbfScan(spark, sf)) ==
      asMap(Connectors.csvScan(spark, sf)))
  }

  test("dbf lookup join: labels through the .dbf register equal the parquet join") {
    import org.apache.spark.sql.functions._
    val viaDbf = Connectors.dbfLookupJoin(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val nation = Tables.load(spark, sf, "nation")
    val direct = Tables.load(spark, sf, "customer")
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n"),
        graft.queries.Analytics.moneySum(col("c_acctbal")).as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(viaDbf == direct)
    // the dim side must broadcast — no shuffle of the fact for the join
    val plan = Connectors.dbfLookupJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
