package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet testdata (see TESTDATA.md).
  * All queries take an `sfDir` so the same code runs at any scale factor.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Events table with `ts` as a proper TimestampType. The driver writes
    * nanosecond parquet timestamps, which Spark only reads via
    * `spark.sql.legacy.parquet.nanosAsLong` (set in our session
    * builders) — convert with integral division, NOT `/` (a double
    * can't hold 2024-epoch nanos; `div` keeps it exact and floors like
    * DuckDB's TIMESTAMP_NS→TIMESTAMP cast).
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw // already a timestamp (e.g. regenerated testdata)
    }
  }

  /** Register every testdata table as a temp view (for spark.sql paths). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
