package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Loaders for the driver-provided parquet testdata (see TESTDATA.md).
  * All queries take an `sfDir` so the same code runs at any scale factor.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Schema-by-path cache, playing the catalog's role: a real deployment
    * resolves table schemas from a metastore instead of re-reading
    * parquet footers on every query, and at 100 TB per-query footer
    * inference is both latency and an S3 LIST/HEAD storm. Keyed by the
    * full path; entries live for the JVM (the testdata contract is that
    * a path's schema is immutable — regenerating data makes a new dir).
    * CAVEAT: the cached schema reflects the read CONFIG of the first
    * session that touched the path (e.g. `spark.sql.legacy.parquet
    * .nanosAsLong` shapes the events `ts` type) — a later same-JVM
    * session with different read-affecting conf inherits it. All graft
    * sessions come from EngineSession.builder with identical conf, so
    * the cache key stays just the path; fold the conf in if that ever
    * changes.
    */
  private val schemaCache = new ConcurrentHashMap[String, StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

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
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // regenerated testdata writes naive micros (timestamp[us], no
        // zone) which Spark reads as TIMESTAMP_NTZ. Normalize to the
        // session-UTC TimestampType every query was written against:
        // value-identical under the UTC session (EngineSession pins it),
        // and NTZ notably cannot cast to BIGINT for epoch binning.
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already a (zoned) timestamp
    }
  }

  /** Register every testdata table as a temp view (for spark.sql paths). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
