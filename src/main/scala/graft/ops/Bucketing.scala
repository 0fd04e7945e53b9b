package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketing for co-located joins — the no-shuffle path for repeated
  * fact-to-fact joins at 100 TB (SURVEY.md: "co-locate joins via
  * bucketing"). Both sides written with `bucketBy(n, key).sortBy(key)`
  * hash-place rows of the same key in the same bucket file; a subsequent
  * equi-join on that key needs NO Exchange on either side (and with
  * sortBy, no Sort either) — the dominant cost of a large join is gone
  * for every query that reuses the layout. BucketingSpec asserts the
  * exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table at `path`. */
  def writeBucketed(spark: SparkSession, df: DataFrame, table: String,
      key: String, buckets: Int, path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables on their bucket key. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
