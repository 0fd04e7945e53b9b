package graft.queries

import graft.Tables
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch faces of the streaming operators (unified API: the exact same
  * transform functions run under readStream in EventStreamsSpec) plus
  * JSON-payload extraction over the events table, each with a DuckDB
  * oracle. session_window is cross-checked against an INDEPENDENT
  * lag/cumsum formulation on the oracle side.
  */
object Events {

  def tumbling(spark: SparkSession, dir: String): DataFrame =
    EventStreams.tumblingCounts(Tables.loadEvents(spark, dir))

  def sliding(spark: SparkSession, dir: String): DataFrame =
    EventStreams.slidingCounts(Tables.loadEvents(spark, dir))

  def sessionize(spark: SparkSession, dir: String): DataFrame =
    EventStreams.sessionizeBatch(Tables.loadEvents(spark, dir))

  def sessionWindow(spark: SparkSession, dir: String): DataFrame =
    EventStreams.sessionWindowCounts(Tables.loadEvents(spark, dir))

  /** Semi-structured payload extraction (SURVEY §2.1 S2 analogue at row
    * scope): pull `k` out of the JSON props and aggregate.
    */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
      .filter(col("k") >= 50)
      .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))

  // ----------------------------------------------------------- oracle SQL

  private val sumValue =
    "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value"

  val tumblingSql: String =
    s"""SELECT date_trunc('hour', ts::TIMESTAMP) AS window_start,
       |  date_trunc('hour', ts::TIMESTAMP) + INTERVAL 1 HOUR AS window_end,
       |  event_type, count(*) AS n_events, $sumValue
       |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** Each event belongs to the 4 slide-aligned windows covering it. */
  val slidingSql: String =
    s"""WITH x AS (SELECT event_type, value,
       |    time_bucket(INTERVAL '15 minutes', ts::TIMESTAMP)
       |      - k.k * INTERVAL '15 minutes' AS window_start
       |  FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) k)
       |SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
       |  event_type, count(*) AS n_events, $sumValue
       |FROM x GROUP BY 1, 2, 3""".stripMargin

  private val sessionCte =
    """e AS (SELECT user_id, ts::TIMESTAMP AS ts FROM events),
      |l AS (SELECT user_id, ts,
      |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM e),
      |f AS (SELECT user_id, ts,
      |  CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 2 HOUR
      |       THEN 1 ELSE 0 END AS is_new FROM l),
      |s AS (SELECT user_id, ts, sum(is_new) OVER (PARTITION BY user_id
      |  ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id FROM f)""".stripMargin

  val sessionizeSql: String =
    s"""WITH $sessionCte
       |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       |  count(*) AS n_events
       |FROM s GROUP BY user_id, sess_id""".stripMargin

  /** Independent check of Spark's session_window: same lag/cumsum
    * sessions, end = last event + gap (session_window's end semantics).
    */
  val sessionWindowSql: String =
    s"""WITH $sessionCte
       |SELECT user_id, min(ts) AS session_start,
       |  max(ts) + INTERVAL 2 HOUR AS session_end, count(*) AS n_events
       |FROM s GROUP BY user_id, sess_id""".stripMargin

  val jsonPropsSql: String =
    s"""SELECT event_type,
       |  regexp_extract(props, '"k": (\\d+)', 1)::INT % 10 AS k_mod,
       |  count(*) AS n, $sumValue
       |FROM events WHERE regexp_extract(props, '"k": (\\d+)', 1)::INT >= 50
       |GROUP BY 1, 2""".stripMargin
}
