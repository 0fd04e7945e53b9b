package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table (SURVEY.md §2.11:
  * the reference is strictly batch — this is the extension surface the
  * `events` fixture reserves).
  *
  * Every windowed transform is written against the UNIFIED
  * batch/streaming DataFrame API: the same function serves the
  * oracle-checked batch queries (graft.queries.Events) and the
  * `readStream` pipelines tested in EventStreamsSpec. `withWatermark` is
  * a no-op in batch, the state-store aggregation in streaming.
  *
  * Scale notes: windowed counts shuffle on (window, key) — partial
  * aggregation applies, state is bounded by watermark eviction; the
  * stateful sessionizer keys state by user_id (the natural partitioning
  * at 100 TB) and stores ONE open session per user, not the events.
  */
object EventStreams {

  /** Schema of the events table — needed by `readStream` (streaming file
    * sources require a user-supplied schema).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming scan of a directory of event parquet files. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Exact money-style sum (order-independent): through DECIMAL(18,2). */
  private def decSum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Tumbling 1h window counts/sums per event_type; 2h watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding 1h window, 15m slide — each event lands in 4 windows. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Native session windows per user (gap-merged); session end = last
    * event + gap, Spark's session_window semantics.
    */
  def sessionWindowCounts(events: DataFrame, gap: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  /** Batch sessionization via lag + running sum — the classic gap-based
    * formulation, used as the independent cross-check for both
    * session_window and the stateful sessionizer. session_end here is the
    * LAST EVENT (no +gap), unlike session_window.
    */
  def sessionizeBatch(events: DataFrame, gap: String = "2 hours"): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new", when(col("prev_ts").isNull ||
        col("ts") > col("prev_ts") + expr(s"INTERVAL $gap"), 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")
  }

  /** Streaming exact dedup — the streaming face of the dedup family:
    * drop repeated event_ids with state bounded by the watermark
    * (dropDuplicatesWithinWatermark evicts keys once they age out, so
    * state never grows with the stream). Batch behavior: plain
    * dropDuplicates on the key.
    */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: each micro-batch joins against the
    * static dimension (broadcast — the dimension is planned once and
    * shipped to executors; no streaming state, no watermark needed).
    * The standard fact-stream × dimension-table pattern; identical in
    * batch.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval self-join: pair each event with the SAME
    * user's events in the following hour (follow-on behavior analysis).
    * Both sides watermarked; the time-bound join condition lets the
    * state store evict rows once the watermark passes the interval, so
    * join state is bounded. Works identically in batch.
    */
  def followOnPairs(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.withWatermark("ts", "2 hours").alias("l")
    val r = right.withWatermark("ts", "2 hours").alias("r")
    l.join(r, expr(
      """l.user_id = r.user_id AND l.event_id != r.event_id AND
        |r.ts > l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR""".stripMargin))
      .select(col("l.user_id").as("user_id"),
        col("l.event_id").as("first_event"),
        col("r.event_id").as("next_event"),
        col("l.event_type").as("first_type"),
        col("r.event_type").as("next_type"))
  }

  // ------------------------------------------------- stateful sessionizer

  final case class Ev(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Custom stateful sessionizer on flatMapGroupsWithState (streaming
    * only — append mode + event-time timeout). State per user is a
    * single OpenSession (O(1), never the buffered events). A session is
    * emitted when a new event arrives past the gap, or when the
    * watermark passes lastMs + gap (timeout).
    *
    * Events inside one micro-batch are sorted per user before merging,
    * so intra-batch disorder is handled; cross-batch disorder is bounded
    * by the watermark, as usual.
    */
  def sessionizeStateful(events: Dataset[Ev], gapMs: Long,
      watermark: String = "2 hours"): Dataset[Session] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[Session]

    def fn(uid: Long, it: Iterator[Ev],
        state: GroupState[OpenSession]): Iterator[Session] = {
      def close(s: OpenSession): Session =
        Session(uid, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)
      if (state.hasTimedOut) {
        val out = state.getOption.map(close).toList
        state.remove()
        out.iterator
      } else {
        val sorted = it.toSeq.sortBy(_.ts.getTime)
        var open = state.getOption
        val closed = List.newBuilder[Session]
        sorted.foreach { e =>
          val t = e.ts.getTime
          open match {
            case Some(s) if t - s.lastMs <= gapMs =>
              // a late-but-within-watermark event may precede the open
              // session's start — widen both ends
              open = Some(s.copy(startMs = math.min(s.startMs, t),
                lastMs = math.max(s.lastMs, t), n = s.n + 1))
            case Some(s) =>
              closed += close(s)
              open = Some(OpenSession(t, t, 1))
            case None =>
              open = Some(OpenSession(t, t, 1))
          }
        }
        open.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastMs + gapMs)
        }
        closed.result().iterator
      }
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
