package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators (SURVEY.md §2.10; the reference's
  * stream-in → aggregate-view-out loop re-expressed as incremental
  * micro-batch plans).
  *
  * Every op is a DataFrame → DataFrame transform, so the same logic runs
  * over `readStream` sources in production and `MemoryStream` in tests;
  * the ScalaTest suites assert batch ≡ stream against the §2.10 batch
  * twins (EventQueries).
  *
  * Scale notes: state is per-key in the state store (user_id / window /
  * event_id), partitioned by the shuffle — horizontal scale-out is the
  * number of state-store partitions. Watermarks bound state: without one,
  * dedup/session state grows forever on an unbounded stream.
  */
object StreamOps {

  /** Tumbling 1h counts + decimal value sums per event_type
    * (stream twin of q_evt_tumbling_hourly).
    */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("cnt"), col("sum_value"))

  /** Sliding 1h/30min counts (stream twin of q_evt_sliding). */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("event_type"), col("cnt"))

  /** Watermarked tumbling agg: late rows beyond [delay] are dropped
    * (s_stream_watermark_late). Append mode emits only finalized windows.
    */
  def tumblingWithWatermark(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("hour"), col("event_type"), col("cnt"))

  /** Exactly-once-style dedup on event_id under at-least-once replay
    * (s_stream_dedup; reference analog: idempotent KV updates).
    */
  def dedupById(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Gap-based sessionization via session_window
    * (stream twin of q_evt_session_30min).
    *
    * session_window.end is last-event + gap by Spark's definition; the
    * batch twin defines session_end = max(event ts), so emit max(ts) —
    * the windows themselves are identical, only the end label differs.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("session_end"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_end"), col("n_events"))
}
