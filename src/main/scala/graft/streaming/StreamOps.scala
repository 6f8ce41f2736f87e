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

  /** Per-hour mergeable quantile sketches over the value stream
    * (s_stream_quantile): the state store holds one ≤k-bin BHYT
    * histogram per (window, event_type) — micro-batches fold in via the
    * sketch's own merge, so state is O(k) per key no matter how many
    * rows stream through, and the emitted sketch column is the SAME
    * encoding the batch rollup (s_agg_quantile_union) re-aggregates.
    * Below k distinct values the sketch is an exact histogram, which is
    * what makes the batch ≡ stream spec exact rather than approximate.
    */
  def quantileSketchHourly(events: DataFrame, k: Int = 64): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(graft.operators.QuantileSketch
        .sketchAgg(col("value").cast("double"), k).as("sk"))
      .select(Seq(col("window.start").as("hour"), col("event_type")) ++
        graft.operators.QuantileSketch.estimateCols(col("sk"), Seq(0.5, 0.9)): _*)

  /** Exactly-once-style dedup on event_id under at-least-once replay
    * (s_stream_dedup; reference analog: idempotent KV updates).
    */
  def dedupById(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream–static dimension enrichment: every micro-batch joins against
    * the (broadcast-small) static dimension — stateless, no watermark
    * needed, the streaming analog of q_join_broadcast_dim. Left join so
    * unknown keys flow through with NULL attributes (an inner join would
    * silently drop them — a data-loss bug in an enrichment stage); the
    * dim snapshot is fixed per query start, so slowly-changing dims are
    * refreshed by restarting or by a foreachBatch re-read.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

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

  /** Stream-stream INTERVAL join (s_stream_join) — the impression→click
    * attribution shape: a click matches an impression of the same user
    * arriving in (imp_ts, imp_ts + maxDelay]. Both sides carry watermarks
    * and the join condition carries explicit time bounds, which is what
    * lets Spark BOUND the buffered state: each side retains only rows
    * newer than (other side's watermark − maxDelay), so state is
    * O(active horizon), never the full history — the requirement for an
    * unbounded 100 TB/day stream.
    *
    * `joinType` "inner" emits matches as they meet; "leftOuter" also
    * emits impression-with-no-click rows (null click columns) once the
    * click-side watermark proves no match can still arrive — exactly the
    * "unattributed impression" report an ads pipeline needs.
    */
  def attributeClicks(impressions: DataFrame, clicks: DataFrame,
                      maxDelay: String = "30 minutes",
                      delay: String = "10 minutes",
                      joinType: String = "inner"): DataFrame = {
    val imp = impressions
      .select(col("event_id").as("imp_id"), col("user_id"),
        col("ts").as("imp_ts"))
      .withWatermark("imp_ts", delay)
    val clk = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    imp.join(clk,
        col("user_id") === col("c_user") &&
          col("click_ts") > col("imp_ts") &&
          col("click_ts") <= col("imp_ts") + expr(s"INTERVAL $maxDelay"),
        joinType)
      .select(col("user_id"), col("imp_id"), col("imp_ts"),
        col("click_id"), col("click_ts"))
  }
}
