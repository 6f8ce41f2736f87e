package graft.streaming

import graft.operators.RollupNav
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming rollup maintenance: a fact stream keeps the [[RollupNav]]
  * day-grain cube continuously queryable — the "dashboards read the
  * rollup, never the firehose" loop, composed exactly like the other
  * sinks (foreachBatch + an idempotent storage commit).
  *
  * Exactly-once EFFECT from at-least-once delivery: deltas are not
  * content-idempotent (a replayed batch would double-count), so
  * [[RollupNav.maintain]] is handed the trigger's `batchId` and stamps
  * an `_applied_<id>` marker inside each day directory in the same
  * atomic swap that publishes the day's data. A replayed trigger skips
  * already-stamped days and re-derives the rest from their still
  * pre-batch state — per-day exactly-once, proven by RollupNavSpec's
  * replay and partial-apply tests. Older markers become irrelevant the
  * moment the next batch commits (Structured Streaming replays only the
  * in-flight trigger), so the stamp never needs compaction discipline.
  *
  * Scale shape per trigger: one batch-sized aggregate, a directory-
  * pruned read of just the touched days' partials, and one small file
  * per touched day — cost tracks the STREAM rate and the day span of
  * its events, never the cube's history.
  */
object RollupSink {

  /** Start the sink: `facts` streams rows carrying `day` plus the
    * rollup's dims and long measures; `dir` must hold a cube built by
    * [[RollupNav.materialize]] (possibly over zero days).
    */
  def start(facts: DataFrame, dir: String, rollup: RollupNav.Rollup,
            checkpoint: String): StreamingQuery =
    facts.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          RollupNav.maintain(batch.sparkSession, dir, rollup, batch,
            Some(batchId))
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
