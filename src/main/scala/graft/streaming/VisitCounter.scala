package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Per-user visit numbering via Spark 4's `transformWithState` — the
  * NEW arbitrary-state API (StatefulProcessor + typed state variables)
  * that supersedes (flat)MapGroupsWithState: state is declared as named
  * variables on a handle (here one ValueState[Long] per user), the
  * state store backend is RocksDB, and TTL/timers come for free when a
  * pipeline needs expiry.
  *
  * Semantics: events are numbered 1..n per user in (ts, event_id)
  * order — within a micro-batch rows are sorted before numbering, so
  * given in-order batch arrival (the watermark regime) the assignment
  * equals the batch `row_number` twin exactly (StreamingSpec proves
  * batch ≡ stream under several splits).
  *
  * Scale: state per key is ONE long — the smallest possible footprint
  * for "have I seen this user and how often" (cf. dedup's per-event-id
  * state); RocksDB keeps the working set off-heap and checkpoint
  * increments small.
  */
object VisitCounter {

  /** (event_id, user_id, visit_no) with visit_no dense per user. */
  case class Visit(event_id: Long, user_id: Long, visit_no: Long)

  private class Processor
      extends StatefulProcessor[Long, (Long, Long, Long), Visit] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long](
        "visits", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        user: Long, rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[Visit] = {
      var c = if (count.exists()) count.get() else 0L
      // deterministic within-batch order: (ts_micros, event_id)
      val out = rows.toSeq.sortBy(r => (r._2, r._1)).map { r =>
        c += 1
        Visit(r._1, user, c)
      }
      count.update(c)
      out.iterator
    }
  }

  /** events (event_id, ts, user_id, ...) → per-user visit numbers.
    * Requires the RocksDB state store provider (transformWithState's
    * backend) — set by the caller/test on the session.
    */
  def numberVisits(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .selectExpr("event_id", "unix_micros(cast(ts as timestamp)) AS us", "user_id")
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
      .toDF()
  }
}
