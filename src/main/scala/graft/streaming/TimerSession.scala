package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import scala.collection.mutable.ListBuffer

/** Sessionization on Spark 4's transformWithState with EVENT-TIME TIMERS
  * — the new-API twin of StatefulSession (flatMapGroupsWithState):
  * identical semantics, proven equal output in TypedOpsSpec, but the
  * state machine is expressed the way the modern API wants it:
  *
  *   - open sessions live in a named ListState (RocksDB-backed, one
  *     list per user) instead of a monolithic GroupState blob;
  *   - session expiry is a REGISTERED TIMER at (earliest open
  *     last_ts + gap): when the event-time watermark crosses it, Spark
  *     calls handleExpiredTimer for exactly that key — no piggybacking
  *     on the next data batch for the key, which is what GroupState
  *     timeouts amounted to;
  *   - the expiry handler re-derives from state and re-arms, so stale
  *     timers (superseded when a later event extended the session) are
  *     harmless no-ops.
  *
  * Late events within the watermark merge or BRIDGE open sessions
  * exactly as the batch gap-split would — same normalization pass as
  * StatefulSession (sort by start, merge neighbors within gap).
  */
object TimerSession {

  import StatefulSession.{SessEvent, SessState, SessionOut}

  private class Proc(gapMs: Long)
      extends StatefulProcessor[Long, SessEvent, SessionOut] {
    @transient private var open: ListState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getListState[SessState](
        "open", Encoders.product[SessState], TTLConfig.NONE)

    /** Sort by start, merge neighbors within the gap (bridging late
      * events collapse two sessions into one) — StatefulSession's
      * normalization, verbatim semantics.
      */
    private def normalize(all: Seq[SessState]): Seq[SessState] = {
      val merged = ListBuffer[SessState]()
      all.sortBy(s => (s.session_start, s.last_ts)).foreach { s =>
        if (merged.nonEmpty && s.session_start - merged.last.last_ts <= gapMs) {
          val c = merged.remove(merged.length - 1)
          merged += SessState(c.session_start, math.max(c.last_ts, s.last_ts), c.n + s.n)
        } else merged += s
      }
      merged.toSeq
    }

    /** Emit every session the watermark finalized, persist the rest,
      * re-arm ONE timer at the earliest remaining expiry.
      */
    private def settle(user: Long, sessions: Seq[SessState],
                       wm: Long): Iterator[SessionOut] = {
      val (expired, live) = sessions.partition(_.last_ts + gapMs <= wm)
      open.clear()
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (live.nonEmpty) {
        open.put(live.toArray)
        getHandle.registerTimer(live.map(_.last_ts).min + gapMs)
      }
      expired.iterator.map(s =>
        SessionOut(user, new java.sql.Timestamp(s.session_start),
          new java.sql.Timestamp(s.last_ts), s.n))
    }

    override def handleInputRows(user: Long, rows: Iterator[SessEvent],
                                 timerValues: TimerValues): Iterator[SessionOut] = {
      val existing = if (open.exists()) open.get().toSeq else Seq.empty
      val incoming = rows.map(e => SessState(e.ts.getTime, e.ts.getTime, 1L)).toSeq
      settle(user, normalize(existing ++ incoming),
        timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      val existing = if (open.exists()) open.get().toSeq else Seq.empty
      settle(user, existing, timerValues.getCurrentWatermarkInMs())
    }
  }

  /** Same contract as StatefulSession.sessionize; requires the RocksDB
    * state store provider (transformWithState's backend).
    */
  def sessionize(events: Dataset[SessEvent], gapMs: Long = 30L * 60 * 1000,
                 watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val keyEnc = Encoders.scalaLong
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new Proc(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
