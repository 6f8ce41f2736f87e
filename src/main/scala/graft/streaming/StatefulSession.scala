package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.collection.mutable.ListBuffer

/** Explicit-state sessionization via flatMapGroupsWithState — the custom
  * state-machine surface (SURVEY.md §2.10 s_stream_session_state's P2
  * variant) next to the declarative `session_window` in StreamOps.
  *
  * Semantics match the batch gap-sessionization (q_evt_session_30min):
  * a session closes when the gap to the next event exceeds `gapMs`, or
  * when the event-time watermark passes last_ts + gap (timeout).
  *
  * Scale notes: state is one small record per (user, open session), in
  * the partitioned state store; EventTimeTimeout + watermark guarantee
  * eviction, so state size is bounded by active users within the gap
  * horizon — the unbounded-stream safety property the reference gets from
  * Redis TTLs.
  */
object StatefulSession {

  case class SessEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  case class SessState(session_start: Long, last_ts: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp, n_events: Long)

  def sessionize(events: Dataset[SessEvent], gapMs: Long = 30L * 60 * 1000,
                 watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[SessState]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val longEnc = Encoders.scalaLong

    def update(userId: Long, it: Iterator[SessEvent],
               state: GroupState[SessState]): Iterator[SessionOut] = {
      val out = ListBuffer[SessionOut]()
      def close(s: SessState): Unit =
        out += SessionOut(userId, new java.sql.Timestamp(s.session_start),
          new java.sql.Timestamp(s.last_ts), s.n)
      if (state.hasTimedOut) {
        state.getOption.foreach(close)
        state.remove()
      } else {
        val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var st = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          st match {
            case Some(s) if t - s.last_ts > gapMs =>
              close(s); st = Some(SessState(t, t, 1))
            case Some(s) if s.session_start - t > gapMs =>
              // far out-of-order (within watermark, but > gap before the
              // open session): its own earlier session, emitted directly —
              // state keeps the open session untouched
              out += SessionOut(userId, new java.sql.Timestamp(t),
                new java.sql.Timestamp(t), 1)
            case Some(s) =>
              // in-order extend, or late row within gap of the session —
              // the session window may extend DOWNWARD (batch twin sorts
              // all events, so its session_start is the true minimum)
              st = Some(SessState(math.min(s.session_start, t),
                math.max(s.last_ts, t), s.n + 1))
            case None =>
              st = Some(SessState(t, t, 1))
          }
        }
        st.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last_ts + gapMs)
        }
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
