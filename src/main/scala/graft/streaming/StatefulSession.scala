package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.collection.mutable.ListBuffer

/** Explicit-state sessionization via flatMapGroupsWithState — the custom
  * state-machine surface (SURVEY.md §2.10 s_stream_session_state's P2
  * variant) next to the declarative `session_window` in StreamOps.
  *
  * Semantics match the batch gap-sessionization (q_evt_session_30min)
  * exactly for ANY arrival order within the watermark: state holds every
  * still-open session for the key (not just the newest), so an
  * out-of-order event merges into whichever session it falls within a
  * gap of — or bridges two sessions into one — just as the batch twin's
  * global sort would. A session is emitted only once the event-time
  * watermark passes last_ts + gap, at which point no admissible event
  * (all are > watermark) can extend or bridge it.
  *
  * Scale notes: state is a small record per (user, open session), in the
  * partitioned state store; EventTimeTimeout + watermark guarantee
  * eviction, so state size is bounded by active users × sessions inside
  * the watermark horizon (a horizon of h at gap g holds at most
  * ceil(h/g)+1 open sessions per user) — the unbounded-stream safety
  * property the reference gets from Redis TTLs.
  */
object StatefulSession {

  case class SessEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  case class SessState(session_start: Long, last_ts: Long, n: Long)
  case class OpenSessions(sessions: Seq[SessState])
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp, n_events: Long)

  def sessionize(events: Dataset[SessEvent], gapMs: Long = 30L * 60 * 1000,
                 watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[OpenSessions]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val longEnc = Encoders.scalaLong

    def update(userId: Long, it: Iterator[SessEvent],
               state: GroupState[OpenSessions]): Iterator[SessionOut] = {
      val out = ListBuffer[SessionOut]()
      def close(s: SessState): Unit =
        out += SessionOut(userId, new java.sql.Timestamp(s.session_start),
          new java.sql.Timestamp(s.last_ts), s.n)
      val wm = state.getCurrentWatermarkMs()

      // current open sessions + this batch's events as singleton sessions,
      // then one normalization pass: sort by start and merge neighbors
      // within the gap — identical to the batch twin's sort + gap split,
      // and it makes bridging (late event landing BETWEEN two open
      // sessions) collapse them into one
      val incoming = it.map(e => SessState(e.ts.getTime, e.ts.getTime, 1L)).toSeq
      val all = (state.getOption.map(_.sessions).getOrElse(Seq.empty) ++ incoming)
        .sortBy(s => (s.session_start, s.last_ts))
      val merged = ListBuffer[SessState]()
      all.foreach { s =>
        if (merged.nonEmpty && s.session_start - merged.last.last_ts <= gapMs) {
          val c = merged.remove(merged.length - 1)
          merged += SessState(c.session_start, math.max(c.last_ts, s.last_ts), c.n + s.n)
        } else merged += s
      }

      // a session the watermark has passed (last_ts + gap <= wm) is final:
      // every admissible future event has ts > wm, so it can neither extend
      // nor bridge it — emit now (covers both the data path and timeouts)
      val (expired, live) = merged.partition(_.last_ts + gapMs <= wm)
      expired.foreach(close)
      if (live.isEmpty) { if (state.exists) state.remove() }
      else {
        state.update(OpenSessions(live.toSeq))
        // earliest still-open session drives the next timeout; it is
        // strictly > wm by construction of the partition above
        state.setTimeoutTimestamp(live.map(_.last_ts).min + gapMs)
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
