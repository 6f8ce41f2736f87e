package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** Per-user event-type counters via transformWithState MapState — the
  * third state-variable kind next to VisitCounter's ValueState and
  * TimerSession's ListState, so the whole Spark 4 typed-state surface
  * is exercised. The state layout (user → {event_type → count}) is the
  * profile/feature-store shape: point lookups and single-entry updates
  * per event, no list rewrite — under RocksDB each map entry is its own
  * store key, so updating one counter never rewrites the others
  * (exactly why MapState exists instead of ValueState[Map]).
  *
  * Emits the UPDATED (user_id, event_type, cnt) rows each micro-batch —
  * an update-mode changelog whose latest row per key equals the batch
  * groupBy count (StreamingSpec proves it across splits).
  */
object EventTypeProfile {

  case class TypeCount(user_id: Long, event_type: String, cnt: Long)

  private class Proc extends StatefulProcessor[Long, (Long, String), TypeCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, String)],
                                 timerValues: TimerValues): Iterator[TypeCount] = {
      // fold the batch locally, touch each updated map entry once
      val delta = rows.foldLeft(Map.empty[String, Long]) { case (m, (_, t)) =>
        m.updated(t, m.getOrElse(t, 0L) + 1L)
      }
      delta.toSeq.sortBy(_._1).iterator.map { case (t, d) =>
        val c = (if (counts.containsKey(t)) counts.getValue(t) else 0L) + d
        counts.updateValue(t, c)
        TypeCount(user, t, c)
      }
    }
  }

  /** events (event_id, user_id, event_type, ...) → changelog of updated
    * per-(user, type) counts. Requires the RocksDB state store.
    */
  def profile(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .selectExpr("event_id", "user_id", "event_type")
      .as[(Long, Long, String)]
      .map(r => (r._2, r._3))
      .groupByKey(_._1)
      .transformWithState(new Proc, TimeMode.None(), OutputMode.Update())
      .toDF()
  }
}
