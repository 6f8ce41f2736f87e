package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q_evt_funnel: per-user ordered conversion
  * view → click → purchase, maintained incrementally with
  * flatMapGroupsWithState and exact under ANY arrival order within the
  * watermark (the StatefulSession discipline applied to a funnel).
  *
  * Invariants that make bounded state exact:
  *  - first_view is a running MIN — a single long, always exact.
  *  - a click matters iff it could ever satisfy `ts > v`: since v only
  *    decreases, and only to values > watermark, every click with
  *    ts <= min(v, wm) is dead — the buffer holds exactly the clicks in
  *    (min(v, wm), ∞), i.e. the current candidate region plus the
  *    watermark horizon, and shrinks as the watermark advances.
  *  - purchases use the same floor: a purchase must beat some future
  *    click c > min(v, wm), so anything at or below the floor is dead.
  *
  * Emission is Update-mode: each invocation emits the user's CURRENT
  * funnel row (latest row per user = the answer so far); rows only gain
  * stages as events arrive, exactly like re-running the batch query.
  *
  * Scale notes: state per user = 1 long + two horizon-bounded buffers,
  * partitioned by user in the state store; the floor-pruning is what the
  * batch twin's full-table MINs become once an unbounded stream forces
  * forgetting — same role as the reference's TTL'd keys.
  */
object StreamingFunnel {

  case class FEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class FunnelState(v: Long, clicks: Seq[Long], purchases: Seq[Long]) {
    def hasView: Boolean = v != Long.MaxValue
  }
  case class FunnelOut(user_id: Long,
                       first_view: Option[java.sql.Timestamp],
                       first_click: Option[java.sql.Timestamp],
                       first_purchase: Option[java.sql.Timestamp])

  def funnel(events: Dataset[FEvent],
             watermarkDelay: String = "10 minutes"): Dataset[FunnelOut] = {
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelOut]
    implicit val longEnc = Encoders.scalaLong

    def update(userId: Long, it: Iterator[FEvent],
               state: GroupState[FunnelState]): Iterator[FunnelOut] = {
      // local, not an outer-object method: the closure must not capture
      // the (non-serializable) enclosing object
      def tsOf(ms: Long): Option[java.sql.Timestamp] =
        if (ms == Long.MaxValue) None else Some(new java.sql.Timestamp(ms))
      val wm = state.getCurrentWatermarkMs()
      val prev = state.getOption.getOrElse(FunnelState(Long.MaxValue, Nil, Nil))
      var v = prev.v
      var clicks = prev.clicks
      var purchases = prev.purchases
      it.foreach { e =>
        val t = e.ts.getTime
        e.event_type match {
          case "view"     => if (t < v) v = t
          case "click"    => clicks = clicks :+ t
          case "purchase" => purchases = purchases :+ t
          case _          => ()
        }
      }
      // prune everything that can no longer influence any future answer:
      // v only decreases and only to values > wm
      val floor = math.min(v, wm)
      clicks = clicks.filter(_ > floor).distinct.sorted
      purchases = purchases.filter(_ > floor).distinct.sorted
      state.update(FunnelState(v, clicks, purchases))
      // derive the current funnel row from exact state
      val c = if (v == Long.MaxValue) Long.MaxValue
        else clicks.find(_ > v).getOrElse(Long.MaxValue)
      val p = if (c == Long.MaxValue) Long.MaxValue
        else purchases.find(_ > c).getOrElse(Long.MaxValue)
      if (v == Long.MaxValue) Iterator.empty // no view yet → no funnel row
      else Iterator.single(FunnelOut(userId, tsOf(v), tsOf(c), tsOf(p)))
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }
}
