package graft

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{FEvent, FunnelOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming funnel ≡ batch funnel under out-of-order arrival: late
  * events (within the watermark) that land EARLIER than the current
  * first_view must rewrite the whole downstream chain, exactly as
  * re-running q_evt_funnel's batch logic over all events would.
  */
class FunnelStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def run(batches: Seq[Seq[FEvent]]): Map[Long, FunnelOut] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FEvent]
    val latest = scala.collection.mutable.Map[Long, FunnelOut]()
    val q = StreamingFunnel.funnel(input.toDS(), watermarkDelay = "3 hours")
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[FunnelOut], _: Long) =>
        batch.collect().foreach(r => latest(r.user_id) = r); ()
      }.start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    latest.toMap
  }

  test("late earlier view rewrites click and purchase stages (batch-equivalent)") {
    val batch1 = Seq(
      FEvent(1, ts("2024-01-01 10:00:00"), "view"),
      FEvent(1, ts("2024-01-01 10:30:00"), "click"),
      FEvent(2, ts("2024-01-01 09:00:00"), "click")) // click before any view
    val batch2 = Seq( // out-of-order but inside the 3h watermark
      FEvent(1, ts("2024-01-01 09:00:00"), "view"),
      FEvent(1, ts("2024-01-01 09:30:00"), "click"),
      FEvent(1, ts("2024-01-01 11:00:00"), "purchase"),
      FEvent(2, ts("2024-01-01 09:30:00"), "view"))
    val got = run(Seq(batch1, batch2))

    // user 1: batch answer over ALL events — v=09:00, first click after it
    // is 09:30 (NOT the 10:30 the stream saw first), purchase 11:00
    assert(got(1) == FunnelOut(1, Some(ts("2024-01-01 09:00:00")),
      Some(ts("2024-01-01 09:30:00")), Some(ts("2024-01-01 11:00:00"))), got(1).toString)

    // user 2: view arrives late; the 09:00 click precedes it → no click stage
    assert(got(2) == FunnelOut(2, Some(ts("2024-01-01 09:30:00")), None, None),
      got(2).toString)

    // single-batch delivery of the same events gives the identical answer
    val oneShot = run(Seq(batch1 ++ batch2))
    assert(oneShot == got, "batch-split invariance violated")
  }

  test("funnel emits nothing for users with no view, and stages only fill forward") {
    val got = run(Seq(Seq(
      FEvent(3, ts("2024-01-01 08:00:00"), "click"),
      FEvent(3, ts("2024-01-01 08:30:00"), "purchase"))))
    assert(!got.contains(3), "click/purchase without a view must emit no row")

    val got2 = run(Seq(
      Seq(FEvent(4, ts("2024-01-01 08:00:00"), "view")),
      Seq(FEvent(4, ts("2024-01-01 08:10:00"), "click")),
      Seq(FEvent(4, ts("2024-01-01 08:20:00"), "purchase"))))
    assert(got2(4) == FunnelOut(4, Some(ts("2024-01-01 08:00:00")),
      Some(ts("2024-01-01 08:10:00")), Some(ts("2024-01-01 08:20:00"))))
  }
}
