package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** s_stream_join — stream-stream interval join (impression→click
  * attribution): matches within the window, exclusion outside it, and
  * leftOuter's watermark-proven null emission for unmatched impressions.
  */
class StreamJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val imps = Seq(
    Ev(10, ts("2024-01-01 00:00:00"), 1, "view", 0.0),
    Ev(11, ts("2024-01-01 00:10:00"), 2, "view", 0.0),
    Ev(12, ts("2024-01-01 00:20:00"), 3, "view", 0.0))

  // user 1: click 5 min after imp (match); user 2: click 40 min after
  // (outside 30-min window); user 3: no click at all
  private val clks = Seq(
    Ev(20, ts("2024-01-01 00:05:00"), 1, "click", 0.0),
    Ev(21, ts("2024-01-01 00:50:00"), 2, "click", 0.0))

  // far-future rows advance BOTH watermarks past every real row so
  // leftOuter can prove "no click is still possible" and emit nulls
  private val impFlush = Ev(98, ts("2024-01-01 09:00:00"), 99, "view", 0.0)
  private val clkFlush = Ev(99, ts("2024-01-01 09:00:00"), 99, "click", 0.0)

  private def run(joinType: String): Seq[(Long, Long, Option[Long])] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val impIn = MemoryStream[Ev]
    val clkIn = MemoryStream[Ev]
    val q = StreamOps.attributeClicks(impIn.toDF(), clkIn.toDF(),
        joinType = joinType)
      .writeStream.format("memory").queryName(s"sj_$joinType")
      .outputMode("append").start()
    try {
      impIn.addData(imps); clkIn.addData(clks)
      q.processAllAvailable()
      impIn.addData(Seq(impFlush)); clkIn.addData(Seq(clkFlush))
      q.processAllAvailable()
      // one more empty-ish cycle: outer-join null emission happens a
      // micro-batch AFTER the watermark advances
      impIn.addData(Seq(impFlush.copy(event_id = 96,
        ts = ts("2024-01-01 11:00:00"))))
      clkIn.addData(Seq(clkFlush.copy(event_id = 97,
        ts = ts("2024-01-01 11:00:00"))))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(s"sj_$joinType")
      .select("user_id", "imp_id", "click_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSeq.sortBy(t => (t._1, t._2))
  }

  test("s_stream_join: inner interval join matches only inside the window") {
    val rows = run("inner").filter(_._1 < 99)
    // user 1 matched; user 2's click was 40 min late; user 3 clickless
    assert(rows == Seq((1L, 10L, Some(20L))))
  }

  test("s_stream_join: leftOuter emits unmatched impressions as nulls once the watermark proves them") {
    val rows = run("leftOuter").filter(_._1 < 99)
    assert(rows.contains((1L, 10L, Some(20L))), s"matched pair missing: $rows")
    // users 2 and 3 must surface as unattributed (null click) — emitted
    // only because the click watermark passed imp_ts + 30 min + delay
    assert(rows.contains((2L, 11L, None)), s"user 2 null row missing: $rows")
    assert(rows.contains((3L, 12L, None)), s"user 3 null row missing: $rows")
    assert(rows.size == 3, s"unexpected extra rows: $rows")
  }
}
