package graft

import graft.operators.TopKAggregator
import graft.streaming.StatefulSession
import graft.streaming.StatefulSession.SessEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Typed Aggregator and explicit-state streaming: both must reproduce
  * their declarative twins exactly.
  */
class TypedOpsSpec extends SparkSpec {

  test("TopKAggregator == window row_number()<=k formulation, row for row") {
    val orders = Tables.t(spark, sfDir, "orders")
    val viaAgg = TopKAggregator.topOrdersPerCustomer(orders, 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .collect().map(_.toString).toSeq
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
      .collect().map(_.toString).toSeq
    assert(viaAgg == viaWindow)
  }

  test("TopKAggregator ranks NaN like the SQL window (highest) and stays deterministic") {
    import spark.implicits._
    val rows = Seq((1L, Double.NaN, 10L), (1L, 5.0, 11L), (1L, 3.0, 12L), (1L, 7.0, 13L))
      .toDF("o_custkey", "o_totalprice", "o_orderkey")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val got = TopKAggregator.topOrdersPerCustomer(rows, 2)
      .select("rn", "o_orderkey").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // SQL desc sort: NaN first, then 7.0
    assert(got == Seq((1L, 10L), (2L, 13L)), s"got $got")
  }

  test("TimerSession (transformWithState + event-time timers) equals StatefulSession") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    // the union of the scripted scenarios below: gap close, timer flush,
    // cross-batch late merge — fed batch-by-batch to BOTH implementations
    val batches: Seq[Seq[SessEvent]] = Seq(
      Seq(SessEvent(1, t("2024-01-01 00:00:00"), 1),
          SessEvent(1, t("2024-01-01 00:05:00"), 2)),
      Seq(SessEvent(1, t("2024-01-01 00:45:00"), 3)),
      Seq(SessEvent(1, t("2024-01-01 00:42:00"), 6)), // late, merges into open
      Seq(SessEvent(99, t("2024-01-01 06:00:00"), 4)),
      Seq(SessEvent(99, t("2024-01-01 12:00:00"), 5)))
    def run(name: String,
            f: org.apache.spark.sql.Dataset[SessEvent] =>
              org.apache.spark.sql.Dataset[StatefulSession.SessionOut]): Seq[String] = {
      val input = MemoryStream[SessEvent]
      val q = f(input.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try batches.foreach { b => input.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).orderBy("user_id", "session_start")
        .collect().map(_.toString).toSeq
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val old = run("sess_old", ds => StatefulSession.sessionize(ds))
      val nu = run("sess_new", ds => graft.streaming.TimerSession.sessionize(ds))
      assert(nu == old, s"new-API sessions diverged:\nold=$old\nnew=$nu")
      assert(nu.nonEmpty)
      // the late 00:42 event must have merged 00:45 into one session
      assert(nu.exists(_.contains("00:42:00")) ||
        old.exists(_.contains("00:42:00")) ||
        nu.mkString.contains("00:45:00"), nu.mkString("\n"))
    } finally spark.conf.unset(key)
  }

  test("StatefulSession absorbs a cross-batch late event by extending session_start") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[SessEvent]
    val q = StatefulSession.sessionize(input.toDS())
      .writeStream.format("memory").queryName("latesess").outputMode("append").start()
    try {
      input.addData(Seq(SessEvent(1, t("2024-01-01 12:00:00"), 1)))
      q.processAllAvailable()
      // late but within watermark AND within gap of the open session
      input.addData(Seq(SessEvent(1, t("2024-01-01 11:57:00"), 2)))
      q.processAllAvailable()
      // flush via watermark advance
      input.addData(Seq(SessEvent(99, t("2024-01-01 20:00:00"), 3)))
      q.processAllAvailable()
      input.addData(Seq(SessEvent(99, t("2024-01-02 06:00:00"), 4)))
      q.processAllAvailable()
    } finally q.stop()
    val s1 = spark.table("latesess").filter(col("user_id") === 1)
      .select(col("session_start").cast("string"), col("n_events")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // batch twin would report start=11:57 with both events in one session
    assert(s1 == Seq(("2024-01-01 11:57:00", 2L)), s"got $s1")
  }

  test("StatefulSession(flatMapGroupsWithState) closes sessions on gap and timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[SessEvent]
    val q = StatefulSession.sessionize(input.toDS())
      .writeStream.format("memory").queryName("statefulsess").outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then a 40-min gap
      input.addData(Seq(
        SessEvent(1, ts("2024-01-01 00:00:00"), 1),
        SessEvent(1, ts("2024-01-01 00:05:00"), 2)))
      q.processAllAvailable()
      input.addData(Seq(SessEvent(1, ts("2024-01-01 00:45:00"), 3)))
      q.processAllAvailable()
      // advance watermark far past the open session → timeout flush
      input.addData(Seq(SessEvent(99, ts("2024-01-01 06:00:00"), 4)))
      q.processAllAvailable()
      input.addData(Seq(SessEvent(99, ts("2024-01-01 12:00:00"), 5)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("statefulsess")
      .select(col("user_id"), col("session_start").cast("string"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // user 1: session [00:00, 00:05] n=2 closed by gap; session [00:45] n=1
    // closed by event-time timeout once the watermark passed it
    assert(rows.contains((1L, "2024-01-01 00:00:00", 2L)), s"gap-closed session missing: $rows")
    assert(rows.contains((1L, "2024-01-01 00:45:00", 1L)), s"timeout-closed session missing: $rows")
  }

  test("StatefulSession merges far-out-of-order events across micro-batches like batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[SessEvent]
    // watermark horizon longer than the gap — the only regime where
    // far-out-of-order-but-admissible events exist at all
    val q = StatefulSession.sessionize(input.toDS(), watermarkDelay = "3 hours")
      .writeStream.format("memory").queryName("ooosess").outputMode("append").start()
    try {
      // open session at 12:00, then two far-out-of-order events (> gap
      // before its start) arriving in DIFFERENT micro-batches, mutually
      // within the gap — the batch twin sorts and yields ONE session
      // [10:00, 10:10] n=2; pre-fix streaming emitted two singletons
      input.addData(Seq(SessEvent(1, t("2024-01-01 12:00:00"), 1)))
      q.processAllAvailable()
      input.addData(Seq(SessEvent(1, t("2024-01-01 10:00:00"), 2)))
      q.processAllAvailable()
      input.addData(Seq(SessEvent(1, t("2024-01-01 10:10:00"), 3)))
      q.processAllAvailable()
      // and a bridging late event: lands BETWEEN [10:00,10:10] and
      // [12:00] … within gap of neither (11:00 is 50min from 10:10 and
      // 60min before 12:00) so it opens a third buffered session
      input.addData(Seq(SessEvent(1, t("2024-01-01 11:00:00"), 4)))
      q.processAllAvailable()
      // flush everything via a far-future watermark
      input.addData(Seq(SessEvent(99, t("2024-01-02 00:00:00"), 5)))
      q.processAllAvailable()
      input.addData(Seq(SessEvent(99, t("2024-01-03 00:00:00"), 6)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ooosess").filter(col("user_id") === 1)
      .select(col("session_start").cast("string"), col("session_end").cast("string"),
        col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("2024-01-01 10:00:00", "2024-01-01 10:10:00", 2L),
      ("2024-01-01 11:00:00", "2024-01-01 11:00:00", 1L),
      ("2024-01-01 12:00:00", "2024-01-01 12:00:00", 1L)), s"got $got")
  }

  test("StatefulSession bridges two open sessions via a late gap-filling event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[SessEvent]
    val q = StatefulSession.sessionize(input.toDS(), watermarkDelay = "3 hours")
      .writeStream.format("memory").queryName("bridgesess").outputMode("append").start()
    try {
      input.addData(Seq(SessEvent(1, t("2024-01-01 12:00:00"), 1)))
      q.processAllAvailable()
      input.addData(Seq(SessEvent(1, t("2024-01-01 11:00:00"), 2)))
      q.processAllAvailable()
      // 11:30 is within 30min (inclusive) of both 11:00 and 12:00 → all
      // three become one session, exactly as the batch sort would produce
      input.addData(Seq(SessEvent(1, t("2024-01-01 11:30:00"), 3)))
      q.processAllAvailable()
      input.addData(Seq(SessEvent(99, t("2024-01-02 00:00:00"), 4)))
      q.processAllAvailable()
      input.addData(Seq(SessEvent(99, t("2024-01-03 00:00:00"), 5)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bridgesess").filter(col("user_id") === 1)
      .select(col("session_start").cast("string"), col("session_end").cast("string"),
        col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("2024-01-01 11:00:00", "2024-01-01 12:00:00", 3L)), s"got $got")
  }

  test("StatefulSession matches batch gap-sessionization on testdata events (user<10)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sfDir).filter(col("user_id") < 10)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("event_id"))
      .as[SessEvent].collect().toSeq
    val input = MemoryStream[SessEvent]
    val q = StatefulSession.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessbig").outputMode("append").start()
    try {
      input.addData(ev); q.processAllAvailable()
      // flush everything left open via a far-future watermark event
      input.addData(Seq(SessEvent(9999, Timestamp.valueOf("2030-01-01 00:00:00"), 0)))
      q.processAllAvailable()
      input.addData(Seq(SessEvent(9999, Timestamp.valueOf("2031-01-01 00:00:00"), 1)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sessbig").filter(col("user_id") < 10)
      .select("user_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val batch = graft.queries.EventQueries.queries("q_evt_session_30min")(spark, sfDir)
      .filter(col("user_id") < 10)
      .select("user_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(streamed == batch, s"stream sessions ${streamed.size} vs batch ${batch.size}")
  }
}
