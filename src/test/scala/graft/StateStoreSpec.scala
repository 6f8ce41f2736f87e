package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Production-grade streaming state backend: the same stateful operators
  * must run unchanged on the RocksDB state store (the provider a real
  * cluster uses for large state — off-heap, incremental checkpoints)
  * and produce identical results to the default HDFS-backed provider.
  *
  * Also: stream-stream interval join — purchases enriched with the
  * user's clicks from the preceding hour, watermarked on both sides so
  * join state is evicted.
  */
class StateStoreSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionization on the RocksDB state store matches the default provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Ev(1, ts("2024-01-01 00:05:00"), 1, "view", 1.0),
      Ev(2, ts("2024-01-01 00:15:00"), 1, "view", 1.0),
      Ev(3, ts("2024-01-01 01:30:00"), 1, "view", 1.0),
      Ev(4, ts("2024-01-01 00:10:00"), 2, "click", 1.0))

    def runWith(provider: Option[String], name: String): Seq[String] = {
      provider.foreach(p =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p))
      try {
        val input = MemoryStream[Ev]
        val q = StreamOps.sessionize(input.toDF())
          .writeStream.format("memory").queryName(name).outputMode("complete").start()
        try { input.addData(events); q.processAllAvailable() } finally q.stop()
        spark.table(name).orderBy("user_id", "session_start")
          .collect().map(_.toString).toSeq
      } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }

    val default = runWith(None, "sess_default")
    val rocks = runWith(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"),
      "sess_rocks")
    assert(rocks == default, s"rocksdb=$rocks default=$default")
    assert(rocks.nonEmpty)
  }

  test("state reader: the statestore data source exposes a live aggregation's state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // run a keyed count with a checkpoint, then read the store back with
    // the `statestore` data source — the ops/debug surface for "what is
    // this stateful query actually holding" (per-key inspection, skew
    // hunts, state-size audits) without touching the running query
    val dir = java.nio.file.Files.createTempDirectory("graft_statereader")
    val ckpt = dir.resolve("ckpt").toString
    val input = MemoryStream[Ev]
    val q = input.toDF().groupBy("event_type").count()
      .writeStream.format("memory").queryName("state_src")
      .option("checkpointLocation", ckpt).outputMode("update").start()
    try {
      input.addData(Seq(
        Ev(1, ts("2024-01-01 00:00:00"), 1, "view", 1.0),
        Ev(2, ts("2024-01-01 00:01:00"), 1, "view", 1.0),
        Ev(3, ts("2024-01-01 00:02:00"), 2, "click", 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    val state = spark.read.format("statestore").load(ckpt)
      .select(col("key.event_type").as("event_type"), col("value.count").as("cnt"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(state == Seq(("click", 1L), ("view", 2L)),
      s"state reader saw $state")
  }

  test("stream-stream interval join: purchases pick up clicks from the prior hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val c = clicks.toDF().filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    val p = purchases.toDF().filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id"))
      .withWatermark("p_ts", "2 hours")
    val joined = p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      clicks.addData(Seq(
        Ev(10, ts("2024-01-01 10:30:00"), 1, "click", 0.0),
        Ev(11, ts("2024-01-01 08:00:00"), 1, "click", 0.0), // too old
        Ev(12, ts("2024-01-01 10:45:00"), 2, "click", 0.0))) // other user
      purchases.addData(Seq(Ev(20, ts("2024-01-01 11:00:00"), 1, "purchase", 5.0)))
      q.processAllAvailable()
      // advance both watermarks so the joined row flushes in append mode
      clicks.addData(Seq(Ev(13, ts("2024-01-01 20:00:00"), 9, "click", 0.0)))
      purchases.addData(Seq(Ev(21, ts("2024-01-01 20:00:00"), 9, "purchase", 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ssjoin")
      .select("event_id", "c_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSet
    assert(rows.contains((20L, "2024-01-01 10:30:00.0")),
      s"in-window click must join: $rows")
    assert(!rows.exists(_._2.startsWith("2024-01-01 08:00")), "out-of-window click joined")
    assert(!rows.exists(r => r._1 == 20L && r._2.contains("10:45")), "wrong user joined")
  }
}
