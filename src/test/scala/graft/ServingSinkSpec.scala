package graft

import graft.operators.Fanout
import graft.sources.JsonIngest
import graft.streaming.ServingSink
import java.nio.file.Files

/** End-to-end reference topology: continuously-tailing NDJSON ingestion →
  * validation with a dead-letter channel → keyed incrementally-merged
  * serving views → cheap read path — surviving a stop/restart from the
  * checkpoint AND a full at-least-once replay without double counting.
  */
class ServingSinkSpec extends SparkSpec {

  private def event(id: Long, ts: String, user: Long, typ: String, v: Double): String =
    s"""{"event_id": $id, "ts": "$ts", "user_id": $user, "event_type": "$typ", "value": $v, "props": "{}"}"""

  test("empty/uncommitted store: read path yields typed empty frames, no errors") {
    val store = Files.createTempDirectory("graft_serving_empty").toString
    assert(ServingSink.countsPerUser(spark, store).count() == 0)
    assert(ServingSink.uniquesHourly(spark, store)
      .select("hour", "approx_users").count() == 0)
    assert(ServingSink.uniquesRange(spark, store,
      "2024-01-01 00:00:00", "2024-01-02 00:00:00").count() == 0)
    // topkHourly references hour/cnt columns — must resolve on the empty path
    assert(ServingSink.topkHourly(spark, store).count() == 0)
  }

  test("ingest → keyed serving views: merge across restarts, replay-safe, read path matches batch") {
    val dir = Files.createTempDirectory("graft_serving")
    val in = Files.createDirectory(dir.resolve("in")).toString
    val ckpt = dir.resolve("ckpt").toString
    val store = dir.resolve("store").toString

    def writeBatch(name: String, rows: Seq[String]): Unit = {
      val tmp = Files.createTempFile(dir, "stage", ".ndjson")
      Files.writeString(tmp, rows.mkString("\n"))
      Files.move(tmp, java.nio.file.Paths.get(in, name))
    }

    def drain(): Unit = {
      val q = ServingSink.start(spark, in, store, ckpt)
      q.awaitTermination()
    }

    writeBatch("b1.ndjson", Seq(
      event(1, "2024-01-01T00:10:00", 1, "view", 2.0),
      event(2, "2024-01-01T00:20:00", 2, "view", 3.0),
      event(3, "2024-01-01T01:10:00", 1, "click", 1.0),
      "this is not json"))
    drain()

    // dead-letter channel caught the malformed line with its raw payload
    val rejects1 = spark.read.parquet(s"$store/rejects/v0").collect()
    assert(rejects1.length == 1 && rejects1(0).getString(0) == "this is not json")

    // incremental merge across a checkpoint restart: same keys get summed
    writeBatch("b2.ndjson", Seq(
      event(4, "2024-01-01T00:40:00", 1, "view", 5.0), // merges into (h0, u1)
      event(5, "2024-01-01T01:30:00", 3, "click", 4.0),
      event(6, "2024-01-01T02:05:00", 2, "view", 7.0)))
    drain()

    // third batch: also exercises snapshot GC (after committing v2 the
    // v0 snapshots are older than the reader-held v1 and must be gone)
    writeBatch("b3.ndjson", Seq(
      event(7, "2024-01-01T02:45:00", 4, "view", 1.5)))
    drain()
    assert(!Files.exists(java.nio.file.Paths.get(store, "counts_per_user", "v0")),
      "v0 snapshot must be garbage-collected after v2 commits")
    assert(Files.exists(java.nio.file.Paths.get(store, "counts_per_user", "v1")),
      "the just-superseded snapshot must survive for in-flight readers")

    // read path must equal the batch Fanout views over ALL events
    val allValid = JsonIngest.valid(JsonIngest.readJsonLines(spark, in))
    val batchViews = Fanout.views(allValid)
    val expectCounts = batchViews("counts_per_user")
      .collect().map(r => (r.get(0).toString, r.getLong(1)) ->
        (r.getLong(2), r.getDecimal(3).toPlainString)).toMap
    val gotCounts = ServingSink.countsPerUser(spark, store)
      .collect().map(r => (r.get(0).toString, r.getLong(1)) ->
        (r.getLong(2), r.getDecimal(3).toPlainString)).toMap
    assert(gotCounts == expectCounts, s"counts: got $gotCounts expected $expectCounts")

    // PFCOUNT analog: sketch estimate is exact at this cardinality
    val expectUniq = batchViews("uniques_hourly")
      .collect().map(r => r.get(0).toString -> r.getLong(2)).toMap // exact_users
    val gotUniq = ServingSink.uniquesHourly(spark, store)
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(gotUniq == expectUniq, s"uniques: got $gotUniq expected $expectUniq")

    // ZRANGE analog: top-k from merged state == batch top-k
    val expectTopk = batchViews("topk_hourly")
      .collect().map(r => (r.get(0).toString, r.getLong(1), r.getLong(2))).toSet
    val gotTopk = ServingSink.topkHourly(spark, store)
      .collect().map(r => (r.get(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(gotTopk == expectTopk)

    // PFCOUNT over an arbitrary window: union of per-hour sketches must
    // count user 1 once though they are active in hours 0 AND 1 — hours
    // hold {1,2} and {1,3}, so summing hourly estimates gives 4, the
    // sketch union the true 3
    val ranged = ServingSink.uniquesRange(spark, store,
      "2024-01-01 00:00:00", "2024-01-01 02:00:00").collect()
    assert(ranged.length == 1 && ranged(0).getLong(0) == 3L,
      s"range union must dedup across hours: ${ranged.mkString}")

    // at-least-once replay storm: a FRESH checkpoint redelivers everything
    // as already-committed batch ids — the transactional pointer must skip
    // them all and leave the store byte-identical
    val committedBefore = ServingSink.committedBatch(store)
    val freshCkpt = dir.resolve("ckpt2").toString
    val q = ServingSink.start(spark, in, store, freshCkpt)
    q.awaitTermination()
    assert(ServingSink.committedBatch(store) == committedBefore,
      "replayed batches must not advance the commit pointer")
    val replayed = ServingSink.countsPerUser(spark, store)
      .collect().map(r => (r.get(0).toString, r.getLong(1)) ->
        (r.getLong(2), r.getDecimal(3).toPlainString)).toMap
    assert(replayed == expectCounts, "replay must not change any counter")
  }
}
