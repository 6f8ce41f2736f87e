package graft

import graft.sources.{MqBroker, QueueIngest}
import org.apache.spark.sql.functions._

/** The network message-queue source (`graft-mq`, r17 — the capability
  * gap the r16 verdict ranked #3): an in-repo TCP broker with a
  * replayable append-only log + a DataSourceV2 batch/micro-batch
  * connector. Contracts proven end-to-end:
  *
  *  - offsets are dense record indices; batch and streaming reads see
  *    identical bytes (replayability);
  *  - the streaming checkpoint is the consumer-group ledger: restart
  *    resumes at the committed offset, never re-emits, never skips —
  *    while logical CONTENT duplicates (producer re-publish) stay
  *    visible downstream, the r14 queue doctrine;
  *  - `maxRowsPerTrigger` bounds every micro-batch (admission control
  *    is integer arithmetic on offsets);
  *  - a fetch past the end of the log fails LOUDLY (log loss must
  *    never become silent row loss);
  *  - broker restart recovers the log, truncating a torn tail by exact
  *    record tiling (the MediaContainers hostile-input rules applied
  *    to the broker's own storage);
  *  - the emitted `value` column feeds the shared ingest chain
  *    ([[QueueIngest.parseDocs]]) unchanged — transports compose.
  */
class MqSourceSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def readBatch(port: Int, topic: String, parts: Int = 4) =
    spark.read.format("graft-mq")
      .option("port", port).option("topic", topic)
      .option("fetchPartitions", parts)
      .load()

  test("batch read: dense offsets, exact values, range fan-out, empty topic") {
    val broker = MqBroker.start(tmp("graft_mq_b"))
    try {
      MqBroker.publishStrings("127.0.0.1", broker.port, "t", (0 until 6).map(i => s"m$i"))
      MqBroker.publishStrings("127.0.0.1", broker.port, "t", (6 until 10).map(i => s"m$i"))
      val df = readBatch(broker.port, "t")
      assert(df.rdd.getNumPartitions == 4, "range splits into fetchPartitions readers")
      val rows = df.orderBy("offset").select("offset", "value").as[(Long, String)].collect()
      assert(rows.map(_._1).toSeq == (0L until 10L), "dense record-index offsets")
      assert(rows.map(_._2).toSeq == (0 until 10).map(i => s"m$i"))
      assert(df.filter(col("ts").isNull).count() == 0)
      assert(readBatch(broker.port, "empty").count() == 0)
    } finally broker.close()
  }

  test("streaming: checkpoint is the consumer ledger across restart; content duplicates stay visible") {
    val broker = MqBroker.start(tmp("graft_mq_s"))
    val base = tmp("graft_mq_s_out")
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    try {
      def run(): Unit = {
        val q = spark.readStream.format("graft-mq")
          .option("port", broker.port).option("topic", "docs")
          .load()
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      MqBroker.publishStrings("127.0.0.1", broker.port, "docs", Seq("a", "b", "c"))
      run()
      assert(spark.read.parquet(out).count() == 3)
      // producer crash-republish: same content arrives again under new offsets
      MqBroker.publishStrings("127.0.0.1", broker.port, "docs", Seq("c", "d"))
      run()
      val got = spark.read.parquet(out).orderBy("offset")
        .select("offset", "value").as[(Long, String)].collect()
      assert(got.map(_._1).toSeq == (0L until 5L),
        "restart resumed at the committed offset: no re-emit, no skip")
      assert(got.map(_._2).toSeq == Seq("a", "b", "c", "c", "d"),
        "at-least-once is real: the re-published 'c' is VISIBLE (content dedup is downstream's job)")
    } finally broker.close()
  }

  test("maxRowsPerTrigger bounds every micro-batch; all rows arrive exactly once") {
    val broker = MqBroker.start(tmp("graft_mq_adm"))
    val ckpt = tmp("graft_mq_adm_ckpt")
    try {
      MqBroker.publishStrings("127.0.0.1", broker.port, "t",
        (0 until 10).map(i => s"m$i"))
      val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = spark.readStream.format("graft-mq")
        .option("port", broker.port).option("topic", "t")
        .option("maxRowsPerTrigger", 3)
        .load()
        .writeStream.option("checkpointLocation", s"$ckpt/c")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          sizes.add(df.count()); ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      import scala.jdk.CollectionConverters._
      val s = sizes.asScala.toSeq.filter(_ > 0)
      assert(s.forall(_ <= 3), s"every batch bounded by maxRowsPerTrigger: $s")
      assert(s.sum == 10, s"all rows exactly once: $s")
      assert(s.length >= 4, s"admission actually split the backlog: $s")
    } finally broker.close()
  }

  test("startingOffsets=latest skips the backlog") {
    val broker = MqBroker.start(tmp("graft_mq_late"))
    val ckpt = tmp("graft_mq_late_ckpt")
    try {
      MqBroker.publishStrings("127.0.0.1", broker.port, "t", Seq("old1", "old2"))
      val q = spark.readStream.format("graft-mq")
        .option("port", broker.port).option("topic", "t")
        .option("startingOffsets", "latest")
        .load()
        .writeStream.format("memory").queryName("mq_latest")
        .option("checkpointLocation", s"$ckpt/c")
        .start()
      try {
        q.processAllAvailable()
        assert(spark.table("mq_latest").count() == 0, "backlog skipped")
        MqBroker.publishStrings("127.0.0.1", broker.port, "t", Seq("new1"))
        q.processAllAvailable()
        val got = spark.table("mq_latest").select("offset", "value")
          .as[(Long, String)].collect()
        assert(got.toSeq == Seq((2L, "new1")), "only post-start records, real offsets")
      } finally q.stop()
    } finally broker.close()
  }

  test("broker restart recovers the log and truncates a torn tail; fetch past end is loud") {
    val dir = tmp("graft_mq_rec")
    val b1 = MqBroker.start(dir)
    val vals = (0 until 6).map(i => s"rec$i")
    MqBroker.publishStrings("127.0.0.1", b1.port, "t", vals)
    b1.close()
    // crash mid-append: a torn record (header claims 100 bytes, 3 present)
    val log = java.nio.file.Paths.get(dir, "t.log")
    val torn = java.nio.ByteBuffer.allocate(15)
      .putInt(100).putLong(999L).put(Array[Byte](1, 2, 3)).array()
    java.nio.file.Files.write(log, torn,
      java.nio.file.StandardOpenOption.APPEND)
    val b2 = MqBroker.start(dir)
    try {
      assert(MqBroker.end("127.0.0.1", b2.port, "t") == 6,
        "torn tail truncated, committed records intact")
      val df = readBatch(b2.port, "t")
      assert(df.orderBy("offset").select("value").as[String].collect().toSeq == vals)
      // a checkpoint pointing past the (lost) end must fail, not go silent
      val it = MqBroker.fetch("127.0.0.1", b2.port, "t", 0L, 7L)
      intercept[java.io.IOException] { while (it.hasNext) it.next() }
    } finally b2.close()
  }

  test("fan-out relay: stream topic A, transform, publish to topic B (the reference's MQ exchange loop)") {
    val broker = MqBroker.start(tmp("graft_mq_relay"))
    val ckpt = tmp("graft_mq_relay_ckpt")
    try {
      MqBroker.publishStrings("127.0.0.1", broker.port, "raw",
        (0 until 20).map(i => s"""{"doc_id": $i, "text": "doc number $i"}"""))
      // relay: consume raw, keep even doc_ids, re-publish enriched
      val in = spark.readStream.format("graft-mq")
        .option("port", broker.port).option("topic", "raw")
        .load()
        .select(from_json(col("value"), graft.sources.QueueIngest.docSchema).as("d"))
        .select(col("d.doc_id").as("doc_id"), col("d.text").as("text"))
        .filter(col("doc_id") % 2 === 0)
      val q = graft.streaming.MqSink.relay(in, "127.0.0.1", broker.port,
        "even", s"$ckpt/c")
      try q.processAllAvailable() finally q.stop()
      val got = spark.read.format("graft-mq")
        .option("port", broker.port).option("topic", "even").load()
        .select(get_json_object(col("value"), "$.doc_id").cast("long").as("doc_id"))
        .as[Long].collect().sorted.toSeq
      assert(got == (0 until 20 by 2).map(_.toLong),
        "relay published exactly the transformed subset (fresh offsets, order by payload not arrival)")
    } finally broker.close()
  }

  test("mq value column feeds the shared document-ingest chain unchanged") {
    val broker = MqBroker.start(tmp("graft_mq_docs"))
    try {
      MqBroker.publishStrings("127.0.0.1", broker.port, "docs", Seq(
        """{"doc_id": 1, "text": "hello queue"}""",
        """{"doc_id": 2, "text": ""}""",
        "torn{json"))
      val parsed = QueueIngest.parseDocs(readBatch(broker.port, "docs").select("value"))
      assert(QueueIngest.validDocs(parsed).select("doc_id").as[Long].collect().toSeq == Seq(1L))
      val rejects = QueueIngest.docRejects(parsed)
        .select("reject_reason").as[String].collect().sorted.toSeq
      assert(rejects == Seq("malformed_json", "missing_text"))
    } finally broker.close()
  }
}
