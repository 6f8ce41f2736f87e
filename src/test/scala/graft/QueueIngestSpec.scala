package graft

import graft.operators.{DedupStore, InvertedIndex}
import graft.sources.QueueIngest
import graft.streaming.{IngestMetrics, IngestPipeline, StreamOps}
import org.apache.spark.sql.functions._

/** The external-queue-shaped source (VERDICT r13 #7): a directory-spool
  * broker with REAL at-least-once semantics — duplicated deliveries,
  * out-of-event-time-order arrival, producer-crash republish — feeding
  * (a) the shared JsonIngest validation chain and (b) the full composed
  * IngestPipeline. The contracts proven here:
  *
  *  - the checkpoint is the ack ledger: a consumed delivery is never
  *    re-read, across restarts included; file-level exactly-once;
  *  - logical redelivery is NOT hidden by the source — duplicates
  *    really arrive, and it is downstream content dedup (dedupById for
  *    events, the DedupStore exact gate for documents) that restores
  *    exactly-once EFFECT — the reference's MQ + idempotent-worker
  *    division of labor;
  *  - malformed/contract-violating messages dead-letter with reasons
  *    instead of poisoning the stream, even when redelivered.
  */
class QueueIngestSpec extends SparkSpec {

  import spark.implicits._

  // ---- events: shared validation chain over a lossy producer ----

  private def ev(id: Long, ts: String, typ: String = "view"): String =
    s"""{"event_id":$id,"ts":"$ts","user_id":${id % 10},"event_type":"$typ","value":1.0,"props":"{}"}"""

  test("queue events: ack ledger survives restart; redelivery and out-of-order arrival flow through; dedupById restores uniqueness") {
    val base = java.nio.file.Files.createTempDirectory("graft_q_events")
    val spool = s"$base/spool"; val out = s"$base/out"
    try {
      val e1 = ev(1, "2024-01-01T00:10:00"); val e2 = ev(2, "2024-01-01T00:20:00")
      val e3 = ev(3, "2024-01-01T00:01:00") // out of event-time order
      val bad = Seq("not json at all", ev(99, "2024-01-01T00:02:00", "teleport"))
      QueueIngest.publish(spool, "d1", Seq(e1, e2))
      QueueIngest.publish(spool, "d2", e3 +: bad)
      QueueIngest.publish(spool, "d2", e3 +: bad) // broker redelivery: same tag, new file

      def run(): Unit = {
        val q = QueueIngest.streamEvents(spark, spool, maxFilesPerTrigger = 1)
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", s"$base/ckpt")
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      run()
      val got1 = spark.read.parquet(out)
      assert(got1.count() == 8, "each delivery file consumed exactly once (2 + 3 + 3)")
      assert(got1.filter(col("delivery") === "d2").count() == 6,
        "both d2 deliveries arrived under the producer's tag")
      // the shared validation chain classifies redelivered garbage identically
      val rejects = got1.filter(col("reject_reason").isNotNull)
        .groupBy("reject_reason").count().as[(String, Long)].collect().toMap
      assert(rejects == Map("malformed_json" -> 2L, "unknown_event_type" -> 2L))
      // at-least-once is REAL: the redelivered valid event arrives twice
      assert(got1.filter(col("event_id") === 3).count() == 2)

      // restart = a resumed consumer: the ledger holds, only new files read
      QueueIngest.publish(spool, "d3", Seq(e1, ev(4, "2024-01-01T00:30:00")))
      run()
      val got2 = spark.read.parquet(out)
      assert(got2.count() == 10, "restart must not re-read acked deliveries")
      assert(got2.filter(col("event_id") === 1).count() == 2,
        "producer republish after the restart duplicates event 1")

      // a second consumer group (own checkpoint) with in-stream content
      // dedup: at-least-once delivery → exactly-once event set
      val deduped = StreamOps.dedupById(
        QueueIngest.streamEvents(spark, spool, maxFilesPerTrigger = 1)
          .transform(graft.sources.JsonIngest.valid)
          .withColumn("ts", col("ts").cast("timestamp")))
      val q2 = deduped.writeStream.format("parquet")
        .option("path", s"$base/out2").option("checkpointLocation", s"$base/ckpt2")
        .start()
      try q2.processAllAvailable() finally q2.stop()
      val ids = spark.read.parquet(s"$base/out2")
        .select("event_id").as[Long].collect().toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L, 4L),
        s"dedupById must collapse redeliveries to one row per event, got $ids")
    } finally Fs.rmTree(base.toString)
  }

  // ---- erasure tickets: queue → EraseSink across the stores ----

  test("queue → EraseSink: GDPR tickets over the spool erase the stores; poison and redelivery are commit-free no-ops") {
    val root = java.nio.file.Files.createTempDirectory("graft_q_erase")
    val spool = s"$root/spool"
    val snapDir = s"$root/snap"; val idxDir = s"$root/idx"
    val dedupDir = s"$root/dedup"
    try {
      val docs = Tables.t(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      operators.MergeInto.mergeFiles(spark, snapDir, docs, Seq("doc_id"), "lang")
      operators.InvertedIndex.write(operators.InvertedIndex.build(
        docs.select("doc_id", "text")), idxDir)
      operators.DedupStore.appendBatch(spark,
        docs.select("doc_id", "text"), dedupDir)
      val dead = docs.select("doc_id").as[Long].collect().sorted.take(2).toSeq

      // one delivery mixing real tickets with queue poison: malformed
      // JSON, a ticket with an uncastable id, an id no store holds
      QueueIngest.publish(spool, "t1",
        dead.map(id => s"""{"doc_id":$id}""") ++ Seq(
          "%%% torn frame %%%",
          """{"doc_id":"not-a-number"}""",
          """{"doc_id":999999999}"""))

      def run(): Unit = {
        val q = graft.streaming.EraseSink.start(
          QueueIngest.streamEraseTickets(spark, spool),
          snapDir, "lang", Some(idxDir), None,
          s"$root/ckpt", dedupDir = Some(dedupDir))
        try q.processAllAvailable() finally q.stop()
      }
      run()
      assert(operators.MergeInto.readSnapshot(spark, snapDir)
        .filter(col("doc_id").isin(dead: _*)).isEmpty)
      assert(operators.InvertedIndex.docLengths(spark, idxDir)
        .filter(col("doc_id").isin(dead: _*)).isEmpty)
      assert(operators.DedupStore.readDocs(spark, dedupDir)
        .filter(col("doc_id").isin(dead: _*)).isEmpty)

      // the producer never saw the ack and republishes the whole
      // delivery; the resumed consumer reads only the new file, and
      // erasure's content-convergence commits nothing anywhere
      val snapV = operators.MergeInto.currentVersion(spark, snapDir)
      val idxV = operators.StoreManifest.currentVersion(spark, idxDir)
      val dedupV = operators.StoreManifest.currentVersion(spark, dedupDir)
      QueueIngest.publish(spool, "t1",
        dead.map(id => s"""{"doc_id":$id}""") :+ "%%% torn frame %%%")
      run()
      assert(operators.MergeInto.currentVersion(spark, snapDir) == snapV &&
        operators.StoreManifest.currentVersion(spark, idxDir) == idxV &&
        operators.StoreManifest.currentVersion(spark, dedupDir) == dedupV,
        "a redelivered erase ticket must replay as a commit-free no-op")
    } finally Fs.rmTree(root.toString)
  }

  // ---- documents: queue → full composed pipeline ----

  private def vec(seed: Long): Seq[Float] =
    (0 until 8).map(i => (((seed * 31 + i * 7) % 13) - 6).toFloat / 6f)

  private def doc(id: Long, text: String): String =
    s"""{"doc_id":$id,"text":"$text","embedding":[${vec(id).mkString(",")}]}"""

  private def indexedDocIds(dir: String): Set[Long] =
    InvertedIndex.docLengths(spark, dir).select("doc_id").as[Long].collect().toSet

  test("queue → composed pipeline: duplicated/malformed/out-of-order deliveries and a producer-crash republish still yield exactly-once stores") {
    val base = java.nio.file.Files.createTempDirectory("graft_q_pipe")
    val spool = s"$base/spool"
    val dedupDir = s"$base/dedup"; val idxDir = s"$base/idx"
    val annDir = s"$base/ann"; val mDir = s"$base/metrics"
    try {
      val d1 = doc(1, "alpha beta gamma"); val d2 = doc(2, "delta epsilon zeta")
      val badLines = Seq(
        "{{{ definitely not json",
        """{"doc_id":9,"text":"","embedding":[0.1]}""", // contract violation
        """{"text":"orphan with no id"}""")
      val del1 = Seq(d1, d2) ++ badLines
      val del2 = Seq(d1, // broker redelivery of doc 1
        doc(3, "delta epsilon zeta"), // same CONTENT under a new id
        doc(4, "eta theta iota"))
      def runPipeline(): Unit = {
        val q = IngestPipeline.start(
          QueueIngest.streamDocs(spark, spool, maxFilesPerTrigger = 1),
          dedupDir, idxDir, s"$base/ckpt", buckets = 8,
          annDir = Some(annDir), annNlist = 2, metricsDir = Some(mDir))
        try q.processAllAvailable() finally q.stop()
      }
      // deliveries land over time (the broker reality): same-content
      // keep-first winners are delivery-order-dependent, so the spec
      // pins the order by consuming each delivery before the next —
      // two files published in the same mtime millisecond would race
      // the file source's (mtime, path) ordering
      QueueIngest.publish(spool, "del1", del1)
      runPipeline()
      QueueIngest.publish(spool, "del2", del2)
      runPipeline()
      assert(DedupStore.readDocs(spark, dedupDir)
        .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L),
        "exact gate drops the redelivery AND the same-content re-post")

      // producer crash: it never saw acks, so it republishes EVERYTHING
      // under a fresh delivery, plus one genuinely new doc
      QueueIngest.publish(spool, "del3",
        del1 ++ del2 :+ doc(5, "kappa lambda mu"))
      runPipeline() // resumed consumer: ledger skips del1/del2 files

      val accepted = Set(1L, 2L, 4L, 5L)
      assert(DedupStore.readDocs(spark, dedupDir)
        .select("doc_id").as[Long].collect().toSet == accepted)
      assert(indexedDocIds(idxDir) == accepted,
        "the index holds exactly the accepted docs — no duplicate postings")
      assert(spark.read.parquet(s"$annDir/lists")
        .select("vec_id").as[Long].collect().toSet == accepted,
        "the ANN store holds exactly the accepted docs' vectors")
      // ranked retrieval over the queue-fed segmented index ≡ fresh build
      val freshDir = s"$base/fresh"
      InvertedIndex.write(InvertedIndex.build(
        DedupStore.readDocs(spark, dedupDir).select("doc_id", "text")), freshDir)
      val terms = Seq("alpha", "epsilon", "kappa")
      def search(d: String) = InvertedIndex.searchBm25(spark, d, terms)
        .orderBy("doc_id").collect().toSeq
      assert(search(idxDir) == search(freshDir))
      // the metrics sidecar reconciles: cumulative accepted == store size
      assert(IngestMetrics.acceptedTotal(spark, mDir) == accepted.size.toLong)

      // the dead-letter consumer group sees each bad message per delivery
      val qr = QueueIngest.docRejects(
          QueueIngest.parseDocs(QueueIngest.stream(spark, spool)))
        .writeStream.format("parquet")
        .option("path", s"$base/rejects").option("checkpointLocation", s"$base/ckptR")
        .start()
      try qr.processAllAvailable() finally qr.stop()
      val reasons = spark.read.parquet(s"$base/rejects")
        .groupBy("reject_reason").count().as[(String, Long)].collect().toMap
      assert(reasons == Map( // del1 once + the del3 republish = 2 each
        "malformed_json" -> 2L, "missing_text" -> 2L, "missing_doc_id" -> 2L),
        s"dead-letter classification drifted: $reasons")
    } finally Fs.rmTree(base.toString)
  }

  // ---- two consumer groups on ONE spool (VERDICT r14 #7) ----

  test("two consumer groups on one spool: independent ack ledgers, cross-type messages are no-ops, concurrent tails don't starve") {
    val base = java.nio.file.Files.createTempDirectory("graft_q_groups")
    val spool = s"$base/spool"
    val dedupDir = s"$base/dedup"; val idxDir = s"$base/idx"
    val snapDir = s"$base/snap"
    try {
      // the erase group's primary store: a pre-existing snapshot
      operators.MergeInto.mergeFiles(spark, snapDir,
        Seq((100L, "en", "old alpha"), (101L, "en", "old beta"),
          (102L, "de", "old gamma")).toDF("doc_id", "lang", "text"),
        Seq("doc_id"), "lang")

      def pipeline() = IngestPipeline.start(
        QueueIngest.streamDocs(spark, spool, maxFilesPerTrigger = 1),
        dedupDir, idxDir, s"$base/ckptA", buckets = 8)
      def eraser() = graft.streaming.EraseSink.start(
        QueueIngest.streamEraseTickets(spark, spool, maxFilesPerTrigger = 1,
          mixedSpool = true),
        snapDir, "lang", None, None, s"$base/ckptB")

      // group A (pipeline) consumes del1 alone
      QueueIngest.publish(spool, "del1",
        Seq(doc(1, "alpha beta gamma"), doc(2, "delta epsilon zeta"),
          "%%% torn frame %%%"))
      val qa1 = pipeline(); try qa1.processAllAvailable() finally qa1.stop()
      assert(DedupStore.readDocs(spark, dedupDir)
        .select("doc_id").as[Long].collect().toSet == Set(1L, 2L))

      // group B starts LATER with its own ledger: it must still read
      // del1 (A's acks are A's alone), skip its doc messages on the
      // shared topic, and act on the ticket delivery
      QueueIngest.publish(spool, "t1",
        Seq("""{"doc_id":100}""", "%%% torn ticket %%%"))
      val qb1 = eraser(); try qb1.processAllAvailable() finally qb1.stop()
      assert(operators.MergeInto.readSnapshot(spark, snapDir)
        .select("doc_id").as[Long].collect().toSet == Set(101L, 102L),
        "the erase group erased its ticket; del1's docs were not misread as tickets")

      // group A resumes over t1: tickets are missing_text rejects for
      // the doc chain — consumed (ledger advances) but commit nothing
      val dedupV = operators.StoreManifest.currentVersion(spark, dedupDir)
      val idxV = operators.StoreManifest.currentVersion(spark, idxDir)
      val qa2 = pipeline(); try qa2.processAllAvailable() finally qa2.stop()
      assert(operators.StoreManifest.currentVersion(spark, dedupDir) == dedupV &&
        operators.StoreManifest.currentVersion(spark, idxDir) == idxV,
        "a ticket delivery must be a commit-free no-op for the doc group")

      // CONCURRENT tails: both groups live on the spool at once (their
      // stores are disjoint — single-writer per store holds), new
      // deliveries of both types land, each group drains its own
      val qa3 = pipeline(); val qb2 = eraser()
      try {
        QueueIngest.publish(spool, "del2",
          Seq(doc(3, "eta theta iota"), doc(4, "kappa lambda mu")))
        QueueIngest.publish(spool, "t2", Seq("""{"doc_id":101}"""))
        qa3.processAllAvailable(); qb2.processAllAvailable()
      } finally { qa3.stop(); qb2.stop() }
      assert(DedupStore.readDocs(spark, dedupDir)
        .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L),
        "the doc group drained del2 while the erase group was live")
      assert(indexedDocIds(idxDir) == Set(1L, 2L, 3L, 4L))
      assert(operators.MergeInto.readSnapshot(spark, snapDir)
        .select("doc_id").as[Long].collect().toSet == Set(102L),
        "the erase group drained t2 while the doc group was live")
    } finally Fs.rmTree(base.toString)
  }
}
