package graft.sources

import graft.Fs
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Directory-tail message queue — the closest honest analog of the
  * reference's HTTP → message-queue fan-out loop (SURVEY §1.1 [R]) this
  * offline environment permits: no Kafka/AMQP connector jar exists under
  * /opt/spark/jars, so the broker is a spool DIRECTORY and the semantics
  * — not the transport — are what this source reproduces:
  *
  *  - A '''delivery''' is one atomically-published NDJSON file
  *    ([[publish]]: hidden dot-tmp → [[Fs.atomicMove]] — the tailing
  *    consumer can never observe a torn file, and Spark's file source
  *    ignores dot-prefixed names while staged). One file may carry many
  *    messages, like one AMQP batch publish.
  *  - The broker is '''at-least-once''': a producer that never saw its
  *    ack re-publishes, so the same logical message can arrive in
  *    several deliveries; deliveries also arrive '''out of event-time
  *    order''' (the spool is tailed in arrival order, never ts order).
  *  - The consumer's '''ack is the streaming checkpoint''': the file
  *    source records consumed file names per committed micro-batch, so
  *    a consumed delivery is never re-read — across restarts included —
  *    exactly a broker's per-consumer-group ack ledger. Two queries
  *    tailing the same spool with separate checkpoints are two consumer
  *    groups, each with its own ledger.
  *  - What the ledger can NOT do is collapse logical duplicates across
  *    deliveries. That is downstream content dedup — `StreamOps
  *    .dedupById` for events, the [[graft.operators.DedupStore]] exact
  *    gate for documents — the same division of labor as the
  *    reference's MQ redelivery + idempotent worker updates.
  *
  * Scale: at production rates the spool is an object-store prefix and
  * the listing cost per trigger is bounded by `maxFilesPerTrigger`
  * (Spark's `cleanSource`/`maxFileAge` options handle spool archival);
  * parsing is the shared codegen'd `from_json` chain — embarrassingly
  * parallel, no shuffle before the sink's own gates. Malformed and
  * contract-violating messages classify into the same dead-letter shape
  * as every other wire format (`raw` + `reject_reason`), so a reject
  * sink can re-publish them for repair instead of poisoning the stream
  * (the ANSI-mode poison-replay trap — CLAUDE.md r11 — cannot arise:
  * `from_json` nulls bad fields rather than throwing).
  */
object QueueIngest {

  /** Publish one delivery atomically; returns the spool file name.
    * `delivery` is the producer's tag — a redelivery reuses the tag
    * (that is what makes it recognizably the same logical send), the
    * random suffix keeps the FILE name unique so the consumer's ledger
    * treats it as new arrival, exactly like a broker redelivery.
    */
  def publish(dir: String, delivery: String, messages: Seq[String]): String = {
    Files.createDirectories(Paths.get(dir))
    val name = s"$delivery-${java.util.UUID.randomUUID().toString.take(8)}.ndjson"
    val tmp = Paths.get(dir, s".$name.tmp")
    Files.write(tmp,
      messages.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    Fs.atomicMove(tmp, Paths.get(dir, name))
    name
  }

  /** Tail the spool: one row per message line (`value`), at most
    * `maxFilesPerTrigger` deliveries per micro-batch.
    */
  def stream(spark: SparkSession, dir: String,
             maxFilesPerTrigger: Int = 16): DataFrame = {
    Files.createDirectories(Paths.get(dir)) // a consumer may start first
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)
  }

  /** The delivery tag a row arrived under (producer tag, suffix
    * stripped) — the envelope metadata an MQ consumer would see.
    */
  def deliveryTag: org.apache.spark.sql.Column =
    regexp_extract(input_file_name(), "([^/]+)-[0-9a-f]{8}\\.ndjson", 1)
      .as("delivery")

  /** Events: spool → the shared [[JsonIngest.parse]]/validate chain —
    * byte-identical classification to the file and socket paths — plus
    * the `delivery` envelope column.
    */
  def streamEvents(spark: SparkSession, dir: String,
                   maxFilesPerTrigger: Int = 16): DataFrame =
    JsonIngest.parse(stream(spark, dir, maxFilesPerTrigger))
      .withColumn("delivery", deliveryTag)

  /** Wire schema of one document message (the LLM-pipeline ingest
    * shape: id + text + optional embedding).
    */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("embedding", ArrayType(FloatType))))

  /** lines → parsed docs + validity verdict; same dead-letter contract
    * as [[JsonIngest.parse]] (`raw` kept, `reject_reason` null = valid).
    */
  def parseDocs(lines: DataFrame): DataFrame =
    lines
      .filter(length(trim(col("value"))) > 0)
      .select(col("value").as("raw"),
        from_json(col("value"), docSchema, Map("mode" -> "PERMISSIVE")).as("d"))
      .select(col("raw"), col("d.*"))
      .withColumn("reject_reason",
        when(col("doc_id").isNull && col("text").isNull, "malformed_json")
          .when(col("doc_id").isNull, "missing_doc_id")
          .when(col("text").isNull || length(trim(col("text"))) === 0,
            "missing_text")
          .otherwise(lit(null).cast("string")))

  def validDocs(parsed: DataFrame): DataFrame =
    parsed.filter(col("reject_reason").isNull).drop("raw", "reject_reason")

  def docRejects(parsed: DataFrame): DataFrame =
    parsed.filter(col("reject_reason").isNotNull).select("raw", "reject_reason")

  /** Erasure tickets over the spool: `{"doc_id": <id>}` messages → a
    * `doc_id` STRING column, the [[graft.streaming.EraseSink]] feed.
    * Deliberately string-typed: the SINK owns the try_cast +
    * null-absorption (the public-queue poison doctrine — a malformed
    * ticket must dead-end as a no-op, never kill the query and replay
    * forever), and malformed JSON degrades to a null id on the same
    * path. Erasure is content-convergent, so a redelivered ticket is
    * a commit-free no-op — at-least-once delivery is safe end to end.
    *
    * `mixedSpool = true` tails a spool SHARED with document messages
    * (two consumer groups on one topic — QueueIngestSpec's concurrent-
    * groups case): a ticket is by contract id-only, so any message
    * carrying a `text` field is a document for the OTHER group and must
    * not be misread as an erase ticket for its own id. Poison (torn
    * JSON) still flows through — `$.text` extracts null there and the
    * sink's absorption stays the single point of truth.
    */
  def streamEraseTickets(spark: SparkSession, dir: String,
                         maxFilesPerTrigger: Int = 16,
                         mixedSpool: Boolean = false): DataFrame = {
    val lines = stream(spark, dir, maxFilesPerTrigger)
      .filter(length(trim(col("value"))) > 0)
    val tickets =
      if (mixedSpool) lines.filter(get_json_object(col("value"), "$.text").isNull)
      else lines
    tickets.select(get_json_object(col("value"), "$.doc_id").as("doc_id"))
  }

  /** Docs: spool → validated document stream, the frame
    * [[graft.streaming.IngestPipeline.start]] consumes (doc_id, text,
    * embedding). Redeliveries flow through — the pipeline's exact
    * (md5-fingerprint) gate is what makes at-least-once delivery an
    * exactly-once store, the composed contract QueueIngestSpec proves.
    */
  def streamDocs(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Int = 16): DataFrame =
    validDocs(parseDocs(stream(spark, dir, maxFilesPerTrigger)))
}
