package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON event ingestion with schema validation and bad-record handling —
  * the engine's analog of the reference's ingest path (HTTP JSON events →
  * validate → reject malformed → fan out to aggregate views).
  *
  * One parser serves batch (`spark.read.text` / a DataFrame of lines) and
  * streaming (`spark.readStream` file/socket sources): `parse` is a pure
  * DataFrame → DataFrame transform.
  *
  * Scale notes: `from_json` is a codegen'd expression — parsing is
  * embarrassingly parallel, no shuffle. Rejects carry the raw line and a
  * reason so a dead-letter sink can be replayed (at-least-once +
  * downstream dedup on event_id = the reference's idempotency story,
  * covered by StreamOps.dedupById).
  */
object JsonIngest {

  /** Wire schema of one event (reference-style flat JSON). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val validTypes: Seq[String] = EventValidation.validTypes

  /** lines(value: string) → parsed events + validity verdict.
    * Output columns: parsed fields, `raw`, `reject_reason` (null = valid).
    */
  def parse(lines: DataFrame): DataFrame =
    lines
      .filter(length(trim(col("value"))) > 0) // blank lines are not events
      .select(col("value").as("raw"),
        from_json(col("value"), eventSchema, Map("mode" -> "PERMISSIVE")).as("e"))
      .select(col("raw"), col("e.*"))
      // PERMISSIVE mode yields an all-null struct for unparseable input —
      // all key fields null together is the malformed marker
      .withColumn("reject_reason", EventValidation.rejectReason(
        (col("event_id").isNull && col("ts").isNull &&
          col("user_id").isNull && col("event_type").isNull, "malformed_json")))

  // from_json never returns a null struct in PERMISSIVE mode for non-null
  // input; the all-fields-null check above is the malformed marker. Keep a
  // helper pair for callers:
  def valid(parsed: DataFrame): DataFrame =
    parsed.filter(col("reject_reason").isNull).drop("raw", "reject_reason")

  def rejects(parsed: DataFrame): DataFrame =
    parsed.filter(col("reject_reason").isNotNull).select("raw", "reject_reason")

  /** Batch entry: newline-delimited JSON file(s). */
  def readJsonLines(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))

  /** Streaming entry: micro-batch tailing of a directory of NDJSON files. */
  def streamJsonLines(spark: SparkSession, path: String): DataFrame =
    parse(spark.readStream.text(path))

  /** Streaming entry over a TCP socket of NDJSON lines — the network-
    * boundary ingest topology (reference shape: HTTP/MQ push → worker).
    * The socket source is at-most-once (offsets are not replayable), so a
    * production deployment pairs it with downstream dedup on event_id
    * (StreamOps.dedupById) exactly like the reference's ack-and-dedup
    * loop; the parse/validate/dead-letter chain is byte-identical to the
    * file path because `parse` is a pure transform.
    */
  def streamSocket(spark: SparkSession, host: String, port: Int): DataFrame =
    parse(spark.readStream.format("socket")
      .option("host", host).option("port", port).load())
}
