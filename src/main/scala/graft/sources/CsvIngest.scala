package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV event ingestion with explicit schema and bad-record capture —
  * the same validation contract as JsonIngest on a different wire format:
  * every reject keeps the ORIGINAL line plus a reason, so the dead-letter
  * channel is replayable.
  *
  * Implementation mirrors JsonIngest: read raw lines, parse with the
  * codegen'd `from_csv` expression (embarrassingly parallel, no shuffle),
  * validate declaratively.
  */
object CsvIngest {

  /** event_id,ts,user_id,event_type,value,props; the trailing corrupt-
    * record field makes token-count mismatches (extra/shifted columns)
    * detectable instead of silently truncated.
    */
  private val csvSchema =
    "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, " +
      "value DOUBLE, props STRING, _corrupt_record STRING"

  /** lines(value: string) → parsed fields + `raw` + `reject_reason`.
    * Blank lines are skipped (consistent with JsonIngest.parse).
    */
  def parse(lines: DataFrame): DataFrame =
    lines
      .filter(length(trim(col("value"))) > 0)
      .select(col("value").as("raw"),
        from_csv(col("value"), org.apache.spark.sql.types.StructType.fromDDL(csvSchema),
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")).as("e"))
      .select(col("raw"), col("e.*"))
      .withColumn("reject_reason", EventValidation.rejectReason(
        (col("_corrupt_record").isNotNull ||
          (col("event_id").isNull && col("ts").isNull &&
            col("user_id").isNull && col("event_type").isNull), "malformed_csv")))

  def readCsv(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))

  def valid(parsed: DataFrame): DataFrame =
    parsed.filter(col("reject_reason").isNull)
      .drop("raw", "reject_reason", "_corrupt_record")

  def rejects(parsed: DataFrame): DataFrame =
    parsed.filter(col("reject_reason").isNotNull).select("raw", "reject_reason")
}
