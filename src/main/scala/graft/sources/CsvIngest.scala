package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV event ingestion with explicit schema and bad-record capture —
  * same validation contract as JsonIngest, different wire format.
  *
  * PERMISSIVE mode + a `_corrupt_record` column keeps malformed lines in
  * band (reject channel) instead of failing the job — at 100 TB a single
  * bad line must never kill a scan. DROPMALFORMED/FAILFAST remain
  * available via the mode option for stricter pipelines.
  */
object CsvIngest {

  /** event_id,ts,user_id,event_type,value,props */
  private val csvSchema =
    "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, " +
      "value DOUBLE, props STRING, _corrupt_record STRING"

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(csvSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
      .withColumn("reject_reason",
        when(col("_corrupt_record").isNotNull, "malformed_csv")
          .when(col("event_id").isNull, "missing_event_id")
          .when(!col("event_type").isin(JsonIngest.validTypes: _*), "unknown_event_type")
          .otherwise(lit(null).cast("string")))

  def valid(parsed: DataFrame): DataFrame =
    parsed.filter(col("reject_reason").isNull)
      .drop("_corrupt_record", "reject_reason")

  def rejects(parsed: DataFrame): DataFrame =
    parsed.filter(col("reject_reason").isNotNull)
      .select(col("_corrupt_record").as("raw"), col("reject_reason"))
}
