package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE validation rule chain shared by every wire format (JSON, CSV,
  * …): a record that parses identically must classify identically.
  * Wire-format-specific parsers supply only their malformed detector.
  */
object EventValidation {

  val validTypes: Seq[String] = Seq("view", "click", "purchase", "signup", "error")

  /** reject_reason column; `malformed` is the format-specific detector and
    * reason (first arm). NULL result = valid record.
    */
  def rejectReason(malformed: (Column, String)): Column =
    when(malformed._1, malformed._2)
      .when(col("event_id").isNull, "missing_event_id")
      .when(col("ts").isNull, "missing_ts")
      .when(col("user_id").isNull, "missing_user_id")
      // explicit null arm BEFORE isin: `!isin` of NULL is NULL (falls
      // through), which would wave absent event_type through as valid
      .when(col("event_type").isNull, "missing_event_type")
      .when(!col("event_type").isin(validTypes: _*), "unknown_event_type")
      .when(col("value").isNotNull && col("value") < 0, "negative_value")
      .otherwise(lit(null).cast("string"))
}
