package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-input → many-aggregate-views fan-out — the reference's core
  * topology (one event stream feeding independent per-key-counter,
  * distinct-cardinality and ranked-set workers), as a single-pass batch
  * operator with a streaming twin via foreachBatch (StreamingSpec's
  * s_stream_fanout).
  *
  * The input is cached once; each view is a narrow aggregate over the
  * cached scan, so the source is read once no matter how many views hang
  * off it — the batch analog of one MQ consumer group per worker.
  *
  * Scale notes: per-view shuffles are independent and key-partitioned;
  * the cache holds the (usually filtered/projected) event slice, not raw
  * bytes. In streaming, the same three views run inside one foreachBatch
  * so a micro-batch is also read once.
  */
object Fanout {

  /** The reference's three materialized views. */
  def views(events: DataFrame): Map[String, DataFrame] = {
    val hourly = date_trunc("hour", col("ts"))
    Map(
      // INCRBY worker: per (hour, user) event counts + value sums
      "counts_per_user" -> events
        .groupBy(hourly.as("hour"), col("user_id"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_value")),
      // PFADD/PFCOUNT worker: distinct users per hour (mergeable sketch)
      "uniques_hourly" -> events
        .groupBy(hourly.as("hour"))
        .agg(approx_count_distinct("user_id").as("approx_users"),
          countDistinct("user_id").as("exact_users")),
      // ZINCRBY worker: top-5 users per hour by event count
      "topk_hourly" -> {
        val counts = events.groupBy(hourly.as("hour"), col("user_id"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("hour").orderBy(col("cnt").desc, col("user_id"))
        counts.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      })
  }

  /** Single-pass materialization of every view to parquet. */
  def writeAll(spark: SparkSession, events: DataFrame, outDir: String): Map[String, Long] = {
    val cached = events.select("ts", "user_id", "event_type", "value").cache()
    try {
      views(cached).map { case (name, df) =>
        df.write.mode("overwrite").parquet(s"$outDir/$name")
        name -> spark.read.parquet(s"$outDir/$name").count()
      }
    } finally { cached.unpersist(); () }
  }
}
