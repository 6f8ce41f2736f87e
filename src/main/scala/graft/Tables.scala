package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical parquet table loaders (SURVEY.md §1.2/§1.3).
  *
  * Scale notes (100 TB design): every loader is a plain columnar scan —
  * Catalyst pushes filters/projections into the vectorized parquet reader,
  * so downstream operators decide what is actually read. At production
  * scale the same code runs against a partitioned/bucketed layout
  * (e.g. `events` partitioned by day, `lineitem` bucketed by l_orderkey);
  * nothing here assumes single-file inputs.
  */
object Tables {

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Canonical `events` loader — the one sharp edge (SURVEY.md §1.3).
    *
    * events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which Spark 4
    * refuses to read natively ([PARQUET_TYPE_ILLEGAL]). With
    * `spark.sql.legacy.parquet.nanosAsLong=true` the column arrives as
    * BIGINT nanoseconds; we truncate to microseconds with integer `div`
    * (NEVER `/1000`: the double round-trip corrupts the last µs digit)
    * and align to TIMESTAMP_NTZ so parquet dumps carry the same
    * (unadjusted) semantics as the DuckDB oracle's `CAST(ts AS TIMESTAMP)`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Set at session-build time in Verify/Bench/tests; repeated here so any
    // ad-hoc session gets it too (it is a runtime-settable SQLConf).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  }
}
