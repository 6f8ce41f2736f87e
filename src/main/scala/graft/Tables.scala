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
    * The `ts` column's physical type is an environment contract that has
    * CHANGED under us once already (round 7 → 8: INT64 TIMESTAMP(NANOS) →
    * INT64 TIMESTAMP(MICROS)), so the loader adapts to what the footer
    * actually holds instead of assuming:
    *
    *   - NANOS + `spark.sql.legacy.parquet.nanosAsLong=true` → arrives as
    *     BIGINT nanoseconds; truncate to µs with integer `div` (NEVER
    *     `/1000`: the double round-trip corrupts the last µs digit) and
    *     rebuild the timestamp.
    *   - MICROS (or any native timestamp type) → arrives as a timestamp
    *     already; just align to TIMESTAMP_NTZ.
    *
    * Either way the result is TIMESTAMP_NTZ at µs precision, matching the
    * DuckDB oracle's `CAST(ts AS TIMESTAMP)` semantics. TestdataContractSpec
    * asserts the current footer type so the next drift fails one clearly
    * named test instead of 40+ queries.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Set at session-build time in Verify/Bench/tests; repeated here so any
    // ad-hoc session gets it too (it is a runtime-settable SQLConf). Only
    // load-bearing for the NANOS layout; harmless otherwise.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      case _ =>
        col("ts").cast("timestamp_ntz")
    }
    raw.withColumn("ts", ts)
  }
}
