package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-session sketch persistence — the warehouse half of the
  * reference's PFMERGE-across-days pattern (SURVEY §1.1): persist daily
  * sketch tables once, union them into weekly/monthly rollups LATER,
  * in a different session, without ever re-touching the raw data.
  *
  * Both sketch families already used in the registry persist as plain
  * parquet column types, so any engine can store and ship them:
  *   - DataSketches HLL (`hll_sketch_agg`) is a BINARY column; reloaded
  *     sketches union with `hll_union_agg` exactly as live ones do.
  *   - The BHYT quantile histogram ([[QuantileSketch]]) is ARRAY<DOUBLE>
  *     of interleaved (centroid, weight); reloaded sketches union with
  *     [[QuantileSketch.unionAgg]]. In the exact regime (≤ k distinct
  *     values) union-after-reload is BITWISE identical to the
  *     single-pass sketch — SketchStoreSpec proves it.
  *
  * Scale shape: the daily build is the only pass over raw data (one
  * shuffle per day-partition of the corpus); the rollup scans
  * days×groups sketch rows — kilobytes per row — so a year-to-date
  * percentile at 100 TB costs a few thousand sketch merges, not a
  * re-scan. Writes are `partitionBy(partitionCol)`, so a rollup over a
  * date range partition-prunes the sketch table itself.
  */
object SketchStore {

  /** Persist a daily sketch table (any sketch columns), partitioned by
    * `partitionCol` so later range rollups prune at the directory level.
    * Values are canonicalized to strings (the mergeFiles discipline —
    * partition-column TYPE inference must never depend on session conf).
    */
  def write(daily: DataFrame, dir: String, partitionCol: String = "day"): Unit =
    daily.withColumn(partitionCol, col(partitionCol).cast("string"))
      .repartition(col(partitionCol))
      .write.partitionBy(partitionCol).mode("overwrite").parquet(dir)

  /** Reload a persisted sketch table. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Union persisted BHYT sketches per `keyCols` and estimate `qs`
    * quantiles (columns `p50`-style, rounded 6dp) plus `n_sketches`.
    */
  def rollupQuantiles(spark: SparkSession, dir: String, keyCols: Seq[String],
                      sketchCol: String, qs: Seq[Double],
                      k: Int = 128): DataFrame = {
    val sk = QuantileSketch.unionAgg(col(sketchCol), k).as("sk")
    read(spark, dir)
      .groupBy(keyCols.map(col): _*)
      .agg(sk, count(lit(1)).as("n_sketches"))
      .select(keyCols.map(col) ++ (col("n_sketches") +:
        QuantileSketch.estimateCols(col("sk"), qs)): _*)
  }

  /** Union persisted HLL sketches per `keyCols` → estimated distinct
    * count (`approx_distinct`) plus `n_sketches`.
    */
  def rollupHll(spark: SparkSession, dir: String, keyCols: Seq[String],
                sketchCol: String): DataFrame =
    read(spark, dir)
      .groupBy(keyCols.map(col): _*)
      .agg(expr(s"hll_sketch_estimate(hll_union_agg($sketchCol))")
        .as("approx_distinct"),
        count(lit(1)).as("n_sketches"))
}
