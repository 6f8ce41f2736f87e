package graft

import graft.operators.{QuantileSketch, SketchStore}
import org.apache.spark.sql.functions._

/** Cross-session sketch persistence (operators.SketchStore): parquet
  * round-trip preserves sketch bytes, union-after-reload ≡ single-pass
  * sketch (BITWISE in the exact ≤ k-distinct regime), and the HLL
  * rollup from persisted sketches equals the live union / true distinct
  * count on this data.
  */
class SketchStoreSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_skspec").toString

  test("BHYT: union of reloaded daily sketches == single-pass sketch, bitwise (exact regime)") {
    import spark.implicits._
    // 3 "days", 6 distinct values total, k=16 → no lossy merge anywhere:
    // the persisted path must reproduce the single-pass bins exactly
    val rows = Seq(
      ("d1", 1.0), ("d1", 2.0), ("d1", 2.0),
      ("d2", 3.0), ("d2", 4.0),
      ("d3", 5.0), ("d3", 6.0), ("d3", 1.0))
    val df = rows.toDF("day", "v")
    val daily = df.groupBy("day")
      .agg(QuantileSketch.sketchAgg(col("v"), k = 16).as("qsk"))
    val dir = tmp()
    try {
      SketchStore.write(daily, dir, "day")
      val unioned = SketchStore.read(spark, dir)
        .agg(QuantileSketch.unionAgg(col("qsk"), k = 16).as("sk"))
        .as[Array[Double]].head()
      val single = df.agg(QuantileSketch.sketchAgg(col("v"), k = 16).as("sk"))
        .as[Array[Double]].head()
      assert(unioned.toSeq == single.toSeq,
        s"persisted-union bins ${unioned.toSeq} != single-pass ${single.toSeq}")
      // and the exact histogram is what both contain
      assert(single.toSeq == Seq(1.0, 2.0, 2.0, 2.0, 3.0, 1.0, 4.0, 1.0, 5.0, 1.0, 6.0, 1.0))
    } finally Fs.rmTree(dir)
  }

  test("parquet round-trip preserves sketch columns byte-for-byte") {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).cast("string").as("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("hll"),
        QuantileSketch.sketchAgg(col("value").cast("double")).as("qsk"))
    val dir = tmp()
    try {
      SketchStore.write(daily, dir, "day")
      val before = daily.select(col("day"), hex(col("hll")).as("h"),
          col("qsk").cast("string").as("q"))
        .as[(String, String, String)].collect().toSet
      val after = SketchStore.read(spark, dir)
        .select(col("day"), hex(col("hll")).as("h"),
          col("qsk").cast("string").as("q"))
        .as[(String, String, String)].collect().toSet
      assert(after == before, "sketch bytes drifted through parquet")
    } finally Fs.rmTree(dir)
  }

  test("HLL rollup from persisted sketches == live union estimate; sane vs exact") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val daily = ev.groupBy(to_date(col("ts")).cast("string").as("day"),
        col("event_type"))
      .agg(expr("hll_sketch_agg(user_id)").as("hll"))
    val dir = tmp()
    try {
      SketchStore.write(daily, dir, "day")
      val persisted = SketchStore.rollupHll(spark, dir, Seq("event_type"), "hll")
        .select(col("event_type"), col("approx_distinct"))
        .as[(String, Long)].collect().toMap
      val live = daily.groupBy("event_type")
        .agg(expr("hll_sketch_estimate(hll_union_agg(hll))").as("e"))
        .as[(String, Long)].collect().toMap
      assert(persisted == live, "persisted rollup diverged from live union")
      val exact = ev.groupBy("event_type")
        .agg(countDistinct("user_id").as("d")).as[(String, Long)].collect().toMap
      persisted.foreach { case (t, est) =>
        val ex = exact(t).toDouble
        assert(math.abs(est - ex) / ex < 0.15,
          s"$t: persisted HLL estimate $est vs exact $ex out of band")
      }
    } finally Fs.rmTree(dir)
  }

  test("day-partitioned store prunes a date-range rollup at the directory level") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).cast("string").as("day"))
      .agg(QuantileSketch.sketchAgg(col("value").cast("double")).as("qsk"))
    val dir = tmp()
    try {
      SketchStore.write(daily, dir, "day")
      val scan = SketchStore.read(spark, dir).filter(col("day") === "2024-01-03")
      scan.collect()
      val p = scan.queryExecution.executedPlan.toString
      assert(p.contains("PartitionFilters: [isnotnull(day"),
        s"day filter must prune partitions:\n$p")
    } finally Fs.rmTree(dir)
  }
}
