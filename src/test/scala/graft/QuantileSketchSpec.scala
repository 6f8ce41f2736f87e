package graft

import graft.operators.QuantileSketch
import org.apache.spark.sql.functions._

/** QuantileSketch (BHYT mergeable histogram): exactness below capacity,
  * bitwise merge-associativity/commutativity below capacity, rank-error
  * bounds above it on real data, and scala-vs-column estimator parity.
  */
class QuantileSketchSpec extends SparkSpec {

  private def hist(vals: Seq[Double], k: Int): Array[Double] = {
    val agg = new QuantileSketch.HistAgg(k)
    agg.finish(vals.foldLeft(agg.zero)(agg.reduce))
  }

  test("below capacity: bins are the exact histogram; union is bitwise associative") {
    // integer-valued doubles so weighted means of equal centroids are
    // FP-exact; 6 distinct values, k=8 → no lossy merge can ever fire
    val a = hist(Seq(1.0, 2.0, 2.0, 3.0), k = 8)
    val b = hist(Seq(3.0, 4.0, 5.0), k = 8)
    val c = hist(Seq(5.0, 5.0, 6.0), k = 8)
    assert(a.toSeq == Seq(1.0, 1.0, 2.0, 2.0, 3.0, 1.0), "exact (c,w) bins")
    val u = new QuantileSketch.HistUnionAgg(8)
    val ab_c = u.merge(u.merge(a, b), c)
    val a_bc = u.merge(a, u.merge(b, c))
    assert(ab_c.toSeq == a_bc.toSeq, "associative bit-for-bit below capacity")
    assert(u.merge(b, a).toSeq == u.merge(a, b).toSeq, "commutative below capacity")
    assert(ab_c.toSeq == Seq(1.0, 1.0, 2.0, 2.0, 3.0, 2.0, 4.0, 1.0, 5.0, 3.0, 6.0, 1.0),
      "union of exact histograms is the exact histogram of the union")
  }

  test("estimate: median of an exact histogram interpolates correctly; edges clamp") {
    val h = hist(Seq(10.0, 20.0, 30.0, 40.0), k = 8)
    assert(QuantileSketch.estimate(h, 0.5) === 25.0) // midpoint of 20,30
    assert(QuantileSketch.estimate(h, 0.0) === 10.0)
    assert(QuantileSketch.estimate(h, 1.0) === 40.0)
    assert(QuantileSketch.estimate(Array.emptyDoubleArray, 0.5).isNaN)
  }

  test("rank error vs exact quantiles on events.value stays under 3%") {
    import spark.implicits._
    val vals = Tables.events(spark, sfDir)
      .select(col("value").cast("double")).as[Double].collect().sorted
    val n = vals.length
    // sketch built distributed (32 partitions → 32 partial merges), so
    // the merge path is exercised, not just reduce
    val sk = Tables.events(spark, sfDir)
      .repartition(32)
      .agg(QuantileSketch.sketchAgg(col("value").cast("double")).as("sk"))
      .head().getSeq[Double](0).toArray
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = QuantileSketch.estimate(sk, q)
      // rank error: where the estimate actually lands in the sorted data
      val rank = vals.count(_ <= est).toDouble / n
      assert(math.abs(rank - q) <= 0.03,
        s"q=$q est=$est landed at rank $rank (err ${math.abs(rank - q)})")
    }
  }

  test("daily-sketch union matches a single global sketch's estimates closely") {
    // the rollup path (per-day sketches → union) must agree with the
    // one-pass sketch: both are lossy, but on the same data their
    // quantile estimates should differ by far less than the error bound
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(QuantileSketch.sketchAgg(col("value").cast("double")).as("sk"))
      .agg(QuantileSketch.unionAgg(col("sk")).as("sk"))
      .head().getSeq[Double](0).toArray
    val global = Tables.events(spark, sfDir)
      .agg(QuantileSketch.sketchAgg(col("value").cast("double")).as("sk"))
      .head().getSeq[Double](0).toArray
    for (q <- Seq(0.5, 0.9, 0.99)) {
      val (d, g) = (QuantileSketch.estimate(daily, q), QuantileSketch.estimate(global, q))
      val spread = math.abs(d - g) / math.max(math.abs(g), 1e-9)
      assert(spread < 0.05, s"q=$q union=$d vs global=$g (spread $spread)")
    }
  }

  test("column estimator (declarative aggregate walk) matches the scala estimator") {
    import spark.implicits._
    val sk = hist(Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0), k = 4)
    val viaCol = Seq(Tuple1(sk)).toDF("sk")
      .select(QuantileSketch.estimateCols(col("sk"), Seq(0.25, 0.5, 0.9)): _*)
      .head()
    for ((q, i) <- Seq(0.25, 0.5, 0.9).zipWithIndex) {
      val want = BigDecimal(QuantileSketch.estimate(sk, q))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(viaCol.getDouble(i) === want, s"q=$q column ${viaCol.getDouble(i)} vs $want")
    }
  }

  test("s_agg_quantile_union: one row per event_type, ordered percentiles") {
    val out = SparkEntry.queries("s_agg_quantile_union")(spark, sfDir).collect()
    assert(out.length == 5)
    out.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p50 <= p90 && p90 <= p99, s"percentiles out of order: $p50 $p90 $p99")
      assert(r.getLong(1) > 25, "expected a month of daily sketches")
    }
  }
}
