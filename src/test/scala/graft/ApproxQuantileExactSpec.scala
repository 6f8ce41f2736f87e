package graft

import org.apache.spark.sql.functions._

/** s_agg_approx_quantile's r17 promotion contract: at accuracy 10000,
  * Spark's approx_percentile sits in its EXACT regime whenever the
  * group row count keeps the rank-error budget below one
  * (⌊n/accuracy⌋ = 0), where its answer is the element at 1-based rank
  * ceil(p·n) — exactly DuckDB's quantile_disc. Two pins:
  *
  *  1. HEADROOM (the r15 dfCutoff doctrine): the graded grouping's max
  *     group count at sf0.01 — the only SF the oracle ever runs at —
  *     stays ≤ accuracy/2, so the exact-regime claim carries measured
  *     2× slack, and a testdata regeneration that breaks it fails HERE
  *     by name first.
  *  2. RANK RULE, boundary cases included: on constructed groups the
  *     exact-regime answer equals the ceil(p·n)-th smallest value for
  *     every n in 1..40 and p ∈ {0.5, 0.9} — including every n where
  *     p·n lands exactly on an integer (the knife-edge class where two
  *     engines' rules could diverge while agreeing everywhere else).
  */
class ApproxQuantileExactSpec extends SparkSpec {

  private val Accuracy = 10000

  test("headroom: sf0.01 o_orderpriority groups stay <= accuracy/2") {
    val maxGroup = Tables.t(spark, "/root/testdata/sf0.01", "orders")
      .groupBy("o_orderpriority").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxGroup <= Accuracy / 2,
      s"exact-regime headroom lost: max group $maxGroup > ${Accuracy / 2} — " +
        "s_agg_approx_quantile's quantile_disc oracle rides " +
        "floor(n/accuracy) = 0; re-derive before trusting t2")
  }

  test("exact-regime rank rule is ceil(p*n), boundary n included") {
    import spark.implicits._
    // distinct values v = 10*k so the picked element identifies its rank
    val rows = for (n <- 1 to 40; k <- 1 to n) yield (n, k * 10.0)
    val df = rows.toDF("n", "v")
    def rank(p: Double, n: Int): Double = math.ceil(p * n) * 10.0
    val byN = df.groupBy("n")
      .agg(expr(s"approx_percentile(v, array(0.5, 0.9), $Accuracy)").as("p"))
      .select(col("n"), col("p").getItem(0).as("p50"), col("p").getItem(1).as("p90"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    (1 to 40).foreach { n =>
      val (p50, p90) = byN(n)
      assert(p50 == rank(0.5, n),
        s"n=$n p50: got $p50, ceil-rank rule says ${rank(0.5, n)}")
      assert(p90 == rank(0.9, n),
        s"n=$n p90: got $p90, ceil-rank rule says ${rank(0.9, n)}")
    }
  }
}
