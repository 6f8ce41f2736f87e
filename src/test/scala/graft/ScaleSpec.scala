package graft

import org.apache.spark.sql.functions._

/** Scale-up smoke: the flagship aggregate over 20x-replicated lineitem
  * (1.2M rows here) must produce exactly 20x the base counts/sums —
  * partial aggregation, spill and merge paths stay correct as data
  * grows, which is the property that carries to 100 TB.
  */
class ScaleSpec extends SparkSpec {

  test("pricing summary scales linearly under 20x data replication") {
    val base = Tables.t(spark, sfDir, "lineitem")
    val factor = 20
    val replicated = base.crossJoin(
      spark.range(factor.toLong).select(col("id").as("rep")))
    val scaled = replicated
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect()
    val plain = base
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect()
    assert(scaled.length == plain.length)
    scaled.zip(plain).foreach { case (s, p) =>
      assert(s.getString(0) == p.getString(0) && s.getString(1) == p.getString(1))
      assert(s.getLong(2) == p.getLong(2) * factor, s"count not linear for ${p.getString(0)}")
      assert(s.getDecimal(3) == p.getDecimal(3).multiply(new java.math.BigDecimal(factor))
        .setScale(2), s"sum not linear for ${p.getString(0)}")
    }
  }

  test("custom top-k under extreme key skew: bounded shuffle, exact result") {
    import spark.implicits._
    // 100k rows, 99% on ONE key — the shape that melts a window sort's
    // single hot partition; the partial phase caps the hot key's shuffle
    // contribution at k rows per input partition
    val rows = Seq.tabulate(100000) { i =>
      val k = if (i % 100 == 0) (i / 100 % 50).toLong + 1 else 0L
      (k, i.toLong, (i % 9973).toDouble)
    }
    val df = rows.toDF("k", "id", "v").repartition(16)
    val got = graft.plans.GraftTopK.perKey(df, "k", "v", "id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(org.apache.spark.sql.functions.col("v").desc,
        org.apache.spark.sql.functions.col("id"))
    val want = df.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(w))
      .filter(org.apache.spark.sql.functions.col("rn") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"skewed top-k diverged: ${got.size} vs ${want.size}")
  }
}
