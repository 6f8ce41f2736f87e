package graft

import graft.operators.SaltedAgg
import org.apache.spark.sql.functions._

/** Salted aggregation must equal the plain aggregate exactly — salting is
  * a physical rewrite, never a semantic one.
  */
class SaltedAggSpec extends SparkSpec {

  test("salted count+sum equals plain groupBy on skewed data") {
    import spark.implicits._
    // heavily skewed: 90% of rows share one key
    val rows = (1 to 10000).map(i => (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong))
    val df = rows.toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum(col("v").cast("decimal(18,2)")).as("sum_value"))
      .orderBy("k").collect().map(_.toString).toSeq
    val salted = SaltedAgg.countSum(df, "k", col("v").cast("decimal(18,2)"))
      .orderBy("k").collect().map(_.toString).toSeq
    assert(salted == plain)
  }

  test("salted agg on events equals q-style plain agg") {
    val ev = Tables.events(spark, sfDir)
    val plain = ev.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("value").cast("decimal(18,2)")).as("sum_value"))
      .orderBy("event_type").collect().map(_.toString).toSeq
    val salted = SaltedAgg.countSum(ev, "event_type", col("value").cast("decimal(18,2)"))
      .orderBy("event_type").collect().map(_.toString).toSeq
    assert(salted == plain)
  }

  test("s_agg_hll_union: sketch-merged monthly distinct within HLL error of exact") {
    val merged = SparkEntry.queries("s_agg_hll_union")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, ex) =>
      assert(math.abs(merged(t) - ex).toDouble / ex <= 0.1,
        s"$t merged=${merged(t)} exact=$ex")
    }
  }
}
