package graft

import graft.operators.{ScalableNtile, TokenPacker}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The r13 distributed-rank primitives (the registry-wide
  * unpartitioned-window ban's replacements) pinned DIRECTLY against
  * the window formulations they replace — the hash-graded queries
  * prove them end-to-end, this proves them on raw frames with ties,
  * empties, and a non-trivial partition count, so a future caller
  * can't misuse them outside the oracle's sight.
  */
class DistRankSpec extends SparkSpec {

  import spark.implicits._

  test("rankBy == row_number over the same total order (ties broken by the key)") {
    // orders amounts carry duplicates; (o_totalprice, o_orderkey) is total
    val o = Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val viaWindow = o.withColumn("rank",
        row_number().over(Window.orderBy(col("o_totalprice").desc,
          col("o_orderkey"))).cast("long"))
      .select("o_orderkey", "rank")
      .as[(Long, Long)].collect().toMap
    val viaRankBy = ScalableNtile.rankBy(o,
        Seq(col("o_totalprice").desc, col("o_orderkey")), partitions = 7)
      .select("o_orderkey", "rank")
      .as[(Long, Long)].collect().toMap
    assert(viaRankBy == viaWindow,
      "distributed rank diverged from the window formulation")
    // and no unpartitioned window in the distributed plan
    val plan = ScalableNtile.rankBy(o,
      Seq(col("o_totalprice").desc, col("o_orderkey")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rankBy must not plan a window:\n$plan")
  }

  test("rankCumsum == rank window + running-sum window, plus the exact grand total") {
    val tf = Tables.t(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cf"))
    val w = Window.orderBy(col("cf").desc, col("token"))
    val viaWindow = tf.select(col("token"),
        row_number().over(w).cast("long").as("rank"),
        sum("cf").over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("cum"))
      .as[(String, Long, Long)].collect().toSet
    val (ranked, total) = TokenPacker.rankCumsum(tf, "cf",
      Seq(col("cf").desc, col("token")), partitions = 7)
    val viaDist = ranked.select("token", "rank", "cum")
      .as[(String, Long, Long)].collect().toSet
    assert(viaDist == viaWindow,
      "distributed prefix sum diverged from the window formulation")
    assert(total == tf.agg(sum("cf")).head().getLong(0),
      "grand total must equal the aggregate")
  }

  test("rankBy/rankCumsum on empty and single-row frames") {
    val empty = Seq.empty[(String, Long)].toDF("k", "v")
    assert(ScalableNtile.rankBy(empty, Seq(col("v"))).count() == 0)
    val (re, te) = TokenPacker.rankCumsum(empty, "v", Seq(col("v")))
    assert(re.count() == 0 && te == 0L)
    val one = Seq(("a", 7L)).toDF("k", "v")
    val (r1, t1) = TokenPacker.rankCumsum(one, "v", Seq(col("v")))
    assert(r1.as[(String, Long, Long, Long)].collect().toSeq ==
      Seq(("a", 7L, 1L, 7L)) && t1 == 7L)
  }
}
