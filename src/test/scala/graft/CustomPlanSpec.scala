package graft

import graft.plans.GraftTopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom whole-operator extension (LogicalPlan + SparkStrategy +
  * partial/final SparkPlan pair): result equality with the window
  * formulation, physical shape (partial below the exchange, final
  * above), and the map-side pruning actually shrinking the shuffle.
  */
class CustomPlanSpec extends SparkSpec {

  test("TopKPerKey == window row_number formulation, regardless of input layout") {
    val orders = Tables.t(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(_.toSeq).toSet
    for (layout <- Seq(orders, orders.repartition(7), orders.repartition(1))) {
      val got = GraftTopK.perKey(layout, "o_custkey", "o_totalprice", "o_orderkey", 3)
        .collect().map(_.toSeq).toSet
      assert(got == expected, s"custom operator diverged (|got|=${got.size})")
    }
  }

  test("TopKPerKey: non-numeric ord/tie fail fast at plan time, not per-row") {
    import spark.implicits._
    val df = Seq((1L, BigDecimal(2.5), 3L)).toDF("k", "d", "t")
    val e = intercept[IllegalArgumentException] {
      graft.plans.GraftTopK.perKey(df, "k", "d", "t", 1)
    }
    assert(e.getMessage.contains("numeric primitive") &&
      e.getMessage.contains("decimal"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.plans.GraftTopK.perKey(df.withColumn("s", lit("x")), "k", "t", "s", 1)
    }
    assert(e2.getMessage.contains("'s'"), e2.getMessage)
  }

  test("TopKPerKey plan: partial below the exchange, final above it") {
    val df = GraftTopK.perKey(
      Tables.t(spark, sfDir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      "o_custkey", "o_totalprice", "o_orderkey", 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val iFinal = p.indexOf("TopKPerKeyFinal")
    val iEx = p.indexOf("Exchange", iFinal)
    val iPartial = p.indexOf("TopKPerKeyPartial")
    assert(iFinal >= 0 && iPartial >= 0, s"custom execs missing:\n$p")
    assert(iFinal < iEx && iEx < iPartial,
      s"expected Final above Exchange above Partial:\n$p")
  }

  test("TopKPerKey: the exchange carries the pruned row set, not the input") {
    import spark.implicits._
    // 40k rows over 20 keys in 8 partitions: partial pruning bounds the
    // shuffle at 8·20·3 = 480 rows vs 40k unpruned
    val big = (0 until 40000).map(i => (i % 20L, i.toLong, (i % 997).toDouble))
      .toDF("k", "id", "v").repartition(8)
    val df = GraftTopK.perKey(big, "k", "v", "id", 3)
    df.collect()
    // AQE wraps the tree — descend through the adaptive plan and stages
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a +: allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: allNodes(q.plan)
      case other => other +: other.children.flatMap(allNodes)
    }
    val shuffleRead = allNodes(df.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.metrics.collectFirst {
          case (name, m) if name.toLowerCase.contains("records") => m.value
        }.getOrElse(sys.error(s"no records metric in ${e.metrics.keys}"))
    }
    assert(shuffleRead.nonEmpty, "no shuffle found under the custom final exec")
    assert(shuffleRead.head <= 8L * 20 * 3,
      s"map-side pruning failed: shuffled ${shuffleRead.head} rows")
    // and the answer is right: per key, top-3 v values with id tiebreak
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(2))).groupBy(_._1)
    assert(got.size == 20 && got.values.forall(_.length == 3))
    got.values.foreach(vs => assert(vs.map(_._2).forall(_ >= 994.0)))
  }
}
