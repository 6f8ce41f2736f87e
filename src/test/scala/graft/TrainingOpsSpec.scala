package graft

import org.apache.spark.sql.functions._

/** Round-5 operator checks: span-level exact-dup fraction, tie-safe
  * arg-max aggregates, and the skew-salted join's semantic equality with
  * the plain join it physically rewrites.
  */
class TrainingOpsSpec extends SparkSpec {

  test("q_dedup_span: planted full-copy doc has dup_frac 1.0, unique docs 0") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-span").toString
    val a = (1 to 40).map(i => s"w$i").mkString(" ") // 40 unique tokens
    val b = (100 to 140).map(i => s"u$i").mkString(" ")
    Seq(
      (0L, a, "en", "src0", a.length.toLong),
      (1L, a, "en", "src1", a.length.toLong), // exact copy of doc 0
      (2L, b, "en", "src2", b.length.toLong)  // fully unique
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = SparkEntry.queries("q_dedup_span")(spark, tmp)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.length == 3)
    assert(r(0) == ((0L, 33L, 33L, 1.0)), s"copied doc 0: ${r(0)}") // 40-8+1 spans
    assert(r(1) == ((1L, 33L, 33L, 1.0)), s"copied doc 1: ${r(1)}")
    assert(r(2)._3 == 0L && r(2)._4 == 0.0, s"unique doc: ${r(2)}")
  }

  test("q_dedup_span: window shape equals an aggregate-then-join-back recomputation") {
    val sp = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 8)," +
          " i -> concat_ws(' ', slice(toks, i + 1, 8)))")).as("span"))
    // the independent formulation: global span totals joined back on the
    // span key (the query itself uses the one-shuffle count window)
    val totals = sp.groupBy("span").agg(count(lit(1)).as("c"))
    val viaJoin = sp.join(totals, "span")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), count(when(col("c") >= 2, 1)).as("n_dup"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaQuery = SparkEntry.queries("q_dedup_span")(spark, sfDir)
      .select("doc_id", "n_spans", "n_dup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaQuery == viaJoin)
  }

  test("q_agg_argmax: max_by/min_by agree with a window-sort recomputation") {
    val c = Tables.t(spark, sfDir, "customer").withColumn("ord",
      expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * 1000000000 + c_custkey"))
    val n = Tables.t(spark, sfDir, "nation")
    val joined = c.join(n, c("c_nationkey") === n("n_nationkey"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy("n_name").orderBy(col("ord").desc)
    val wLow = org.apache.spark.sql.expressions.Window
      .partitionBy("n_name").orderBy(col("ord").asc)
    val expected = joined
      .withColumn("rt", row_number().over(wTop))
      .withColumn("rl", row_number().over(wLow))
      .filter(col("rt") === 1 || col("rl") === 1)
      .groupBy("n_name")
      .agg(max(when(col("rt") === 1, col("c_name"))).as("top_name"),
        max(when(col("rl") === 1, col("c_name"))).as("low_name"))
      .orderBy("n_name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    val got = SparkEntry.queries("q_agg_argmax")(spark, sfDir)
      .select("n_name", "top_name", "low_name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(got == expected)
  }

  test("q_select_budget: matches single-reducer window; budget tight") {
    val budget = 20000L
    val got = SparkEntry.queries("q_select_budget")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // window recomputation (the oracle's single-reducer shape)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val expected = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("score"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= budget)
      .orderBy("doc_id")
      .select("doc_id", "score", "n_tokens", "cum_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected.toSeq)
    // strict budget: inclusive totals never exceed it
    assert(got.forall(_._4 <= budget))
  }

  test("q_join_skew_salted equals the plain unsalted join+agg") {
    val l = Tables.t(spark, sfDir, "lineitem")
    val p = Tables.t(spark, sfDir, "part")
    val plain = l.join(p, l("l_partkey") === p("p_partkey"))
      .groupBy(p("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
          .cast("decimal(18,2)").cast("double").as("revenue"))
      .orderBy("p_brand").collect().map(_.toString).toSeq
    val salted = SparkEntry.queries("q_join_skew_salted")(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(salted == plain)
  }

  test("q_join_skew_salted plan: shuffled join, no broadcast of the salted dim") {
    val df = SparkEntry.queries("q_join_skew_salted")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"expected shuffled hash join:\n$plan")
  }
}
