package graft

import org.apache.spark.sql.functions._

/** The spark.sql entry point must land in the same Catalyst pipeline as
  * the DataFrame API: identical results, and graft_dot available in SQL.
  */
class SqlSpec extends SparkSpec {

  test("sql entry point equals the DataFrame formulation") {
    val viaSql = Sql.sql(spark, sfDir,
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(_.toString).toSeq
    val viaDf = Tables.t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.toString).toSeq
    assert(viaSql == viaDf)
  }

  test("graft_dot is callable from SQL over the events/embeddings views") {
    val r = Sql.sql(spark, sfDir,
      "SELECT vec_id, ROUND(graft_dot(embedding, embedding), 6) AS sq_norm " +
        "FROM embeddings ORDER BY vec_id LIMIT 5").collect()
    assert(r.length == 5 && r.forall(_.getDouble(1) > 0))
  }

  test("events view uses the canonical ns->us loader") {
    val viaView = Sql.sql(spark, sfDir, "SELECT COUNT(*) FROM events WHERE ts IS NOT NULL")
      .first().getLong(0)
    assert(viaView == Tables.events(spark, sfDir).count())
  }
}
