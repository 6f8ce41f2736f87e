package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point (SURVEY.md §3.3): register every testdata table as a
  * temp view (events through the canonical loader) so users can drive the
  * engine with `spark.sql(...)` strings as well as the DataFrame API —
  * both land in the same Catalyst pipeline.
  */
object Sql {

  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  def registerViews(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach(n => Tables.t(spark, dir, n).createOrReplaceTempView(n))
    Tables.events(spark, dir).createOrReplaceTempView("events")
    functions.VectorFunctions.register(spark)
  }

  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(query)
  }
}
