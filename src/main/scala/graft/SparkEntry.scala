package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory) and
  * §7 (build plan). Each `q_*` key has a DuckDB oracle twin in `oracleSql`;
  * `s_*` keys are Spark-only (approximate / streaming / ML) and get the
  * driver's rows-only check plus ScalaTest bounds.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    ScanQueries, JoinQueries, AggQueries, WindowQueries, SortSetQueries,
    FnQueries, TextQueries, SimQueries, EventQueries, SketchQueries,
    PipelineQueries, OperatorQueries, MiscQueries, CurationQueries,
    AnalyticsQueries, TrainingQueries, ProfileQueries)

  /** Flagship query (TPC-H Q1 analog) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val keys = packs.flatMap(_.queries.keys)
    require(keys.distinct.size == keys.size,
      s"duplicate query names across packs: ${keys.diff(keys.distinct).distinct.mkString(", ")}")
    packs.flatMap(_.queries).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
