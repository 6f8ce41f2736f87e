package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One §2 section of SURVEY.md = one pack: named DataFrame queries plus the
  * DuckDB oracle SQL for every oracle-checkable (`q_*`) entry. Spark-only
  * (`s_*`) entries appear in `queries` but not `oracle`.
  */
trait QueryPack {
  type Fn = (SparkSession, String) => DataFrame
  def queries: Map[String, Fn]
  def oracle: Map[String, String]
}
