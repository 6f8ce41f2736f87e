package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Thin bridge to `classic.Dataset.ofRows` (private[sql]) — the one call
  * a library planning its own logical nodes needs and the only
  * non-public Spark API this repo touches (every other extension point —
  * functions, optimizer rules, strategies — is the public
  * experimental/extensions surface).
  */
object GraftBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
