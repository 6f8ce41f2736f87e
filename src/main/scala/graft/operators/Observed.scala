package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight pipeline metrics via `Dataset.observe` — the zero-cost
  * observability story for a 100 TB pass: the counters are
  * accumulator-backed aggregate expressions evaluated AS the rows stream
  * through the existing plan, so quality telemetry (row counts, null
  * counts, violation counts) costs no second scan, no cache, and no
  * extra shuffle. This is how a production run reports "rows read /
  * rows rejected / bytes of nulls" per stage without re-reading input.
  *
  * Contrast with ProfileQueries.q_profile_stats (a dedicated ANALYZE
  * pass): observe() piggybacks on whatever action the caller was already
  * running. The metrics become available once ANY action completes on
  * the returned frame.
  */
object Observed {

  /** Attach standard quality counters for `valueCol` to `df`.
    * Returns the instrumented frame plus the Observation handle;
    * `obs.get` blocks until the caller's first action finishes.
    */
  def withQualityMetrics(df: DataFrame, valueCol: String): (DataFrame, Observation) = {
    val obs = Observation()
    val instrumented = df.observe(obs,
      count(lit(1)).as("n_rows"),
      count(col(valueCol)).as("n_nonnull"),
      sum(when(col(valueCol) < 0, 1).otherwise(0)).cast("long").as("n_negative"),
      max(col(valueCol)).as("max_value"))
    (instrumented, obs)
  }
}
