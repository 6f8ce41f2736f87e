package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salted two-phase aggregation (SURVEY.md §7.4's salting recipe as
  * a reusable operator).
  *
  * For per-key aggregates where one key dominates (the reference's
  * "one hot account" case), a single reducer owns the hot key. Salting
  * splits every key into `salt` sub-keys for the first (partial)
  * aggregate, spreading the hot key over `salt` reducers, then a second
  * tiny aggregate over (key) merges the partials.
  *
  * Works for any algebraic aggregate (count/sum/min/max — anything with
  * an associative merge). AQE's skew handling covers join skew at
  * runtime; aggregation skew of a truly degenerate key is what this
  * addresses deterministically.
  */
object SaltedAgg {

  /** count + decimal sum per key, salted. `valueCol` must be additive.
    *
    * The salt must be DETERMINISTIC per row (a task retried after a
    * shuffle-fetch failure must salt its rows identically, or rows get
    * double-counted/lost across the two phases) — so it derives from the
    * row content, never from partition ids or nondeterministic counters.
    */
  def countSum(df: DataFrame, keyCol: String, valueCol: Column, salt: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(df.columns.map(col): _*), lit(salt)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__cnt"), sum(valueCol).as("__sum"))
      .groupBy(col(keyCol))
      .agg(sum("__cnt").as("cnt"), sum("__sum").as("sum_value"))
}
