package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 — aggregations.
  *
  * Determinism: all money sums go through DECIMAL casts *before*
  * aggregation (double sums are order-dependent). The DECIMAL(18,2) cast
  * DOES round (a minority of stored doubles carry float noise beyond 2
  * decimals); the real invariant is that Spark's and DuckDB's
  * double→decimal casts share decimal-aware round-half-up tie semantics,
  * so both engines round identically — do not reorder the cast and the
  * aggregation. l_discount is 6-decimal-valued so it gets DECIMAL(18,6);
  * the disc-price product keeps full scale 8.
  *
  * Output representation: the FINAL money columns are cast DECIMAL→DOUBLE.
  * The aggregation stays decimal-exact; only the last projection converts.
  * Rationale: the verify harness stringifies cells through pandas, where a
  * Spark decimal keeps its scale ("1524135.00") but a DuckDB result
  * arrives as float64 ("1524135.0") — numerically identical, textually
  * different. Casting the final value to DOUBLE on BOTH engines makes the
  * serialized representation identical. The cast is bit-reproducible
  * because every value is first rounded to DECIMAL(18,2) (≤ 16 significant
  * digits, so the correctly-rounded decimal→double conversion both engines
  * perform yields the same bits; a scale-8 decimal near 1e8 would not fit).
  * CAUTION: a scale-REDUCING decimal cast must be Spark `.cast` paired with
  * DuckDB `ROUND(x, s)` — both round half away from zero — NEVER a DuckDB
  * `CAST(... AS DECIMAL(n,s))`, which TRUNCATES (verified: 0.675→0.67).
  *
  * Scale notes: every groupBy here compiles to partial (map-side) +
  * final HashAggregate around one Exchange — the canonical scalable shape.
  * Distinct counts rewrite via Expand; at 100 TB swap exact distinct for
  * the mergeable `hll_sketch_agg` path (see SketchQueries.s_agg_hll).
  * Skewed group keys are handled by AQE; for pathological single-key skew
  * pre-salt with a synthetic suffix and re-aggregate.
  */
object AggQueries extends QueryPack {

  private val sumQty  = "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)"
  private val sumBase = "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)"

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Wide day × event_type count matrix — shared by pivot and unpivot. */
  private def pivotDaily(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy("day").pivot("event_type", eventTypes).agg(count(lit(1)))
      .select(col("day") +:
        eventTypes.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)

  val queries: Map[String, Fn] = Map(
    "q_agg_pricing_summary" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)")
            .cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(18,2)")
            .cast("double").as("sum_base"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
            .cast("decimal(18,2)").cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_agg_distinct_daily" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(countDistinct(col("user_id")).as("uniq_users"), count(lit(1)).as("cnt"))
        .orderBy("day", "event_type")),

    "q_agg_multi_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(countDistinct(col("user_id")).as("uniq_users"),
          countDistinct(col("event_type")).as("uniq_types"),
          count(lit(1)).as("cnt"))
        .orderBy("day")),

    "q_agg_having" -> ((s, dir) =>
      Tables.t(s, dir, "part")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"),
          sum(col("p_retailprice").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_price_dec"))
        .filter(col("cnt") > 70 && col("sum_price_dec") > col("cnt") * lit(945))
        .select(col("p_brand"), col("cnt"),
          col("sum_price_dec").cast("double").as("sum_price"))
        .orderBy("p_brand")),

    "q_agg_rollup" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)")
            .cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "q_agg_cube" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)")
            .cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "q_agg_grouping_sets" -> ((s, dir) =>
      // Spark 4's native Dataset.groupingSets — no temp-view side effects
      Tables.t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          count(lit(1)).as("cnt"))
        .orderBy(col("g_flag"), col("g_status"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "q_quantile_exact" -> ((s, dir) =>
      Tables.t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
        .orderBy("o_orderpriority")),

    // exact WEIGHTED median per (returnflag, linestatus): smallest price
    // whose cumulative weight reaches half the group total. The running
    // sum uses the DEFAULT window frame — RANGE UNBOUNDED PRECEDING TO
    // CURRENT ROW — on purpose: equal prices aggregate as one range
    // group, so tie order between duplicate prices can never move the
    // crossing point (a ROWS frame would be partition-order-sensitive).
    // Weights are integer-valued quantities cast BIGINT: the cumsum is
    // exact integer arithmetic in both engines. Scale: parallelism = the
    // grouping key's cardinality (same single-reducer-per-group shape as
    // q_win_ntile_pct; ScalableNtile's range-repartition is the 100 TB
    // path for a low-cardinality key).
    "q_quantile_weighted" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val grp = Seq(col("l_returnflag"), col("l_linestatus"))
      val cum = Window.partitionBy(grp: _*).orderBy(col("l_extendedprice"))
      val tot = Window.partitionBy(grp: _*)
      Tables.t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_extendedprice"), col("l_quantity").cast("long").as("qty"))
        .select(col("l_returnflag"), col("l_linestatus"), col("l_extendedprice"),
          sum("qty").over(cum).as("cum_w"), sum("qty").over(tot).as("tot_w"))
        .filter(col("cum_w") * 2 >= col("tot_w"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(min("l_extendedprice").as("w_median"),
          max("tot_w").as("total_weight"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // relational pivot: daily × event_type count matrix. Spark's pivot
    // compiles to one pass of conditional aggregates (same plan as the
    // oracle's COUNT FILTER columns) — explicit value list so no extra
    // distinct-values job; pivot count yields NULL for absent cells where
    // FILTER yields 0, so coalesce pins the engines together
    "q_agg_pivot" -> ((s, dir) =>
      pivotDaily(s, dir)
        // null order pinned (Spark ASC = NULLS FIRST, DuckDB = NULLS LAST)
        .orderBy(col("day").asc_nulls_first)),

    // the inverse: melt the wide day × type matrix back to long form —
    // unpivot is a zero-shuffle per-row expansion (Expand node)
    "q_agg_unpivot" -> ((s, dir) =>
      pivotDaily(s, dir)
        .unpivot(Array(col("day")),
          eventTypes.map(t => col(s"n_$t")).toArray, "event_type", "n")
        .withColumn("event_type", expr("substring(event_type, 3)"))
        .orderBy(col("day").asc_nulls_first, col("event_type")))
  )

  val oracle: Map[String, String] = Map(
    "q_agg_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  $sumQty AS sum_qty,
         |  $sumBase AS sum_base,
         |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
         |             (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2)
         |       AS DOUBLE) AS sum_disc_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct_daily" ->
      """SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |  COUNT(DISTINCT user_id) AS uniq_users, COUNT(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    "q_agg_multi_distinct" ->
      """SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |  COUNT(DISTINCT user_id) AS uniq_users,
        |  COUNT(DISTINCT event_type) AS uniq_types,
        |  COUNT(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "q_agg_having" ->
      """SELECT p_brand, COUNT(*) AS cnt,
        |  CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_price
        |FROM part GROUP BY p_brand
        |HAVING COUNT(*) > 70 AND SUM(CAST(p_retailprice AS DECIMAL(18,2))) > COUNT(*) * 945
        |ORDER BY p_brand""".stripMargin,

    "q_agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, $sumQty AS sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_agg_cube" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, $sumQty AS sum_qty
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
        |  COUNT(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_quantile_exact" ->
      """SELECT o_orderpriority,
        |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_quantile_weighted" ->
      """WITH x AS (
        |  SELECT l_returnflag, l_linestatus, l_extendedprice,
        |    SUM(CAST(l_quantity AS BIGINT)) OVER (
        |      PARTITION BY l_returnflag, l_linestatus
        |      ORDER BY l_extendedprice) AS cum_w,
        |    SUM(CAST(l_quantity AS BIGINT)) OVER (
        |      PARTITION BY l_returnflag, l_linestatus) AS tot_w
        |  FROM lineitem)
        |SELECT l_returnflag, l_linestatus,
        |  MIN(l_extendedprice) AS w_median,
        |  CAST(MAX(tot_w) AS BIGINT) AS total_weight
        |FROM x WHERE cum_w * 2 >= tot_w
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
        |FROM events GROUP BY 1 ORDER BY day NULLS FIRST""".stripMargin,

    "q_agg_unpivot" -> {
      val arms = eventTypes.map(t =>
        s"SELECT day, '$t' AS event_type, n_$t AS n FROM p").mkString("\n  UNION ALL\n  ")
      s"""WITH p AS (
         |  SELECT CAST(ts AS DATE) AS day,
         |    ${eventTypes.map(t =>
              s"COUNT(*) FILTER (WHERE event_type = '$t') AS n_$t").mkString(",\n    ")}
         |  FROM events GROUP BY 1)
         |$arms
         |ORDER BY day NULLS FIRST, event_type""".stripMargin
    }
  )
}
