package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 — window functions.
  *
  * Scale notes: all partitioned windows shuffle once on the partition key
  * and sort within partitions — the scalable shape. For rank-filter
  * top-k, Catalyst's InferWindowGroupLimit already inserts a two-phase
  * WindowGroupLimit (partial before the shuffle, final after), so only
  * ~k rows per key per partition shuffle — verified in the q_win_rank_topn
  * plan; no custom rule needed. `q_win_ntile_pct` uses a single global
  * window; that is inherently single-reducer, fine for a 150k-row orders
  * table but at 100 TB the decile assignment would switch to
  * `approx_percentile`-derived cut points joined back broadcast-style.
  */
object WindowQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    "q_win_rank_topn" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rk"),
          dense_rank().over(w).cast("long").as("drk"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    "q_win_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val us = unix_micros(col("ts").cast("timestamp"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          (us - lag(us, 1).over(w)).as("gap_us"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy("user_id", "event_id")
    }),

    // gaps-and-islands: per-user consecutive-active-day streaks via the
    // classic daynum − row_number() island key (constant within a run of
    // consecutive days, jumps across a gap); one shuffle on user_id,
    // streak rows keyed by their (unique per user) start date
    "q_win_streaks" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("day")
      Tables.events(s, dir)
        .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
        .distinct()
        .withColumn("grp",
          datediff(col("day"), lit("1992-01-01")) - row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(min("day").as("streak_start"), count(lit(1)).as("streak_len"))
        .select(col("user_id"), col("streak_start"), col("streak_len"))
        .orderBy("user_id", "streak_start")
    }),

    // LOCF gap-fill (last observation carried forward): a sparse reading
    // (every 3rd event keeps its value — deterministic construction) is
    // filled per user from the latest earlier observation via
    // last(..., ignoreNulls) over a running frame; rows before any
    // observation stay NULL. The standard time-series repair operator —
    // one shuffle keyed on user_id.
    "q_win_locf" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"),
          when(col("event_id") % 3 === 0, col("value")).as("sparse"))
        .withColumn("filled", last("sparse", ignoreNulls = true).over(w))
        .select(col("user_id"), col("event_id"), col("sparse"), col("filled"))
        .orderBy("user_id", "event_id")
    }),

    "q_win_frame_running" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("decimal(18,2)").cast("double").as("cum_rev"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // r14: the contract row itself now runs the scalable formulation —
    // ScalableNtile.ntilePct (range-repartitioned global rank, closed-
    // form ntile/percent_rank arithmetic), row-identical to the
    // single-reducer `ntile(10) OVER (ORDER BY …)` window it replaces
    // (the equivalence ScalableNtileSpec has pinned since r2, and the
    // oracle hash is unchanged). The registry is now uwin-free with NO
    // exemptions (PlanSpec).
    "q_win_ntile_pct" -> ((s, dir) =>
      graft.operators.ScalableNtile.ntilePct(Tables.t(s, dir, "orders"), 10)),

    // navigation over the full partition frame: first/last/nth under a
    // deterministic order (unique (o_orderdate, o_orderkey) tie-break);
    // nth_value is NULL for partitions shorter than n in both engines
    "q_win_first_last" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_ok"),
          last(col("o_orderkey")).over(w).as("last_ok"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // value-range frame (vs q_win_frame_running's row frame): trailing
    // 1-hour rolling sum per user, ordered by event-time microseconds so
    // both engines bound the frame on identical integers (peers with equal
    // timestamps enter together — RANGE semantics, matched cross-engine)
    "q_win_frame_range" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("tus"))
        .rangeBetween(-3600000000L, 0)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("tus"), col("value"))
        .withColumn("roll_value",
          sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("decimal(18,2)").cast("double"))
        .select(col("user_id"), col("event_id"), col("roll_value"))
        .orderBy("user_id", "event_id")
    }),

    // distribution ranks within each nation: percent_rank/cume_dist are
    // rank-derived, so ties in c_acctbal yield identical values under any
    // secondary order — deterministic without a unique sort key in the
    // window itself (the OUTPUT sort is the unique c_custkey)
    "q_win_cume_dist" -> ((s, dir) => {
      val w = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
      Tables.t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cum_dist"))
        .orderBy("c_custkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_win_rank_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER w AS BIGINT) AS rn,
        |    CAST(rank() OVER w AS BIGINT) AS rk,
        |    CAST(dense_rank() OVER w AS BIGINT) AS drk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)) sub
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_win_lag_lead" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT user_id, event_id,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
        |  lead(event_type) OVER w AS next_type
        |FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_win_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        |           FROM events),
        |g AS (SELECT user_id, day,
        |        date_diff('day', DATE '1992-01-01', day)
        |          - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |      FROM d)
        |SELECT user_id, MIN(day) AS streak_start,
        |  CAST(COUNT(*) AS BIGINT) AS streak_len
        |FROM g GROUP BY user_id, grp
        |ORDER BY user_id, streak_start""".stripMargin,

    "q_win_locf" ->
      """WITH ev AS (SELECT user_id, event_id,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |              CASE WHEN event_id % 3 = 0 THEN value END AS sparse
        |            FROM events)
        |SELECT user_id, event_id, sparse,
        |  last_value(sparse IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM ev ORDER BY user_id, event_id""".stripMargin,

    "q_win_frame_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS DECIMAL(18,2)) AS DOUBLE) AS cum_rev
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_ntile_pct" ->
      """SELECT o_orderkey,
        |  CAST(ntile(10) OVER w AS BIGINT) AS decile,
        |  ROUND(percent_rank() OVER w, 6) AS pct
        |FROM orders WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_win_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER w AS last_ok,
        |  nth_value(o_orderkey, 2) OVER w AS second_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_frame_range" ->
      """WITH ev AS (SELECT user_id, event_id,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS tus, value
        |            FROM events)
        |SELECT user_id, event_id,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))
        |            OVER (PARTITION BY user_id ORDER BY tus
        |                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |            AS DECIMAL(18,2)) AS DOUBLE) AS roll_value
        |FROM ev ORDER BY user_id, event_id""".stripMargin,

    "q_win_cume_dist" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |  ROUND(percent_rank() OVER w, 6) AS pct_rank,
        |  ROUND(cume_dist() OVER w, 6) AS cum_dist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
        |ORDER BY c_custkey""".stripMargin
  )
}
