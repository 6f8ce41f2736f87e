package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.10 — event-stream operators, batch twins.
  *
  * Each query here is the deterministic batch formulation of a streaming
  * operator; graft.streaming.* runs the same logic through Structured
  * Streaming (`window`, `session_window`, `dropDuplicatesWithinWatermark`)
  * and the ScalaTest suites assert batch ≡ stream.
  *
  * Time arithmetic is pinned to integer microseconds (unix_micros on a
  * UTC-session cast), never seconds (Spark truncates, DuckDB doesn't) and
  * never double division (rounds the last µs digit).
  *
  * Scale notes: tumbling/sliding windows are plain groupBys (partial+final
  * agg); sliding assigns each event to its 2 windows via an exploded
  * offset array — row growth is the slide factor, bounded and local.
  * Sessionization is one shuffle on user_id + in-partition sort — the
  * standard distributed gap-sessionize; in streaming the same semantics
  * come from session_window state.
  */
object EventQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    "q_evt_tumbling_hourly" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          // decimal-exact sum; final DOUBLE cast so both engines serialize
          // the same float64 repr (see AggQueries header note)
          sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
            .cast("double").as("sum_value"))
        .orderBy("hour", "event_type")),

    "q_evt_sliding" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), unix_micros(col("ts").cast("timestamp")).as("us"))
        .select(col("event_type"), col("us"),
          explode(array(lit(0L), lit(1800000000L))).as("off"))
        .withColumn("wstart_us", expr("((us - off) div 3600000000) * 3600000000 + off"))
        .groupBy(expr("CAST(timestamp_micros(wstart_us) AS TIMESTAMP_NTZ)").as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("window_start", "event_type")),

    "q_evt_session_30min" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .withColumn("brk",
          when(col("us") - lag("us", 1).over(w) > 1800000000L, 1).otherwise(0))
        .withColumn("session_id", sum("brk").over(wrun).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          timestamp_micros(min("us")).cast("timestamp_ntz").as("session_start"),
          timestamp_micros(max("us")).cast("timestamp_ntz").as("session_end"))
        .orderBy("user_id", "session_id")
    }),

    // NATIVE session_window gap-sessionization — the Spark-first single-
    // operator form of q_evt_session_30min's two-window machinery (one
    // shuffle on user_id, sessions assigned by the merging session-agg
    // exec, same code path streaming uses). Boundary cross-proof: the
    // native window is half-open [start, last+gap), so a gap of EXACTLY
    // 30 min starts a NEW session — the oracle's break test is therefore
    // >= where the lag formulation uses >. Hash equality against
    // DuckDB's from-first-principles SQL proves the operator end to end.
    "q_evt_session_native" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"), col("ts").cast("timestamp").as("t"))
        .groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").cast("timestamp_ntz").as("session_start"),
          col("session_window.end").cast("timestamp_ntz").as("session_end"),
          col("n_events"))
        .orderBy("user_id", "session_start")),

    // time-series resample + linear interpolation: per-user daily means
    // on a dense day grid, gaps filled by interpolating between the
    // nearest known neighbors (no extrapolation past the ends). ALL
    // arithmetic is exact integer µ-units until one final LONG→DOUBLE
    // cast: daily mean = (2·Σvus + n) intdiv (2n) (half-up), and the
    // interpolated point is the convex combination
    // (pv·(ni−di) + nv·(di−pi)) over (ni−pi), half-up — every term is
    // ≥ 0 (events.value ≥ 0), so Spark's truncating `div` and DuckDB's
    // flooring `//` agree and no double ROUND tie can ever diverge
    // (the round(…,6)-on-double formulation flipped the 6th dp between
    // engines at sf0.001). Scale shape: grid = users × 30 days (linear
    // in users), two pass-windows per user — one shuffle on user_id.
    "q_evt_interpolate" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("user_id") < 30)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("vus"))
      val daily = ev.groupBy("user_id", "day")
        .agg(expr("(2 * sum(vus) + count(1)) div (2 * count(1))").as("v_us"))
      val grid = ev.select("user_id").distinct()
        .crossJoin(broadcast(ev.select("day").distinct()))
      val w = Window.partitionBy("user_id").orderBy("di")
      val wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid.join(daily, Seq("user_id", "day"), "left")
        .withColumn("di",
          datediff(col("day"), lit("2024-01-01").cast("date")).cast("long"))
        .withColumn("pv", last(col("v_us"), ignoreNulls = true).over(wp))
        .withColumn("pi", last(when(col("v_us").isNotNull, col("di")),
          ignoreNulls = true).over(wp))
        .withColumn("nv", first(col("v_us"), ignoreNulls = true).over(wn))
        .withColumn("ni", first(when(col("v_us").isNotNull, col("di")),
          ignoreNulls = true).over(wn))
        .filter(col("v_us").isNotNull ||
          (col("pv").isNotNull && col("nv").isNotNull))
        .select(col("user_id"), col("day"),
          (when(col("v_us").isNotNull, col("v_us"))
            .otherwise(expr(
              "(2 * (pv * (ni - di) + nv * (di - pi)) + (ni - pi))" +
                " div (2 * (ni - pi))"))
            .cast("double") / 1e6).as("value"),
          col("v_us").isNull.as("interpolated"))
        .orderBy("user_id", "day")
    }),

    // ordered conversion funnel view → click → purchase: each stage is the
    // user's FIRST qualifying event strictly after the previous stage.
    // All three aggregates and joins key on user_id — one partitioning
    // reused down the chain, and the per-user stage frames are aggregate-
    // small (≤ 1 row/user), so the joins broadcast at any corpus scale
    // where users ≪ events.
    "q_evt_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("v_us"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("us") > col("v_us"))
        .groupBy("user_id").agg(min("us").as("c_us"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("us") > col("c_us"))
        .groupBy("user_id").agg(min("us").as("p_us"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          timestamp_micros(col("v_us")).cast("timestamp_ntz").as("first_view"),
          timestamp_micros(col("c_us")).cast("timestamp_ntz").as("first_click"),
          timestamp_micros(col("p_us")).cast("timestamp_ntz").as("first_purchase"))
        .orderBy("user_id")
    }),

    // last-touch attribution: every click left-joined to the LATEST view
    // of the same user inside the trailing 30-minute window — the batch
    // twin of streaming.StreamOps.attributeClicks (leftOuter), proving
    // the same semantics both ways. The range join is bounded by the
    // attribution horizon (a user's views within 30 min), so pair growth
    // is horizon-local; the top-1 pick is a per-click window, shuffle
    // keyed on click_id. Unattributed clicks surface with null imp_id.
    "q_evt_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts").cast("timestamp")).as("us"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("event_id").as("imp_id"),
          col("us").as("v_us"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("us").as("c_us"))
      val w = Window.partitionBy("click_id")
        .orderBy(col("v_us").desc_nulls_last, col("imp_id").desc_nulls_last)
      c.join(v, col("user_id") === col("v_user") &&
          col("v_us") < col("c_us") &&
          col("c_us") <= col("v_us") + lit(1800000000L), "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("click_id"), col("user_id"), col("imp_id"),
          (col("c_us") - col("v_us")).as("gap_us"))
        .orderBy("click_id")
    }),

    // cohort retention: users grouped by first-seen day, counted per
    // day-offset of later activity — two aggregates over the same
    // user_id shuffle plus a per-user join (broadcast-small right side)
    // ONE wide shuffle: per-user active-day sets collected in a single
    // keyed aggregate (collect_set partial-aggregates map-side, so the
    // exchange carries ~distinct (user, day) volume, not the event
    // stream), cohort = array_min of the same set — the former
    // scan-twice + self-join shape paid the event scan and the user
    // shuffle twice for the same answer. The per-user set is bounded by
    // the day horizon (the retention window itself), never stream length.
    "q_evt_retention" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
        .groupBy("user_id").agg(collect_set(col("day")).as("days"))
        .select(array_min(col("days")).as("cohort_day"), explode(col("days")).as("day"))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long").as("offset_days"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "offset_days")),

    // hour-of-week seasonality matrix: (ISO weekday, hour) cell counts +
    // decimal-exact value sums — weekday numbering pinned to ISO
    // (Spark weekday() is 0=Monday, DuckDB isodow 1=Monday; +1 aligns)
    "q_evt_seasonality" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy((weekday(col("ts").cast("timestamp")) + 1).as("iso_dow"),
          hour(col("ts").cast("timestamp")).as("hr"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
            .cast("double").as("sum_value"))
        .orderBy("iso_dow", "hr")),

    // DAU / trailing-7-day WAU / stickiness per day. Scale shape: each
    // (user, active day) row EXPLODES to the 7 report days it supports —
    // equi-keyed shuffles only, never a day-range join (the range join
    // re-scans the activity table per report day; the explode is the
    // standard contribution-table formulation). Report days are
    // restricted to days with any activity (dau inner join).
    "q_evt_dau_wau" -> ((s, dir) => {
      val ud = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
        .distinct()
      val dau = ud.groupBy("day").agg(countDistinct("user_id").as("dau"))
      val wau = ud
        .select(col("user_id"),
          explode(expr("sequence(day, date_add(day, 6))")).as("day"))
        .groupBy("day").agg(countDistinct("user_id").as("wau"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
        .orderBy("day")
    }),

    // conversion lag: each user's first view and the first purchase at or
    // after it, lag in exact integer microseconds — the sequential-
    // pattern measure a growth team reads next to the funnel; two keyed
    // aggregates + one user-keyed join, no windows
    "q_evt_conversion_lag" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
      val firstView = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("v_us"))
      ev.filter(col("event_type") === "purchase")
        .join(firstView, "user_id")
        .filter(col("us") >= col("v_us"))
        .groupBy("user_id", "v_us").agg(min("us").as("p_us"))
        .select(col("user_id"), col("v_us"), col("p_us"),
          (col("p_us") - col("v_us")).as("lag_us"))
        .orderBy("user_id")
    }),

    // first-order Markov transition matrix over per-user event sequences:
    // lead() over the (µs, event_id) total order (the q_evt_paths
    // ordering), then transition counts and row-normalized probabilities
    // — the 25-cell model a journey/anomaly analysis reads off. The
    // probability is an integer-ratio division, exact in both engines.
    "q_evt_markov" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val pw = Window.partitionBy("event_type")
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy("event_type", "next_type").agg(count(lit(1)).as("cnt"))
        .withColumn("p", round(col("cnt").cast("double") / sum("cnt").over(pw), 6))
        .orderBy("event_type", "next_type")
    }),

    // z-score anomaly profile per event_type: one stats aggregate joined
    // back (broadcast-small), outliers counted on the ROUNDED z so the
    // threshold compares identical float64 in both engines
    "q_evt_anomaly" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val stats = ev.groupBy("event_type")
        .agg(avg("value").as("mu"), stddev_samp("value").as("sigma"))
      ev.join(broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          round(first(col("mu")), 6).as("mean_value"),
          round(first(col("sigma")), 6).as("sd_value"),
          count(when(abs(round((col("value") - col("mu")) / col("sigma"), 6)) > 3, 1))
            .as("n_outliers"))
        .orderBy("event_type")
    }),

    // RFM segmentation: per purchasing user, Recency (days since last
    // purchase vs the corpus' latest purchase day), Frequency (purchase
    // count), Monetary (decimal-exact value sum), each scored into
    // quintiles. Ties in every ntile ordering are broken by user_id so the
    // quintile boundaries are engine-independent; monetary is an exact
    // 2-dp decimal rendered as double, so its sort order can't diverge.
    // Scale shape: the event stream reduces to ONE row per user, then
    // the three quintiles run through ScalableNtile's range-partitioned
    // rank (s_win_ntile_scalable's machinery) — no single-reducer
    // window anywhere.
    "q_evt_rfm" -> ((s, dir) => {
      val p = Tables.events(s, dir)
        .filter(col("event_type") === "purchase" &&
          col("ts").isNotNull && col("user_id").isNotNull)
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast("date").as("day"), col("value"))
      val per = p.groupBy("user_id").agg(
        max("day").as("last_day"),
        count(lit(1)).as("frequency"),
        coalesce(sum(col("value").cast("decimal(18,2)")),
          lit(0).cast("decimal(18,2)"))
          .cast("decimal(18,2)").cast("double").as("monetary"))
      val ref = p.agg(max("day").as("ref_day"))
      // the three quintile scorings run through ScalableNtile's range-
      // partitioned zipWithIndex rank (r12, VERDICT r11: three chained
      // EMPTY-partition ntile windows moved every user through ONE
      // reducer three times — the q_win_ntile_pct single-reducer class
      // this repo's own ScalableNtile exists to replace). The per-user
      // base checkpoints once (|users| rows) so the three rank jobs and
      // the join-back read it without recomputing the event scan;
      // bucket arithmetic is ntile's closed form, so scores — and the
      // oracle hash — are bit-identical to the window formulation.
      val base = per.crossJoin(broadcast(ref))
        .withColumn("recency_days",
          datediff(col("ref_day"), col("last_day")).cast("long"))
        .select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary"))
        .localCheckpoint()
      import graft.operators.ScalableNtile.ntileBy
      // one count of the checkpointed base serves all three scorings
      // (r17: each ntileBy ran its own count job over the same frame)
      val nUsers = Some(base.count())
      val rs = ntileBy(base, "user_id", 5,
        Seq(col("recency_days").asc, col("user_id")), "r_l", nOpt = nUsers)
      val fs = ntileBy(base, "user_id", 5,
        Seq(col("frequency").desc, col("user_id")), "f_l", nOpt = nUsers)
      val ms = ntileBy(base, "user_id", 5,
        Seq(col("monetary").desc, col("user_id")), "m_l", nOpt = nUsers)
      base.join(rs, "user_id").join(fs, "user_id").join(ms, "user_id")
        .select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary"),
          col("r_l").cast("int").as("r_score"),
          col("f_l").cast("int").as("f_score"),
          col("m_l").cast("int").as("m_score"))
        .withColumn("rfm",
          (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
            .cast("int"))
        .orderBy("user_id")
    }),

    // bounce/depth per day: gap-sessionize (the q_evt_session_30min
    // machinery), then per session-start day count sessions, one-event
    // "bounce" sessions, bounce rate and mean session depth — the
    // engagement roll-up read next to DAU/WAU. Ratios are rounded
    // integer-over-integer divisions, exact in both engines.
    "q_evt_bounce" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        // null filter pinned in BOTH engines (ADVICE r8): Spark window
        // sorts put NULLS FIRST, DuckDB NULLS LAST — a regenerated
        // fixture containing NULL ts/user_id would silently diverge
        // session assignment (the sibling q_evt_rfm already pins this)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .withColumn("brk",
          when(col("us") - lag("us", 1).over(w) > 1800000000L, 1).otherwise(0))
        .withColumn("session_id", sum("brk").over(wrun))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), min("us").as("start_us"))
        .groupBy(timestamp_micros(col("start_us")).cast("timestamp_ntz")
          .cast("date").as("day"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1).otherwise(0)).cast("long")
            .as("n_bounce"),
          sum("n_events").as("tot_events"))
        .select(col("day"), col("n_sessions"), col("n_bounce"),
          round(col("n_bounce").cast("double") / col("n_sessions"), 6)
            .as("bounce_rate"),
          round(col("tot_events").cast("double") / col("n_sessions"), 6)
            .as("avg_depth"))
        .orderBy("day")
    }),

    "q_evt_dedup_minute" -> ((s, dir) =>
      // explicit null filter: Spark's multi-arg countDistinct drops rows
      // with any NULL while DuckDB's tuple-DISTINCT would count them —
      // pinning the filter makes both engines see identical inputs
      Tables.events(s, dir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .agg(count(lit(1)).as("n_before"),
          countDistinct(col("user_id"), date_trunc("minute", col("ts"))).as("n_after")))
  )

  val oracle: Map[String, String] = Map(
    "q_evt_tumbling_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
        |  COUNT(*) AS cnt,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "q_evt_sliding" ->
      """WITH ev AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type FROM events),
        |w AS (SELECT event_type,
        |        ((us - off) // 3600000000) * 3600000000 + off AS wstart_us
        |      FROM ev, (VALUES (CAST(0 AS BIGINT)), (CAST(1800000000 AS BIGINT))) AS o(off))
        |SELECT make_timestamp(wstart_us) AS window_start, event_type, COUNT(*) AS cnt
        |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "q_evt_session_30min" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |flagged AS (SELECT user_id, event_id, us,
        |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |              > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM ev),
        |sess AS (SELECT user_id, event_id, us,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
        |  make_timestamp(MIN(us)) AS session_start,
        |  make_timestamp(MAX(us)) AS session_end
        |FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    "q_evt_session_native" ->
      """WITH ev AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |flagged AS (SELECT user_id, us,
        |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |              >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM ev),
        |sess AS (SELECT user_id, us,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, make_timestamp(MIN(us)) AS session_start,
        |  make_timestamp(MAX(us) + 1800000000) AS session_end,
        |  COUNT(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q_evt_interpolate" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vus
        |  FROM events WHERE user_id < 30),
        |daily AS (
        |  SELECT user_id, day,
        |    (2 * SUM(vus) + COUNT(*)) // (2 * COUNT(*)) AS v_us
        |  FROM ev GROUP BY user_id, day),
        |grid AS (
        |  SELECT u.user_id, d.day
        |  FROM (SELECT DISTINCT user_id FROM ev) u,
        |       (SELECT DISTINCT day FROM ev) d),
        |j AS (
        |  SELECT g.user_id, g.day, daily.v_us,
        |    date_diff('day', DATE '2024-01-01', g.day) AS di
        |  FROM grid g LEFT JOIN daily
        |    ON g.user_id = daily.user_id AND g.day = daily.day),
        |x AS (
        |  SELECT user_id, day, v_us, di,
        |    last_value(v_us IGNORE NULLS) OVER wp AS pv,
        |    last_value(CASE WHEN v_us IS NOT NULL THEN di END IGNORE NULLS)
        |      OVER wp AS pi,
        |    first_value(v_us IGNORE NULLS) OVER wn AS nv,
        |    first_value(CASE WHEN v_us IS NOT NULL THEN di END IGNORE NULLS)
        |      OVER wn AS ni
        |  FROM j
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY di
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wn AS (PARTITION BY user_id ORDER BY di
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, day,
        |  CAST(CASE WHEN v_us IS NOT NULL THEN v_us
        |       ELSE (2 * (pv * (ni - di) + nv * (di - pi)) + (ni - pi))
        |            // (2 * (ni - pi)) END AS DOUBLE) / 1e6 AS value,
        |  (v_us IS NULL) AS interpolated
        |FROM x
        |WHERE v_us IS NOT NULL OR (pv IS NOT NULL AND nv IS NOT NULL)
        |ORDER BY user_id, day""".stripMargin,

    "q_evt_funnel" ->
      """WITH ev AS (SELECT user_id, event_type,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |v AS (SELECT user_id, MIN(us) AS v_us FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(us) AS c_us FROM ev e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND us > v_us GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(us) AS p_us FROM ev e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND us > c_us GROUP BY 1)
        |SELECT v.user_id, make_timestamp(v_us) AS first_view,
        |  make_timestamp(c_us) AS first_click,
        |  make_timestamp(p_us) AS first_purchase
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,

    "q_evt_attribution" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |v AS (SELECT user_id AS v_user, event_id AS imp_id, us AS v_us
        |      FROM ev WHERE event_type = 'view'),
        |c AS (SELECT user_id, event_id AS click_id, us AS c_us
        |      FROM ev WHERE event_type = 'click')
        |SELECT c.click_id, c.user_id, t.imp_id, t.gap_us
        |FROM c LEFT JOIN LATERAL (
        |  SELECT v.imp_id, c.c_us - v.v_us AS gap_us FROM v
        |  WHERE v.v_user = c.user_id AND v.v_us < c.c_us
        |    AND c.c_us <= v.v_us + 1800000000
        |  ORDER BY v.v_us DESC, v.imp_id DESC LIMIT 1) t ON TRUE
        |ORDER BY click_id""".stripMargin,

    "q_evt_retention" ->
      """WITH ev AS (SELECT user_id,
        |              CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        |            FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, day FROM ev)
        |SELECT cohort_day,
        |  CAST(date_diff('day', cohort_day, day) AS BIGINT) AS offset_days,
        |  COUNT(*) AS n_users
        |FROM act JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, offset_days""".stripMargin,

    "q_evt_seasonality" ->
      """SELECT CAST(isodow(CAST(ts AS TIMESTAMP)) AS INT) AS iso_dow,
        |  CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hr,
        |  COUNT(*) AS cnt,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
        |    AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY iso_dow, hr""".stripMargin,

    "q_evt_dau_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |              CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        |            FROM events),
        |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
        |contrib AS (SELECT ud.user_id, CAST(g.d AS DATE) AS day
        |            FROM ud, unnest(generate_series(ud.day, ud.day + INTERVAL 6 DAY,
        |                                            INTERVAL 1 DAY)) AS g(d)),
        |wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau FROM contrib GROUP BY 1)
        |SELECT dau.day, dau.dau, wau.wau,
        |  ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
        |FROM dau JOIN wau ON dau.day = wau.day
        |ORDER BY dau.day""".stripMargin,

    "q_evt_conversion_lag" ->
      """WITH ev AS (SELECT user_id, event_type,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |fv AS (SELECT user_id, MIN(us) AS v_us FROM ev
        |       WHERE event_type = 'view' GROUP BY 1)
        |SELECT ev.user_id, fv.v_us, MIN(ev.us) AS p_us,
        |  MIN(ev.us) - fv.v_us AS lag_us
        |FROM ev JOIN fv ON ev.user_id = fv.user_id
        |WHERE ev.event_type = 'purchase' AND ev.us >= fv.v_us
        |GROUP BY ev.user_id, fv.v_us
        |ORDER BY ev.user_id""".stripMargin,

    "q_evt_markov" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |seq AS (SELECT event_type,
        |          lead(event_type, 1) OVER (PARTITION BY user_id
        |                                    ORDER BY us, event_id) AS next_type
        |        FROM ev),
        |c AS (SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, cnt,
        |  ROUND(CAST(cnt AS DOUBLE) / SUM(cnt) OVER (PARTITION BY event_type), 6) AS p
        |FROM c ORDER BY event_type, next_type""".stripMargin,

    "q_evt_anomaly" ->
      """WITH ev AS (SELECT event_type, value FROM events),
        |stats AS (SELECT event_type, AVG(value) AS mu,
        |            stddev_samp(value) AS sigma
        |          FROM ev GROUP BY 1)
        |SELECT e.event_type, COUNT(*) AS n_events,
        |  ROUND(ANY_VALUE(mu), 6) AS mean_value,
        |  ROUND(ANY_VALUE(sigma), 6) AS sd_value,
        |  COUNT(*) FILTER (WHERE abs(ROUND((value - mu) / sigma, 6)) > 3) AS n_outliers
        |FROM ev e JOIN stats s USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q_evt_rfm" ->
      """WITH p AS (SELECT user_id,
        |             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |             value
        |           FROM events
        |           WHERE event_type = 'purchase'
        |             AND ts IS NOT NULL AND user_id IS NOT NULL),
        |per AS (SELECT user_id, MAX(day) AS last_day,
        |          CAST(COUNT(*) AS BIGINT) AS frequency,
        |          CAST(CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2))), 0)
        |               AS DECIMAL(18,2)) AS DOUBLE) AS monetary
        |        FROM p GROUP BY 1),
        |ref AS (SELECT MAX(day) AS ref_day FROM p),
        |sc AS (SELECT user_id,
        |         CAST(date_diff('day', last_day, ref_day) AS BIGINT) AS recency_days,
        |         frequency, monetary
        |       FROM per, ref),
        |scored AS (SELECT user_id, recency_days, frequency, monetary,
        |    CAST(ntile(5) OVER (ORDER BY recency_days ASC, user_id) AS INT) AS r_score,
        |    CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS INT) AS f_score,
        |    CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id) AS INT) AS m_score
        |  FROM sc)
        |SELECT user_id, recency_days, frequency, monetary,
        |  r_score, f_score, m_score,
        |  CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm
        |FROM scored ORDER BY user_id""".stripMargin,

    "q_evt_bounce" ->
      """WITH ev AS (SELECT user_id, event_id,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
        |            WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |flagged AS (SELECT user_id, event_id, us,
        |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |              > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM ev),
        |sess AS (SELECT user_id, us,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged),
        |agg AS (SELECT user_id, session_id, COUNT(*) AS n_events, MIN(us) AS start_us
        |        FROM sess GROUP BY 1, 2),
        |byday AS (SELECT CAST(date_trunc('day', make_timestamp(start_us)) AS DATE) AS day,
        |            CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |            CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
        |            CAST(SUM(n_events) AS BIGINT) AS tot_events
        |          FROM agg GROUP BY 1)
        |SELECT day, n_sessions, n_bounce,
        |  ROUND(CAST(n_bounce AS DOUBLE) / n_sessions, 6) AS bounce_rate,
        |  ROUND(CAST(tot_events AS DOUBLE) / n_sessions, 6) AS avg_depth
        |FROM byday ORDER BY day""".stripMargin,

    "q_evt_dedup_minute" ->
      """SELECT COUNT(*) AS n_before,
        |  COUNT(DISTINCT (user_id, date_trunc('minute', CAST(ts AS TIMESTAMP)))) AS n_after
        |FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL""".stripMargin
  )
}
