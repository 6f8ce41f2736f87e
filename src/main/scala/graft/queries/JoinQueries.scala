package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 — joins.
  *
  * Scale notes per query:
  *  - inner/theta joins on (l_orderkey, o_orderkey): co-partitioned shuffle
  *    joins; at 100 TB pre-bucket both fact tables on orderkey so the
  *    exchange disappears.
  *  - dimension joins (`part`, `region`, `nation`, probe lists) are
  *    explicitly `broadcast()` — no shuffle of the fact side, ever.
  *  - the as-of join is equi+range plus a per-key top-1 window, the
  *    standard distributed formulation (no native as-of in Spark); the
  *    probe side is broadcast.
  */
object JoinQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    "q_join_inner_equi" -> ((s, dir) => {
      val c = Tables.t(s, dir, "customer")
      val o = Tables.t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .groupBy(c("c_custkey"), c("c_name"))
        .agg(sum(o("o_totalprice").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(10)
    }),

    "q_join_broadcast_dim" -> ((s, dir) => {
      val l = Tables.t(s, dir, "lineitem")
      val p = broadcast(Tables.t(s, dir, "part"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .filter(p("p_size") > 40 && l("l_quantity") < 10)
        .groupBy(p("p_brand"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("p_brand")
    }),

    "q_join_left_outer" -> ((s, dir) => {
      val c = Tables.t(s, dir, "customer")
      val big = Tables.t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left")
        .filter(big("o_orderkey").isNull)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("c_mktsegment")
    }),

    "q_join_full_outer" -> ((s, dir) => {
      val ck = Tables.t(s, dir, "customer").select(col("c_custkey").as("ck")).distinct()
      val ek = Tables.events(s, dir).select(col("user_id").as("ek")).distinct()
      ck.join(ek, col("ck") === col("ek"), "full_outer")
        .select(
          when(col("ck").isNotNull && col("ek").isNotNull, "both")
            .when(col("ck").isNotNull, "customer_only")
            .otherwise("events_only").as("presence"))
        .groupBy("presence")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("presence")
    }),

    "q_join_semi" -> ((s, dir) => {
      val c = Tables.t(s, dir, "customer")
      val bigo = Tables.t(s, dir, "orders").filter(col("o_totalprice") > 450000)
      c.join(bigo, c("c_custkey") === bigo("o_custkey"), "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(50)
    }),

    "q_join_anti" -> ((s, dir) => {
      val c = Tables.t(s, dir, "customer")
      val ev = Tables.events(s, dir)
      c.join(ev, c("c_custkey") === ev("user_id"), "left_anti")
        .agg(count(lit(1)).as("cnt"))
    }),

    "q_join_theta_range" -> ((s, dir) => {
      val l = Tables.t(s, dir, "lineitem")
      val o = Tables.t(s, dir, "orders")
      l.join(o, l("l_orderkey") === o("o_orderkey") && l("l_shipdate") > o("o_orderdate"))
        .groupBy(year(o("o_orderdate")).cast("long").as("order_year"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("order_year")
    }),

    // interval OVERLAP join: each nation's 20-day promo window vs each
    // order's 7-day fulfillment window — equi-key (nationkey) carries the
    // join, the two-sided interval predicate rides as the residual, so
    // the plan stays a broadcast hash join, never a cartesian (the
    // production shape for calendar-window joins; at 100 TB bucket both
    // sides by day to bound the residual's fan-in)
    "q_join_interval_overlap" -> ((s, dir) => {
      val promo = Tables.t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"),
          expr("date_add(DATE '1995-01-01', CAST(n_nationkey * 10 AS INT))").as("p_start"))
        .withColumn("p_end", expr("date_add(p_start, 20)"))
      val o = Tables.t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate").cast("date").as("od"))
      val c = Tables.t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(promo),
          col("c_nationkey") === col("n_nationkey") &&
            col("od") < col("p_end") && col("p_start") < expr("date_add(od, 7)"))
        .groupBy("n_name", "p_start")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("n_name")
    }),

    "q_join_cross" -> ((s, dir) => {
      val r = Tables.t(s, dir, "region")
      val n = Tables.t(s, dir, "nation")
      r.crossJoin(broadcast(n))
        .select(col("r_name"), col("n_name"),
          concat_ws("-", col("r_name"), col("n_name")).as("label"))
        .orderBy("r_name", "n_name")
    }),

    "q_join_supplier_rollup" -> ((s, dir) => {
      val l = Tables.t(s, dir, "lineitem")
      val sup = broadcast(Tables.t(s, dir, "supplier"))
      val n = broadcast(Tables.t(s, dir, "nation"))
      l.join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(n, sup("s_nationkey") === n("n_nationkey"))
        .groupBy(n("n_name"))
        .agg(count(lit(1)).as("cnt"),
          sum(l("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)")
            .cast("double").as("sum_qty"))
        .orderBy("n_name")
    }),

    // sketch-planned join (operators.JoinPlanner): NO hand hint — the
    // strategy comes from per-side (rows, bytes, CMS-over-key) stats,
    // here broadcasting the orders build side. The oracle is the PLAIN
    // join: whatever the ladder picks must be semantics-preserving.
    // JoinPlannerSpec pins the strategy choices (incl. the CMS blowup
    // veto flipping SHUFFLE_HASH → SMJ on size-identical inputs).
    "q_join_auto_planned" -> ((s, dir) => {
      val l = Tables.t(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"),
          col("l_quantity").cast("decimal(18,2)").as("qty"))
      val o = Tables.t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("k"), col("o_orderpriority"))
      graft.operators.JoinPlanner.autoJoin(l, o, Seq("k"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(col("qty")).cast("decimal(18,2)").cast("double").as("sum_qty"))
        .orderBy("o_orderpriority")
    }),

    // skew-salted shuffle join: the fact side tags a deterministic
    // content-derived salt (l_orderkey % 8 — retry-safe, no rand()), the
    // dim side replicates once per salt via explode, and the join key
    // becomes (partkey, salt) so one hot partkey spreads over 8 shuffle
    // partitions instead of one straggler. shuffle_hash hint keeps the
    // join on the exchange path the pattern exists for (broadcast would
    // make salting a no-op). The oracle is the PLAIN join — proving the
    // salted plan is semantics-preserving is the point of the query.
    "q_join_skew_salted" -> ((s, dir) => {
      val r = 8
      val l = Tables.t(s, dir, "lineitem")
        .select(col("l_partkey"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
            .as("rev_x"),
          (col("l_orderkey") % r).cast("int").as("salt"))
      val p = Tables.t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"),
          explode(sequence(lit(0), lit(r - 1))).as("salt"))
      l.hint("shuffle_hash")
        .join(p, l("l_partkey") === p("p_partkey") && l("salt") === p("salt"))
        .groupBy(p("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("rev_x")).cast("decimal(18,2)").cast("double").as("revenue"))
        .orderBy("p_brand")
    }),

    // Bloom semi-join reduction (operators.BloomJoin): the BUILDING
    // segment's custkeys fold into one broadcast bit array that deletes
    // non-matching orders AT THE SCAN, before the exchange — the fact
    // side shuffles ~1/5 of its rows (plus ~0.8% false positives the
    // exact join then clears). shuffle_hash models the dim-too-big-to-
    // broadcast regime the reduction exists for; the oracle is the
    // PLAIN join — the point is proving the reduction is semantics-
    // preserving. BloomJoinSpec weighs the shuffle bytes it deletes.
    "q_join_bloom_reduce" -> ((s, dir) => {
      val cust = Tables.t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val fact = Tables.t(s, dir, "orders")
        .select(col("o_custkey").as("c_custkey"),
          col("o_totalprice"), col("o_orderdate"))
      graft.operators.BloomJoin
        .reduce(fact, cust, col("c_custkey"), col("c_custkey"))
        .hint("shuffle_hash")
        .join(cust, Seq("c_custkey"))
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(18,2)")
            .cast("double").as("revenue"))
        .orderBy("month")
    }),

    "q_join_asof" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("user_id") < 50)
        .select("event_id", "ts", "user_id", "event_type")
      val probes = s.range(1).select(explode(expr(
        "array(to_timestamp_ntz('2024-01-08 00:00:00')," +
          " to_timestamp_ntz('2024-01-15 12:00:00')," +
          " to_timestamp_ntz('2024-01-25 06:30:00'))")).as("probe_ts"))
      val w = Window.partitionBy(col("probe_ts"), col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      broadcast(probes).join(ev, col("ts") <= col("probe_ts"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("probe_ts", "user_id", "event_id", "ts", "event_type")
        .orderBy("probe_ts", "user_id")
    }),

    // NEAREST-event as-of variant (either direction): pick per (probe,
    // user) the event minimizing exact integer |Δµs| (event_id
    // tie-break) via the TopKPerKey custom plan at k=1 — map-side
    // per-key heaps prune to ONE candidate per (probe, user) per
    // partition before the exchange, and nothing ever sorts the
    // probes×events candidate stream (the round-5 row_number window
    // sorted all of it per key — the flagged 100× bottleneck; min_by
    // with a struct ordering was tried and falls back to SortAggregate,
    // which re-sorts the same stream by group key). ord = −|Δµs| (top-1
    // by max ord = nearest; |Δµs| ≤ ~2.6e12 is double-exact), tie =
    // event_id ascending. The packed group key is exact here (user_id
    // < 50 by the query's filter, 3 distinct probes); a hash-derived
    // key would risk silent collisions. The 3-row probe side broadcasts.
    "q_join_asof_nearest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("user_id") < 50)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
      val probes = s.range(1).select(explode(expr(
        "array(to_timestamp_ntz('2024-01-08 00:00:00')," +
          " to_timestamp_ntz('2024-01-15 12:00:00')," +
          " to_timestamp_ntz('2024-01-25 06:30:00'))")).as("probe_ts"))
        .withColumn("p_us", unix_micros(col("probe_ts").cast("timestamp")))
      val cand = broadcast(probes).crossJoin(ev)
        .withColumn("grp", col("p_us") * 1000 + col("user_id"))
        .withColumn("neg_d", -abs(col("us") - col("p_us")).cast("double"))
      graft.plans.GraftTopK.perKey(cand, "grp", "neg_d", "event_id", 1)
        .select(col("probe_ts"), col("user_id"), col("event_id"), col("ts"),
          col("event_type"), abs(col("us") - col("p_us")).as("delta_us"))
        .orderBy("probe_ts", "user_id")
    })
  )

  val oracle: Map[String, String] = Map(
    // the PLAIN join — the sketch-planned strategy must preserve it
    "q_join_auto_planned" ->
      """SELECT o.o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_join_bloom_reduce" ->
      """SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_join_inner_equi" ->
      """SELECT c.c_custkey, c.c_name,
        |  CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_custkey, c.c_name
        |ORDER BY revenue DESC, c.c_custkey LIMIT 10""".stripMargin,

    "q_join_broadcast_dim" ->
      """SELECT p.p_brand, COUNT(*) AS cnt
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_size > 40 AND l.l_quantity < 10
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin,

    "q_join_left_outer" ->
      """SELECT c.c_mktsegment, COUNT(*) AS cnt
        |FROM customer c
        |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
        |  ON c.c_custkey = o.o_custkey
        |WHERE o.o_orderkey IS NULL
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,

    "q_join_full_outer" ->
      """WITH c AS (SELECT DISTINCT c_custkey AS ck FROM customer),
        |     e AS (SELECT DISTINCT user_id AS ek FROM events)
        |SELECT CASE WHEN ck IS NOT NULL AND ek IS NOT NULL THEN 'both'
        |            WHEN ck IS NOT NULL THEN 'customer_only'
        |            ELSE 'events_only' END AS presence,
        |       COUNT(*) AS cnt
        |FROM c FULL JOIN e ON c.ck = e.ek
        |GROUP BY 1 ORDER BY presence""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
        |ORDER BY c_custkey LIMIT 50""".stripMargin,

    "q_join_anti" ->
      """SELECT COUNT(*) AS cnt FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)""".stripMargin,

    "q_join_interval_overlap" ->
      """WITH promo AS (
        |  SELECT n_nationkey, n_name,
        |    DATE '1995-01-01' + CAST(n_nationkey * 10 AS INT) AS p_start,
        |    DATE '1995-01-01' + CAST(n_nationkey * 10 + 20 AS INT) AS p_end
        |  FROM nation)
        |SELECT p.n_name, p.p_start, COUNT(*) AS n_orders
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN promo p ON c.c_nationkey = p.n_nationkey
        |  AND CAST(o.o_orderdate AS DATE) < p.p_end
        |  AND p.p_start < CAST(o.o_orderdate AS DATE) + 7
        |GROUP BY p.n_name, p.p_start ORDER BY p.n_name""".stripMargin,

    "q_join_theta_range" ->
      """SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year, COUNT(*) AS cnt
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
        |GROUP BY 1 ORDER BY order_year""".stripMargin,

    "q_join_cross" ->
      """SELECT r.r_name, n.n_name, concat_ws('-', r.r_name, n.n_name) AS label
        |FROM region r CROSS JOIN nation n
        |ORDER BY r.r_name, n.n_name""".stripMargin,

    "q_join_supplier_rollup" ->
      """SELECT n.n_name, COUNT(*) AS cnt,
        |  CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,

    "q_join_skew_salted" ->
      """SELECT p.p_brand, COUNT(*) AS n_items,
        |  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,6)) - CAST(l.l_discount AS DECIMAL(18,6)))), 2)
        |    AS DOUBLE) AS revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin,

    "q_join_asof" ->
      """WITH probes AS (SELECT * FROM (VALUES (TIMESTAMP '2024-01-08 00:00:00'),
        |                                     (TIMESTAMP '2024-01-15 12:00:00'),
        |                                     (TIMESTAMP '2024-01-25 06:30:00')) AS t(probe_ts)),
        |ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
        |       FROM events WHERE user_id < 50)
        |SELECT probe_ts, user_id, event_id, ts, event_type FROM (
        |  SELECT p.probe_ts, e.user_id, e.event_id, e.ts, e.event_type,
        |         row_number() OVER (PARTITION BY p.probe_ts, e.user_id
        |                            ORDER BY e.ts DESC, e.event_id DESC) AS rn
        |  FROM probes p JOIN ev e ON e.ts <= p.probe_ts) sub
        |WHERE rn = 1 ORDER BY probe_ts, user_id""".stripMargin,

    "q_join_asof_nearest" ->
      """WITH probes AS (SELECT * FROM (VALUES (TIMESTAMP '2024-01-08 00:00:00'),
        |                                     (TIMESTAMP '2024-01-15 12:00:00'),
        |                                     (TIMESTAMP '2024-01-25 06:30:00')) AS t(probe_ts)),
        |ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |       FROM events WHERE user_id < 50)
        |SELECT probe_ts, user_id, event_id, ts, event_type, delta_us FROM (
        |  SELECT p.probe_ts, e.user_id, e.event_id, e.ts, e.event_type,
        |         abs(e.us - epoch_us(p.probe_ts)) AS delta_us,
        |         row_number() OVER (PARTITION BY p.probe_ts, e.user_id
        |                            ORDER BY abs(e.us - epoch_us(p.probe_ts)),
        |                                     e.event_id) AS rn
        |  FROM probes p CROSS JOIN ev e) sub
        |WHERE rn = 1 ORDER BY probe_ts, user_id""".stripMargin
  )
}
