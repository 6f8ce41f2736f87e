package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Correlated subqueries + composite TPC-H-style analytics — the
  * "user query" tier above single-operator coverage: Catalyst's subquery
  * decorrelation (EXISTS → semi join, correlated scalar agg → aggregate +
  * join, IN → semi join) and multi-join pipelines with selective dims.
  *
  * Money discipline follows AggQueries: DECIMAL-exact aggregation, ORDER
  * BY the UNROUNDED decimal (bitwise cross-engine), final output rounded
  * to DECIMAL(18,2) then cast DOUBLE so both engines serialize identical
  * float64 (Spark scale-reducing .cast rounds half-away-from-zero = DuckDB
  * ROUND, never DuckDB's truncating decimal CAST).
  *
  * Scale notes: the subqueries decorrelate to the same semi/aggregate-join
  * shapes a hand-written plan would use (no per-row re-execution); the
  * TPC-H composites filter BEFORE joining (pushdown reaches every scan),
  * broadcast the small dims (customer-filter, supplier, nation, region),
  * and shuffle only on the surviving join keys — AQE re-plans the join
  * order and coalesces post-filter partitions at runtime.
  */
object AnalyticsQueries extends QueryPack {

  /** Register the TPC-H tables as temp views for spark.sql queries —
    * same DataFrames as Tables.t, so pushdown/statistics are identical.
    */
  private def views(s: SparkSession, dir: String): Unit =
    Seq("orders", "lineitem", "customer", "supplier", "nation", "region")
      .foreach(t => Tables.t(s, dir, t).createOrReplaceTempView(t))

  /** Exact decimal revenue: sum(extprice * (1 - discount)). */
  private val revX =
    sum(col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))

  private val revXSql =
    """SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))""".stripMargin

  val queries: Map[String, Fn] = Map(
    // EXISTS → left semi join after decorrelation
    "q_subq_exists" -> ((s, dir) => {
      views(s, dir)
      s.sql("""SELECT o_orderpriority, COUNT(*) AS cnt FROM orders o
              |WHERE EXISTS (SELECT 1 FROM lineitem l
              |              WHERE l.l_orderkey = o.o_orderkey
              |                AND l.l_returnflag = 'R')
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    // correlated scalar aggregate → per-key MAX join (each customer's
    // maximal orders; MAX of a stored double is exact in both engines)
    "q_subq_scalar" -> ((s, dir) => {
      views(s, dir)
      s.sql("""SELECT o1.o_orderkey, o1.o_custkey FROM orders o1
              |WHERE o1.o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
              |                         WHERE o2.o_custkey = o1.o_custkey)
              |ORDER BY o1.o_orderkey""".stripMargin)
    }),

    // IN-subquery → semi join
    "q_subq_in" -> ((s, dir) => {
      views(s, dir)
      s.sql("""SELECT c_custkey, c_name FROM customer
              |WHERE c_custkey IN (SELECT o_custkey FROM orders
              |                    WHERE o_totalprice > 400000)
              |ORDER BY c_custkey LIMIT 100""".stripMargin)
    }),

    // recursive CTE: calendar densification — generate the day series,
    // left-join counts so gap days appear as explicit zeros (the series
    // is tiny and broadcast; recursion depth = days, not data size)
    "q_rec_series" -> ((s, dir) => {
      views(s, dir)
      s.sql("""WITH RECURSIVE days(day) AS (
              |  SELECT DATE '1995-01-01' AS day
              |  UNION ALL
              |  SELECT CAST(day + INTERVAL 1 DAY AS DATE) FROM days
              |  WHERE day < DATE '1995-01-31')
              |SELECT d.day, COUNT(o.o_orderkey) AS n_orders
              |FROM days d LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = d.day
              |GROUP BY d.day ORDER BY d.day""".stripMargin)
    }),

    // TPC-H Q3 (shipping priority): filter-first 3-way join, top revenue
    "q_tpch_q3" -> ((s, dir) => {
      val cutoff = lit("1998-01-01").cast("timestamp")
      val c = Tables.t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.t(s, dir, "orders").filter(col("o_orderdate") < cutoff)
      val l = Tables.t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(revX.as("rev_x"))
        .orderBy(col("rev_x").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"),
          col("rev_x").cast("decimal(18,2)").cast("double").as("revenue"),
          col("o_orderdate").cast("date").as("o_orderdate"))
    }),

    // TPC-H Q5 (local supplier volume): 6-way join, nation revenue in ASIA
    "q_tpch_q5" -> ((s, dir) => {
      val o = Tables.t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      Tables.t(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(Tables.t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(Tables.t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.t(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(revX.as("rev_x"))
        .orderBy(col("rev_x").desc, col("n_name"))
        .select(col("n_name"),
          col("rev_x").cast("decimal(18,2)").cast("double").as("revenue"))
    }),

    // correlated LATERAL subquery with LIMIT — per-customer top-2 orders
    // as a join operator (the window-free formulation); Catalyst
    // decorrelates it, DuckDB runs the same SQL natively
    "q_join_lateral" -> ((s, dir) => {
      views(s, dir)
      s.sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
              |FROM customer c, LATERAL (
              |  SELECT o_orderkey, o_totalprice FROM orders o
              |  WHERE o.o_custkey = c.c_custkey
              |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
              |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
    }),

    // FILTER-clause aggregates (per-aggregate predicates without CASE
    // contortions) + bool_or — one pass, partial+final as usual
    "q_agg_filtered" -> ((s, dir) => {
      views(s, dir)
      s.sql("""SELECT o_orderpriority,
              |  COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
              |  bool_or(o_totalprice > 400000) AS any_huge,
              |  COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000) AS n_big_cust
              |FROM orders GROUP BY o_orderpriority
              |ORDER BY o_orderpriority""".stripMargin)
    }),

    // TPC-H Q6 (forecast revenue change): pure scan-side query — every
    // predicate pushes into the parquet reader, no join, one partial+final
    // aggregate; the 100 TB plan is a map-only pass over pruned row groups
    "q_tpch_q6" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(18,6)"))
          .cast("decimal(18,2)").cast("double").as("revenue"))),

    // TPC-H Q18 (large-volume customers): the big-order keys come from an
    // aggregate-then-filter on lineitem alone (shuffle bounded by order
    // keys), then join back to the order/customer dims
    "q_tpch_q18" -> ((s, dir) => {
      val bigOrders = Tables.t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty_x"))
        .filter(col("sum_qty_x") > 240)
      Tables.t(s, dir, "customer")
        .join(Tables.t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_orderdate"), col("o_totalprice"),
          col("sum_qty_x").cast("decimal(18,2)").cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q7 (volume shipping, adapted: no l_commitdate in this schema
    // so the year comes from l_shipdate): revenue between two nations by
    // (supplier nation, customer nation, year). The nation dims filter to
    // the TWO nations BEFORE joining — the big join inputs shrink at the
    // scan, and both nation sides broadcast.
    "q_tpch_q7" -> ((s, dir) => {
      val pair = Seq("NATION_1", "NATION_2")
      val n1 = Tables.t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      Tables.t(s, dir, "lineitem")
        .join(Tables.t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(Tables.t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(revX.as("rev_x"))
        .select(col("supp_nation"), col("cust_nation"), col("l_year"),
          col("rev_x").cast("decimal(18,2)").cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q14 (promo revenue share): one selective scan month joined to
    // the broadcast part dim; the promo share is a FILTER-style
    // conditional aggregate over the same pass (no second scan)
    "q_tpch_q14" -> ((s, dir) => {
      val l = Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      val term = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)"))
      l.join(broadcast(Tables.t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", term)).as("promo_x"),
          sum(term).as("tot_x"))
        .select(
          round(lit(100.0) * col("promo_x").cast("double") /
            col("tot_x").cast("double"), 6).as("promo_pct"),
          col("promo_x").cast("decimal(18,2)").cast("double").as("promo_revenue"),
          col("tot_x").cast("decimal(18,2)").cast("double").as("total_revenue"))
    }),

    // TPC-H Q19 (disjunctive bracket predicates, adapted to this schema's
    // columns): three (brand, size-range, quantity-range) brackets OR-ed
    // together — the classic test that a disjunction over join-plus-scan
    // predicates still prunes (part broadcasts; the l_quantity bounds
    // union to 1..30 and push to the lineitem scan)
    "q_tpch_q19" -> ((s, dir) => {
      val br = (brand: String, smax: Int, qlo: Int, qhi: Int) =>
        col("p_brand") === brand && col("p_size").between(1, smax) &&
          col("l_quantity").between(qlo, qhi)
      Tables.t(s, dir, "lineitem")
        .join(broadcast(Tables.t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .filter(br("Brand#12", 15, 1, 11) || br("Brand#23", 25, 10, 20) ||
          br("Brand#9", 35, 20, 30))
        .groupBy("p_brand")
        .agg(revX.as("rev_x"), count(lit(1)).as("n_items"))
        .select(col("p_brand"),
          col("rev_x").cast("decimal(18,2)").cast("double").as("revenue"),
          col("n_items"))
        .orderBy("p_brand")
    }),

    // TPC-H Q8 (national market share, adapted): of the revenue ASIA
    // customers generated in 1996–97, the share supplied by NATION_3,
    // per order year. Both aggregates ride ONE pass (conditional sum);
    // region/nation dims broadcast after their filters.
    "q_tpch_q8" -> ((s, dir) => {
      val o = Tables.t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val n1 = Tables.t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
      val term = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)"))
      Tables.t(s, dir, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .join(broadcast(Tables.t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("c_rk") === col("r_regionkey"))
        .join(Tables.t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(when(col("supp_nation") === "NATION_3", term)).as("nat_x"),
          sum(term).as("tot_x"))
        .select(col("o_year"),
          round(coalesce(col("nat_x"), lit(0).cast("decimal(18,2)")).cast("double") /
            col("tot_x").cast("double"), 6).as("mkt_share"),
          col("tot_x").cast("decimal(18,2)").cast("double").as("total_revenue"))
        .orderBy("o_year")
    }),

    // TPC-H Q13 (customer order-count distribution): LEFT join keeps the
    // order-less customers (count(o_orderkey) skips their nulls → 0),
    // then the distribution is a second tiny aggregate
    "q_tpch_q13" -> ((s, dir) =>
      Tables.t(s, dir, "customer")
        .join(Tables.t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)),

    // TPC-H Q15 (top supplier): quarterly revenue per supplier, keep the
    // max — the scalar-subquery MAX decorrelates to an aggregate joined
    // back on decimal equality (exact, so no float-boundary ambiguity)
    "q_tpch_q15" -> ((s, dir) => {
      val rev = Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(revX.as("rev_x"))
      val top = rev.agg(max(col("rev_x")).as("max_x"))
      rev.join(broadcast(top), col("rev_x") === col("max_x"))
        .join(Tables.t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev_x").cast("decimal(18,2)").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q17 (small-quantity revenue): per-part average quantity via
    // an aggregate join; the "below 20% of avg" threshold is EXACT
    // integer-free decimal arithmetic (5·q·cnt < Σq avoids the division
    // entirely), so both engines cut identically
    "q_tpch_q17" -> ((s, dir) => {
      val pq = Tables.t(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("pq_pk"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sumq"),
          count(lit(1)).as("cnt"))
      Tables.t(s, dir, "lineitem")
        .join(broadcast(Tables.t(s, dir, "part").filter(col("p_brand") === "Brand#5")),
          col("l_partkey") === col("p_partkey"))
        .join(pq, col("l_partkey") === col("pq_pk"))
        .filter(col("l_quantity").cast("decimal(18,2)") * 5 * col("cnt") < col("sumq"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double") / 7.0, 6).as("avg_yearly"))
    }),

    // TPC-H Q10 (returned items): top customers by returned revenue
    "q_tpch_q10" -> ((s, dir) => {
      val o = Tables.t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      val l = Tables.t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      Tables.t(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revX.as("rev_x"))
        .orderBy(col("rev_x").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("rev_x").cast("decimal(18,2)").cast("double").as("revenue"))
    }),

    // RECURSIVE CTE (Spark 4's WITH RECURSIVE / UnionLoop): hop-count
    // reachability from nation 0 along each region's rank-adjacent
    // nation chain — the iterate-until-fixpoint SQL surface DuckDB's
    // q_dedup_components oracle already uses, now exercised in BOTH
    // engines from the SAME text. The recursion's per-step work is one
    // tiny broadcast join (edges ≤ 2·|nation|); walks may oscillate on
    // the undirected chain, so the hop bound terminates it and the
    // outer MIN collapses walks to shortest distances.
    "q_recursive_reach" -> ((s, dir) => {
      views(s, dir)
      s.sql(RecursiveReachSql)
    }),

    // SCD2 dimension maintenance (Kimball type-2): customers whose
    // lifetime order value crosses the threshold get a second version
    // effective at their latest order date — validity ranges
    // [valid_from, valid_to), is_current on the open row. One aggregate
    // + left join + union, the exact incremental-merge shape a warehouse
    // runs nightly; both engines execute the SAME SQL text.
    "q_scd2_dim" -> ((s, dir) => {
      views(s, dir)
      s.sql(Scd2Sql)
    }),

    // data-quality audit (the dbt-test analog): constraint checks as
    // DATA — key uniqueness, referential integrity orphans, value-range
    // and enum-domain violations, all in one pass per table, zero
    // expected everywhere on this corpus; the SAME SQL text runs in both
    // engines. The shape a pipeline gate runs nightly before publishing.
    "q_quality_checks" -> ((s, dir) => {
      graft.Sql.registerViews(s, dir)
      s.sql(QualitySql)
    }),

    // exact triangle counting on the nation-level trade graph — the
    // oracle-checked graph-analytics twin of s_graph_pagerank. The edge
    // table (distinct undirected nation pairs, bounded by |nations|²) is
    // localCheckpoint'ed so the 3-way self-join reads ~300 materialized
    // rows instead of re-running the 4-table join three times; triangles
    // enumerate once with a<b<c, then each vertex's participation counts
    // via an explode — plain joins at every step, the standard
    // distributed triangle enumeration (node-iterator over sorted ids).
    "q_graph_triangles" -> ((s, dir) => {
      val c = Tables.t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val o = Tables.t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val su = Tables.t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val trade = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") =!= col("s_nationkey"))
        .select(least(col("c_nationkey"), col("s_nationkey")).as("a"),
          greatest(col("c_nationkey"), col("s_nationkey")).as("b"))
        .distinct()
        .localCheckpoint()
      val e2 = trade.select(col("a").as("b2"), col("b").as("c2"))
      val e3 = trade.select(col("a").as("a3"), col("b").as("c3"))
      val tri = trade
        .join(e2, col("b") === col("b2"))
        .join(e3, col("a") === col("a3") && col("c2") === col("c3"))
        .select(col("a").as("x"), col("b").as("y"), col("c2").as("z"))
      tri.select(explode(array(col("x"), col("y"), col("z"))).as("nationkey"))
        .groupBy("nationkey").agg(count(lit(1)).as("n_triangles"))
        .orderBy("nationkey")
    })
  )

  /** Dialect-shared data-quality audit (runs verbatim in Spark AND DuckDB). */
  private val QualitySql =
    """SELECT 'customer.pk_unique' AS check_name,
      |  CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) AS violations
      |FROM customer
      |UNION ALL
      |SELECT 'orders.pk_unique',
      |  CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders
      |UNION ALL
      |SELECT 'orders.fk_customer', CAST(COUNT(*) AS BIGINT)
      |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_custkey IS NULL
      |UNION ALL
      |SELECT 'lineitem.fk_orders', CAST(COUNT(*) AS BIGINT)
      |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderkey IS NULL
      |UNION ALL
      |SELECT 'lineitem.qty_range', CAST(COUNT(*) AS BIGINT)
      |FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
      |UNION ALL
      |SELECT 'lineitem.discount_range', CAST(COUNT(*) AS BIGINT)
      |FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1
      |UNION ALL
      |SELECT 'orders.status_domain', CAST(COUNT(*) AS BIGINT)
      |FROM orders WHERE o_orderstatus NOT IN ('O', 'F', 'P')
      |UNION ALL
      |SELECT 'events.ts_not_null', CAST(COUNT(*) AS BIGINT)
      |FROM events WHERE ts IS NULL
      |ORDER BY check_name""".stripMargin

  /** Dialect-shared SCD2 text (runs verbatim in Spark AND DuckDB). */
  /** Dialect-shared recursive reachability (runs verbatim in Spark AND
    * DuckDB — both speak `WITH RECURSIVE name(cols) AS (anchor UNION ALL
    * step)`).
    */
  private val RecursiveReachSql =
    """WITH RECURSIVE ranked AS (
      |  SELECT CAST(n_nationkey AS BIGINT) AS k, n_regionkey,
      |         ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rnk
      |  FROM nation),
      |edges AS (
      |  SELECT a.k AS src, b.k AS dst
      |  FROM ranked a JOIN ranked b
      |    ON a.n_regionkey = b.n_regionkey AND abs(a.rnk - b.rnk) = 1),
      |reach(nationkey, hops) AS (
      |  SELECT CAST(0 AS BIGINT) AS nationkey, CAST(0 AS BIGINT) AS hops
      |  UNION ALL
      |  SELECT e.dst, r.hops + 1
      |  FROM reach r JOIN edges e ON e.src = r.nationkey
      |  WHERE r.hops < 4)
      |SELECT n.n_name, CAST(MIN(r.hops) AS BIGINT) AS hops
      |FROM reach r JOIN nation n ON CAST(n.n_nationkey AS BIGINT) = r.nationkey
      |GROUP BY n.n_name
      |ORDER BY hops, n_name""".stripMargin

  private val Scd2Sql =
    """WITH chg AS (
      |  SELECT o_custkey AS c_custkey, MAX(CAST(o_orderdate AS DATE)) AS chg_date
      |  FROM orders GROUP BY 1
      |  HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 4000000)
      |SELECT c.c_custkey, c.c_mktsegment AS segment,
      |  DATE '1992-01-01' AS valid_from,
      |  COALESCE(g.chg_date, DATE '9999-12-31') AS valid_to,
      |  g.c_custkey IS NULL AS is_current
      |FROM customer c LEFT JOIN chg g ON c.c_custkey = g.c_custkey
      |UNION ALL
      |SELECT c_custkey, 'PREMIUM', chg_date, DATE '9999-12-31', TRUE FROM chg
      |ORDER BY c_custkey, valid_from, is_current""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_scd2_dim" -> Scd2Sql,
    "q_recursive_reach" -> RecursiveReachSql,
    "q_quality_checks" -> QualitySql,
    "q_subq_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS cnt FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_subq_scalar" ->
      """SELECT o1.o_orderkey, o1.o_custkey FROM orders o1
        |WHERE o1.o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
        |                         WHERE o2.o_custkey = o1.o_custkey)
        |ORDER BY o1.o_orderkey""".stripMargin,

    "q_subq_in" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_totalprice > 400000)
        |ORDER BY c_custkey LIMIT 100""".stripMargin,

    "q_rec_series" ->
      """WITH RECURSIVE days(day) AS (
        |  SELECT DATE '1995-01-01' AS day
        |  UNION ALL
        |  SELECT CAST(day + INTERVAL 1 DAY AS DATE) FROM days
        |  WHERE day < DATE '1995-01-31')
        |SELECT d.day, COUNT(o.o_orderkey) AS n_orders
        |FROM days d LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = d.day
        |GROUP BY d.day ORDER BY d.day""".stripMargin,

    "q_tpch_q3" ->
      s"""SELECT l_orderkey, CAST(ROUND(rev_x, 2) AS DOUBLE) AS revenue,
         |  CAST(o_orderdate AS DATE) AS o_orderdate
         |FROM (
         |  SELECT l_orderkey, o_orderdate, $revXSql AS rev_x
         |  FROM customer
         |  JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON o_orderkey = l_orderkey
         |  WHERE c_mktsegment = 'BUILDING'
         |    AND o_orderdate < TIMESTAMP '1998-01-01'
         |    AND l_shipdate > TIMESTAMP '1998-01-01'
         |  GROUP BY l_orderkey, o_orderdate) t
         |ORDER BY rev_x DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin,

    "q_tpch_q5" ->
      s"""SELECT n_name, CAST(ROUND(rev_x, 2) AS DOUBLE) AS revenue
         |FROM (
         |  SELECT n_name, $revXSql AS rev_x
         |  FROM customer
         |  JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON o_orderkey = l_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'ASIA'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01'
         |    AND o_orderdate < TIMESTAMP '1997-01-01'
         |  GROUP BY n_name) t
         |ORDER BY rev_x DESC, n_name""".stripMargin,

    "q_join_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin,

    "q_agg_filtered" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        |  bool_or(o_totalprice > 400000) AS any_huge,
        |  COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000) AS n_big_cust
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_q6" ->
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                      CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q_tpch_q18" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
        |  CAST(ROUND(sum_qty_x, 2) AS DOUBLE) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_x
        |      FROM lineitem GROUP BY 1
        |      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 240) t
        |  ON o_orderkey = l_orderkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q_tpch_q7" ->
      s"""SELECT supp_nation, cust_nation, l_year,
         |  CAST(ROUND(rev_x, 2) AS DOUBLE) AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |    CAST(year(l_shipdate) AS BIGINT) AS l_year, $revXSql AS rev_x
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
         |    AND n2.n_name IN ('NATION_1', 'NATION_2')
         |    AND n1.n_name != n2.n_name
         |  GROUP BY 1, 2, 3) t
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q_tpch_q14" ->
      s"""SELECT ROUND(100.0 * CAST(promo_x AS DOUBLE) / CAST(tot_x AS DOUBLE), 6)
         |    AS promo_pct,
         |  CAST(ROUND(promo_x, 2) AS DOUBLE) AS promo_revenue,
         |  CAST(ROUND(tot_x, 2) AS DOUBLE) AS total_revenue
         |FROM (
         |  SELECT
         |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
         |        (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
         |      FILTER (WHERE p_type = 'PROMO') AS promo_x,
         |    $revXSql AS tot_x
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
         |    AND l_shipdate < TIMESTAMP '1996-10-01') t""".stripMargin,

    "q_tpch_q19" ->
      s"""SELECT p_brand, CAST(ROUND(rev_x, 2) AS DOUBLE) AS revenue, n_items
         |FROM (
         |  SELECT p_brand, $revXSql AS rev_x, CAST(COUNT(*) AS BIGINT) AS n_items
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |         AND l_quantity BETWEEN 1 AND 11)
         |     OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         |         AND l_quantity BETWEEN 10 AND 20)
         |     OR (p_brand = 'Brand#9' AND p_size BETWEEN 1 AND 35
         |         AND l_quantity BETWEEN 20 AND 30)
         |  GROUP BY p_brand) t
         |ORDER BY p_brand""".stripMargin,

    "q_tpch_q8" ->
      s"""SELECT o_year,
         |  ROUND(CAST(COALESCE(nat_x, 0) AS DOUBLE) / CAST(tot_x AS DOUBLE), 6)
         |    AS mkt_share,
         |  CAST(ROUND(tot_x, 2) AS DOUBLE) AS total_revenue
         |FROM (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
         |        (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
         |      FILTER (WHERE n1.n_name = 'NATION_3') AS nat_x,
         |    $revXSql AS tot_x
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  JOIN region ON n2.n_regionkey = r_regionkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  WHERE r_name = 'ASIA'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01'
         |    AND o_orderdate < TIMESTAMP '1998-01-01'
         |  GROUP BY 1) t
         |ORDER BY o_year""".stripMargin,

    "q_tpch_q13" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_q15" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, $revXSql AS rev_x
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, CAST(ROUND(rev_x, 2) AS DOUBLE) AS total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE rev_x = (SELECT MAX(rev_x) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q_tpch_q17" ->
      """SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |        / 7.0, 6) AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN (SELECT l_partkey AS pq_pk,
        |        SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sumq,
        |        CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM lineitem GROUP BY 1) pq ON l_partkey = pq_pk
        |WHERE p_brand = 'Brand#5'
        |  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sumq""".stripMargin,

    "q_tpch_q10" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  CAST(ROUND(rev_x, 2) AS DOUBLE) AS revenue
         |FROM (
         |  SELECT c_custkey, c_name, n_name, $revXSql AS rev_x
         |  FROM customer
         |  JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON o_orderkey = l_orderkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  WHERE l_returnflag = 'R'
         |    AND o_orderdate >= TIMESTAMP '1997-01-01'
         |    AND o_orderdate < TIMESTAMP '1997-04-01'
         |  GROUP BY c_custkey, c_name, n_name) t
         |ORDER BY rev_x DESC, c_custkey
         |LIMIT 20""".stripMargin,

    "q_graph_triangles" ->
      """WITH trade AS (
        |  SELECT DISTINCT
        |    LEAST(c.c_nationkey, s.s_nationkey) AS a,
        |    GREATEST(c.c_nationkey, s.s_nationkey) AS b
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM trade e1
        |  JOIN trade e2 ON e1.b = e2.a
        |  JOIN trade e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT v AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_triangles
        |FROM (SELECT x AS v FROM tri
        |      UNION ALL SELECT y FROM tri
        |      UNION ALL SELECT z FROM tri) m
        |GROUP BY v ORDER BY nationkey""".stripMargin
  )
}
