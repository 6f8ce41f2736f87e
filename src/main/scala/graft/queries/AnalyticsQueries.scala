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
    Seq("orders", "lineitem", "customer", "supplier", "part", "nation", "region")
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

    // TPC-H Q4 / Q21 / Q22 / Q2 / Q20 — dialect-shared texts (see the
    // *Sql vals above for semantics + the adaptation notes)
    "q_tpch_q4" -> ((s, dir) => { views(s, dir); s.sql(TpchQ4Sql) }),
    "q_tpch_q21" -> ((s, dir) => { views(s, dir); s.sql(TpchQ21Sql) }),
    "q_tpch_q22" -> ((s, dir) => { views(s, dir); s.sql(TpchQ22Sql) }),
    "q_tpch_q2" -> ((s, dir) => { views(s, dir); s.sql(TpchQ2Sql) }),
    "q_tpch_q20" -> ((s, dir) => { views(s, dir); s.sql(TpchQ20Sql) }),

    // TPC-H Q9 (product type profit), adapted: no partsupp, so the cost
    // side of profit uses the part's retail price (a broadcast dim
    // attribute) instead of ps_supplycost. Profit per line can be
    // NEGATIVE — the decimal sum and the final scale-2 rounding are both
    // half-away-from-zero in the two engines, so signs never diverge.
    // part and nation broadcast; the 3 fact-side joins shuffle on their
    // keys only after the part filter has pruned the lineitem rows.
    "q_tpch_q9" -> ((s, dir) => {
      val p = Tables.t(s, dir, "part").filter(col("p_name").like("%gear"))
        .select("p_partkey", "p_retailprice")
      val amount = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")) -
        col("p_retailprice").cast("decimal(18,2)") * col("l_quantity").cast("decimal(18,2)")
      Tables.t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(Tables.t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(amount).as("sum_x"))
        .select(col("nation"), col("o_year"),
          col("sum_x").cast("decimal(18,2)").cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q11 (important stock), adapted: the "stock value" of a part
    // is Σ(extprice·qty) over the target nations' suppliers, derived from
    // lineitem in place of partsupp. The value-concentration threshold is
    // EXACT: value·1000 > total in DECIMAL (explicit (28,4) downcast
    // keeps the product inside precision 38 without scale loss). The
    // global total is a 1-row broadcast fold — no second shuffle.
    "q_tpch_q11" -> ((s, dir) => {
      val natSupp = Tables.t(s, dir, "supplier")
        .join(broadcast(Tables.t(s, dir, "nation")
          .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val natps = Tables.t(s, dir, "lineitem")
        .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey").as("partkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_quantity").cast("decimal(18,2)")).cast("decimal(28,4)").as("value_x"))
      val tot = natps.agg(sum(col("value_x")).cast("decimal(28,4)").as("total_x"))
      natps.join(broadcast(tot))
        .filter(col("value_x") * lit(1000).cast("decimal(4,0)") > col("total_x"))
        .select(col("partkey"), col("value_x").cast("double").as("part_value"))
        .orderBy(col("value_x").desc, col("partkey"))
    }),

    // TPC-H Q12 (shipping modes and order priority), adapted: no
    // l_shipmode/l_receiptdate, so the mode is the return flag and "late
    // receipt" = shipped 30+ days after ordering. Both priority counters
    // ride ONE pass as conditional sums; the date-range filter pushes to
    // the lineitem scan before the join.
    "q_tpch_q12" -> ((s, dir) => {
      val l = Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(Tables.t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 30 DAY"))
        .groupBy(col("l_returnflag").as("ship_mode"))
        .agg(sum(when(high, 1).otherwise(0)).cast("long").as("high_line_count"),
          sum(when(high, 0).otherwise(1)).cast("long").as("low_line_count"))
        .orderBy("ship_mode")
    }),

    // TPC-H Q16 (parts/supplier relationship), adapted: the supplier
    // catalog is the distinct (part, supplier) trade pairs, and the
    // "customer complaints" exclusion list becomes negative-balance
    // suppliers. NOT IN over a non-null key ≡ left anti join (the
    // DataFrame formulation makes the broadcast explicit); the distinct
    // count shuffles once on the group key.
    "q_tpch_q16" -> ((s, dir) => {
      val ps = Tables.t(s, dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
      val p = Tables.t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      val bad = Tables.t(s, dir, "supplier").filter(col("s_acctbal") < 0).select("s_suppkey")
      ps.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
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
      // r17: Spark's UnionLoop re-inlines every non-recursive CTE per
      // iteration (the r6 lesson) — event-log measured 47 jobs for 5
      // hops over a 25-row chain, ~8 per hop re-running the ranked
      // window + the adjacency self-join. The STATIC edge table is
      // materialized once as a checkpointed temp view; the recursion
      // and final select are the same text, and the DuckDB oracle
      // still runs the original single-text form (its CTEs evaluate
      // once anyway), so the hash gate re-proves equivalence each run.
      s.sql(
        """WITH ranked AS (
          |  SELECT CAST(n_nationkey AS BIGINT) AS k, n_regionkey,
          |         ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rnk
          |  FROM nation)
          |SELECT a.k AS src, b.k AS dst
          |FROM ranked a JOIN ranked b
          |  ON a.n_regionkey = b.n_regionkey AND abs(a.rnk - b.rnk) = 1""".stripMargin)
        .localCheckpoint()
        .createOrReplaceTempView("reach_edges_mat")
      s.sql(
        """WITH RECURSIVE reach(nationkey, hops) AS (
          |  SELECT CAST(0 AS BIGINT) AS nationkey, CAST(0 AS BIGINT) AS hops
          |  UNION ALL
          |  SELECT e.dst, r.hops + 1
          |  FROM reach r JOIN reach_edges_mat e ON e.src = r.nationkey
          |  WHERE r.hops < 4)
          |SELECT n.n_name, CAST(MIN(r.hops) AS BIGINT) AS hops
          |FROM reach r JOIN nation n ON CAST(n.n_nationkey AS BIGINT) = r.nationkey
          |GROUP BY n.n_name
          |ORDER BY hops, n_name""".stripMargin)
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

  /** TPC-H Q4 (order priority checking), adapted: this schema has no
    * l_commitdate/l_receiptdate, so "late" = shipped more than 30 days
    * after the order date. The correlated EXISTS carries a NON-equi
    * conjunct (l_shipdate > o_orderdate + 30d) on top of the key
    * equality — Catalyst decorrelates it to a left semi join whose extra
    * predicate rides the join condition, not a per-row subquery. Runs
    * verbatim in both engines.
    */
  private val TpchQ4Sql =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      |  AND o.o_orderdate < TIMESTAMP '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q21 (suppliers who kept orders waiting), adapted: "late" =
    * shipped >60 days after order date. The semi (EXISTS another
    * supplier on the order) and anti (NOT EXISTS another LATE supplier)
    * subqueries hit the SAME fact table with different predicates — the
    * decorrelated plan is one scan feeding a semi join and an anti join,
    * the classic multi-consumer shape. At 100 TB both collapse to
    * key-partitioned joins on l_orderkey; no per-row re-execution.
    */
  private val TpchQ21Sql =
    """SELECT s_name, n_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey
      |WHERE o.o_orderstatus = 'F'
      |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name, n_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 50""".stripMargin

  /** TPC-H Q22 (global sales opportunity), adapted: no c_phone column, so
    * the country-code filter becomes a nationkey set, and since every
    * customer in this corpus has at least one order, "never ordered"
    * becomes "no order since 1999". The above-average-balance threshold
    * is EXACT: bal*cnt > Σbal in DECIMAL (the division never happens), so
    * both engines cut identically with no float boundary.
    */
  private val TpchQ22Sql =
    """WITH pool AS (
      |  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey,
      |         CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      |  FROM customer WHERE c_nationkey IN (1,3,5,7,9,11,13,15,17,19)),
      |stats AS (
      |  SELECT SUM(bal) AS sum_x, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM pool WHERE bal > 0)
      |SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
      |       CAST(SUM(bal) AS DOUBLE) AS totacctbal
      |FROM pool, stats
      |WHERE bal * cnt > sum_x
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = pool.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY nationkey ORDER BY nationkey""".stripMargin

  /** TPC-H Q2 (minimum-cost supplier), adapted: no partsupp table in this
    * schema, so the supplier catalog derives from observed trade — per
    * (part, supplier) the minimum extended price ever charged, an exact
    * DECIMAL MIN so the correlated "= regional minimum" equality is
    * bitwise in both engines. The correlated scalar MIN decorrelates to
    * a per-part aggregate joined back on (p_partkey, ps_cost); at scale
    * the ps derivation is one hash aggregate of the fact table and the
    * dims broadcast.
    */
  private val TpchQ2Sql =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_cost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
      |       CAST(ps_cost AS DOUBLE) AS supply_cost
      |FROM part
      |JOIN ps ON p_partkey = ps.l_partkey
      |JOIN supplier ON s_suppkey = ps.l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE' AND r_name = 'ASIA'
      |  AND ps_cost = (SELECT MIN(ps2.ps_cost)
      |                 FROM ps ps2
      |                 JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
      |                 JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      |                 JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |                 WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'ASIA')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q20 (potential part promotion), adapted: "excess stock"
    * becomes "dominant shipper" — suppliers who shipped more than half of
    * a red part's 1996 volume. The share test is exact integer-free
    * decimal arithmetic (2·sq > Σq, never a division), and the nested
    * IN-subqueries decorrelate to two semi joins over one aggregated
    * scan of the year's lineitems.
    */
  private val TpchQ20Sql =
    """WITH shipped AS (
      |  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq_x
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY l_partkey, l_suppkey),
      |parttot AS (
      |  SELECT l_partkey AS pk, SUM(sq_x) AS tot_x FROM shipped GROUP BY l_partkey)
      |SELECT s_suppkey, s_name, s_acctbal
      |FROM supplier
      |WHERE s_suppkey IN (
      |    SELECT sh.l_suppkey FROM shipped sh
      |    JOIN parttot ON sh.l_partkey = pk
      |    WHERE sh.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |      AND sh.sq_x * 2 > tot_x)
      |ORDER BY s_suppkey""".stripMargin

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
    "q_tpch_q4" -> TpchQ4Sql,
    "q_tpch_q21" -> TpchQ21Sql,
    "q_tpch_q22" -> TpchQ22Sql,
    "q_tpch_q2" -> TpchQ2Sql,
    "q_tpch_q20" -> TpchQ20Sql,

    "q_tpch_q9" ->
      """SELECT nation, o_year, CAST(ROUND(sum_x, 2) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
        |      - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sum_x
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%gear'
        |  GROUP BY n_name, year(o_orderdate)) t
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q_tpch_q11" ->
      """WITH natps AS (
        |  SELECT l_partkey AS partkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,4)) AS value_x
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_1','NATION_2','NATION_3')
        |  GROUP BY l_partkey)
        |SELECT partkey, CAST(value_x AS DOUBLE) AS part_value
        |FROM natps, (SELECT CAST(SUM(value_x) AS DECIMAL(28,4)) AS total_x FROM natps) t
        |WHERE value_x * 1000 > total_x
        |ORDER BY value_x DESC, partkey""".stripMargin,

    "q_tpch_q12" ->
      """SELECT l_returnflag AS ship_mode,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag ORDER BY ship_mode""".stripMargin,

    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1,4,9,16,25,36,49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

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
