package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Breadth beyond the SURVEY.md §2 core: statistical aggregates, bitwise
  * scalar functions, integer-bucketed histograms, and a typed Dataset
  * pipeline — all oracle-checked.
  *
  * Determinism notes: stddev/variance are floating-point and summation-
  * order sensitive at ~1e-12 relative error; ROUND(...,4) absorbs that on
  * these magnitudes (verified by the oracle hash). Histogram buckets use
  * integer-exact floor(value/10) so bucket edges cannot straddle engines.
  */
final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                       o_totalprice: Double, o_orderpriority: String)

object MiscQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    "q_agg_stats" -> ((s, dir) =>
      Tables.t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(round(avg("o_totalprice"), 4).as("avg_price"),
          round(stddev_samp(col("o_totalprice")), 4).as("sd_price"),
          round(var_samp(col("o_totalprice")), 2).as("var_price"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"))
        .orderBy("o_orderpriority")),

    "q_fn_bitwise" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          expr("event_id & 255").as("low_byte"),
          expr("event_id | 4096").as("with_flag"),
          expr("event_id ^ user_id").as("xored"),
          expr("shiftleft(event_id, 2)").as("shl2"),
          expr("shiftright(event_id, 3)").as("shr3"))
        .orderBy("event_id")
        .limit(100)),

    "q_evt_histogram" -> ((s, dir) =>
      // null order pinned: Spark ASC defaults NULLS FIRST, DuckDB NULLS LAST
      // — a NULL value row would silently flip the hash without the pin
      Tables.events(s, dir)
        .groupBy(expr("CAST(floor(value / 10) AS BIGINT)").as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("bucket").asc_nulls_first)),

    // arg-max/arg-min aggregates (Spark max_by/min_by, DuckDB arg_max/
    // arg_min): per nation, the customers with the highest and lowest
    // account balance. Both functions are tie-nondeterministic on a bare
    // double, so the ordering key packs (cents, custkey) into one exact
    // BIGINT — floor(bal*100 + 0.5) is stable for 2-dp doubles in both
    // engines, ×1e9 leaves custkey room, and ties become impossible.
    // max_by/min_by with a string payload forces SortAggregate (the
    // non-primitive-buffer fallback, round-6 lesson: sorts EVERY partition
    // by group key). Instead: count via plain HashAggregate, each extremum
    // row via the GraftTopK custom plan k=1 (O(n) scan, O(parts·keys)
    // exchange), then a 25-row join to stitch. ord ≈ cents·1e9 + custkey
    // ≤ ~1e15 < 2^53, so the exec's double compare is exact; min side
    // negates ord (custkey sign flips too, but ord stays unique and
    // min(ord) = -max(-ord) — the selected ROW is identical).
    "q_agg_argmax" -> ((s, dir) => {
      val c = Tables.t(s, dir, "customer").withColumn("ord",
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * 1000000000 + c_custkey"))
      val n = broadcast(Tables.t(s, dir, "nation"))
      val j = c.join(n, c("c_nationkey") === n("n_nationkey"))
        .select(col("n_name"), col("c_name"), col("c_acctbal"), col("ord"),
          (-col("ord")).as("nord"))
      val cnt = j.groupBy("n_name").agg(count(lit(1)).as("n_cust"))
      val top = graft.plans.GraftTopK.perKey(j, "n_name", "ord", "ord", 1)
        .select(col("n_name"), col("c_name").as("top_name"),
          col("c_acctbal").as("top_bal"))
      val low = graft.plans.GraftTopK.perKey(j, "n_name", "nord", "nord", 1)
        .select(col("n_name"), col("c_name").as("low_name"),
          col("c_acctbal").as("low_bal"))
      cnt.join(top, Seq("n_name")).join(low, Seq("n_name"))
        .orderBy("n_name")
    }),

    // deterministic MODE: most frequent order priority per market
    // segment, ties broken lexicographically — hand-rolled as count +
    // rank window because native mode() tie-breaks are engine-defined
    // (the same reason argmax above packs its ordering key)
    "q_agg_mode" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("cnt").desc, col("o_orderpriority"))
      Tables.t(s, dir, "orders")
        .join(broadcast(Tables.t(s, dir, "customer")
          .select("c_custkey", "c_mktsegment")), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_mktsegment"), col("o_orderpriority").as("mode_prio"), col("cnt"))
        .orderBy("c_mktsegment")
    }),

    // typed Dataset pipeline: case-class filter/map, same Catalyst plan
    "q_typed_orders" -> ((s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .as[Order]
        .filter(o => o.o_orderstatus == "O" && o.o_totalprice > 300000)
        .map(o => (o.o_orderkey, o.o_orderpriority, math.round(o.o_totalprice * 100) / 100.0))
        .toDF("o_orderkey", "prio", "price")
        .orderBy("o_orderkey")
        .limit(100)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_agg_stats" ->
      """SELECT o_orderpriority,
        |  ROUND(avg(o_totalprice), 4) AS avg_price,
        |  ROUND(stddev_samp(o_totalprice), 4) AS sd_price,
        |  ROUND(var_samp(o_totalprice), 2) AS var_price,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_fn_bitwise" ->
      """SELECT event_id,
        |  event_id & 255 AS low_byte,
        |  event_id | 4096 AS with_flag,
        |  xor(event_id, user_id) AS xored,
        |  event_id << 2 AS shl2,
        |  event_id >> 3 AS shr3
        |FROM events ORDER BY event_id LIMIT 100""".stripMargin,

    "q_evt_histogram" ->
      """SELECT CAST(floor(value / 10) AS BIGINT) AS bucket, COUNT(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY bucket NULLS FIRST""".stripMargin,

    "q_agg_argmax" ->
      """WITH c AS (SELECT c_name, c_acctbal, c_nationkey,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * 1000000000
        |      + c_custkey AS ord
        |  FROM customer)
        |SELECT n.n_name, COUNT(*) AS n_cust,
        |  arg_max(c.c_name, c.ord) AS top_name,
        |  arg_max(c.c_acctbal, c.ord) AS top_bal,
        |  arg_min(c.c_name, c.ord) AS low_name,
        |  arg_min(c.c_acctbal, c.ord) AS low_bal
        |FROM c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,

    "q_agg_mode" ->
      """WITH pc AS (
        |  SELECT c.c_mktsegment, o.o_orderpriority, COUNT(*) AS cnt
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
        |        ORDER BY cnt DESC, o_orderpriority) AS rn FROM pc)
        |SELECT c_mktsegment, o_orderpriority AS mode_prio, cnt
        |FROM r WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin,

    "q_typed_orders" ->
      """SELECT o_orderkey, o_orderpriority AS prio,
        |  ROUND(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 300000
        |ORDER BY o_orderkey LIMIT 100""".stripMargin
  )
}
