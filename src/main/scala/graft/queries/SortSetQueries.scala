package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.5 (sorts / top-k) + §2.6 (set operations).
  *
  * Scale notes: ORDER BY + LIMIT fuses into `TakeOrderedAndProject` —
  * per-partition top-k then a driver merge of k·partitions rows, no global
  * sort. Set ops compile to aggregate/join shapes that shuffle once on the
  * full row; at 100 TB prefer pre-bucketed inputs or semi/anti joins on a
  * key column (as in q_set_except) over whole-row EXCEPT.
  */
object SortSetQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    "q_sort_limit_topk" -> ((s, dir) =>
      Tables.t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    "q_sort_multi_key" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
        .orderBy(col("l_returnflag").asc, col("l_extendedprice").desc,
          col("l_orderkey"), col("l_linenumber"))
        .limit(100)),

    "q_set_union_all" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase").select("user_id")
      val e = ev.filter(col("event_type") === "error").select("user_id")
      p.unionAll(e)
        .groupBy("user_id")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("user_id").asc_nulls_first)
    }),

    "q_set_union_distinct" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase").select("user_id")
      val e = ev.filter(col("event_type") === "error").select("user_id")
      p.union(e).distinct().orderBy(col("user_id").asc_nulls_first)
    }),

    "q_set_intersect" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase").select("user_id")
      val e = ev.filter(col("event_type") === "error").select("user_id")
      p.intersect(e).orderBy(col("user_id").asc_nulls_first).limit(50)
    }),

    "q_set_except" -> ((s, dir) => {
      val c = Tables.t(s, dir, "customer").select(col("c_custkey").as("k"))
      val u = Tables.events(s, dir).select(col("user_id").as("k"))
      c.except(u).orderBy(col("k").asc_nulls_first).limit(50)
    }),

    // multiset (bag) semantics: min(m, n) copies survive INTERSECT ALL,
    // max(m - n, 0) survive EXCEPT ALL — duplicate rows are identical, so
    // the ORDER BY is total despite the non-unique key
    "q_set_intersect_all" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase").select("user_id")
      val e = ev.filter(col("event_type") === "error").select("user_id")
      // null order pinned like the histogram/pivot queries — set ops treat
      // NULLs as equal, so a NULL key could survive into the LIMIT window
      p.intersectAll(e).orderBy(col("user_id").asc_nulls_first).limit(100)
    }),

    "q_set_except_all" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase").select("user_id")
      val e = ev.filter(col("event_type") === "error").select("user_id")
      p.exceptAll(e).orderBy(col("user_id").asc_nulls_first).limit(100)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_sort_limit_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_sort_multi_key" ->
      """SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber FROM lineitem
        |ORDER BY l_returnflag ASC, l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "q_set_union_all" ->
      """WITH u AS (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id FROM events WHERE event_type = 'error')
        |SELECT user_id, COUNT(*) AS cnt FROM u GROUP BY user_id
        |ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_set_union_distinct" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |UNION
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_set_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id NULLS FIRST LIMIT 50""".stripMargin,

    "q_set_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT user_id AS k FROM events
        |ORDER BY k NULLS FIRST LIMIT 50""".stripMargin,

    "q_set_intersect_all" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT ALL
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id NULLS FIRST LIMIT 100""".stripMargin,

    "q_set_except_all" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |EXCEPT ALL
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id NULLS FIRST LIMIT 100""".stripMargin
  )
}
