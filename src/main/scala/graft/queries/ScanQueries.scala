package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1 — scans / sources.
  *
  * Scale notes: both queries are pure scan→filter→project pipelines;
  * `.explain` must show PushedFilters on the parquet scan and a pruned
  * ReadSchema. At 100 TB these are embarrassingly parallel (no shuffle
  * except the final TakeOrdered for the LIMIT, which moves ≤100 rows per
  * partition to the driver-side merge).
  */
object ScanQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    "q_scan_filter_project" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
                col("l_shipdate") <  lit("1997-01-01").cast("timestamp_ntz"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
        // (l_orderkey, l_linenumber) is NOT unique in this data — sort by
        // every output column; the full projection is duplicate-free.
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_returnflag")
        .limit(100)),

    "q_scan_predicates" -> ((s, dir) =>
      Tables.t(s, dir, "part")
        .filter(col("p_type").isin("PROMO", "ECONOMY") &&
                col("p_size").between(10, 40) &&
                col("p_name").like("%ring%"))
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey"))
  )

  val oracle: Map[String, String] = Map(
    "q_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity, l_returnflag
        |LIMIT 100""".stripMargin,

    "q_scan_predicates" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size
        |FROM part
        |WHERE p_type IN ('PROMO', 'ECONOMY') AND p_size BETWEEN 10 AND 40 AND p_name LIKE '%ring%'
        |ORDER BY p_partkey""".stripMargin
  )
}
