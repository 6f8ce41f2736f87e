package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.7 — scalar functions (string / date / math / array / json /
  * conditional). All built-in, codegen'd expressions — no UDFs, so
  * predicate pushdown and whole-stage codegen stay intact.
  *
  * Cross-engine pins: Spark `weekday()+1` == DuckDB `isodow`;
  * ROUND(...,6) on every computed double; BIGINT casts where Spark returns
  * INT but DuckDB returns BIGINT (length, year, datediff, ...).
  */
object FnQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    "q_fn_string" -> ((s, dir) =>
      Tables.t(s, dir, "customer")
        .select(col("c_custkey"),
          upper(col("c_mktsegment")).as("seg_u"),
          substring(col("c_name"), 1, 8).as("name8"),
          concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
          expr("replace(c_name, '#', '-')").as("repl"),
          length(col("c_name")).cast("long").as("name_len"),
          // nullif guards the no-digits case: Spark would cast '' to NULL
          // but DuckDB CAST('' AS BIGINT) hard-errors
          expr("CAST(nullif(regexp_extract(c_name, '[0-9]+', 0), '') AS BIGINT)").as("name_num"))
        .orderBy("c_custkey")
        .limit(100)),

    "q_fn_date" -> ((s, dir) => {
      val o = Tables.t(s, dir, "orders")
      val l = Tables.t(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select(o("o_orderkey"), l("l_linenumber"),
          year(o("o_orderdate")).cast("long").as("yr"),
          month(o("o_orderdate")).cast("long").as("mo"),
          (expr("weekday(o_orderdate)") + 1).cast("long").as("dow_iso"),
          date_trunc("month", o("o_orderdate")).cast("date").as("month_start"),
          datediff(l("l_shipdate"), o("o_orderdate")).cast("long").as("ship_delay_days"))
        // (o_orderkey, l_linenumber) not unique — add ship_delay_days; the
        // residual dup rows are output-identical, hence interchangeable.
        .orderBy("o_orderkey", "l_linenumber", "ship_delay_days")
        .limit(100)
    }),

    "q_fn_math" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_quantity"),
          round(abs(col("l_extendedprice") - 1000.0), 6).as("abs_v"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_q"),
          round(log(col("l_extendedprice")), 6).as("ln_p"),
          round(pow(col("l_quantity"), 2), 6).as("pow_q"))
        // (l_orderkey, l_linenumber) is not unique; (…, price, qty) is.
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
        .limit(100)),

    "q_fn_array" -> ((s, dir) =>
      Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          array_contains(split(col("text"), " "), "spark").as("has_spark"),
          size(array_distinct(split(col("text"), " "))).cast("long").as("n_uniq"))
        .orderBy("doc_id")
        .limit(100)),

    "q_fn_json" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("cnt"))
        // k is nullable (a malformed props row would produce NULL) and the
        // engines' default null order differs under the LIMIT — pin it
        .orderBy(col("k").asc_nulls_first)
        .limit(10)),

    // MAP-typed path (closes SURVEY §2.7's last test-only row): lift the
    // props JSON into a real MapType via str_to_map, then exercise map
    // access, map_keys and size — all codegen'd built-ins, no UDF.
    // Shape notes (r14, VERDICT r13 wrong #2 — the registry's last
    // SortAggregate): (a) the map EXTRACTIONS project to scalars BEFORE
    // the groupBy (a MapType column in the aggregate's input schema
    // knocks out HashAggregate — the r6/r12 complex-type disease), and
    // (b) min(STRING) itself puts an immutable type in the aggregation
    // buffer and sort-aggs the whole corpus (measured; min_by too), so
    // the key minimum runs as hash-distinct (string group KEYS hash
    // fine — only buffers can't) + row_number over the distinct pairs:
    // corpus-scale work is all HashAggregate, the window and join see
    // ≤ |event_type × distinct keys| rows. DuckDB twin builds the same
    // MAP with map(list, list) (its m[k] yields a LIST — index [1]).
    "q_fn_map" -> ((s, dir) => {
      val base = Tables.events(s, dir)
        .withColumn("m",
          expr("str_to_map(regexp_replace(props, '[{}\" ]', ''), ',', ':')"))
        .select(col("event_type"),
          expr("CAST(m['k'] AS BIGINT)").as("mk"),
          size(col("m")).cast("long").as("msz"),
          expr("map_keys(m)[0]").as("mk0"))
      val agg = base.groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(col("mk")).as("sum_k"),
          max(col("msz")).as("max_size"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("mk0")
      val minKey = base.filter(col("mk0").isNotNull) // min() ignores nulls
        .select("event_type", "mk0").distinct()
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("mk0").as("min_key"))
      agg.join(minKey, Seq("event_type"), "left")
        .orderBy("event_type")
    }),

    // semi-structured VARIANT path (Spark 4): parse once into the binary
    // variant encoding, extract typed fields with variant_get — the
    // schema-on-read shape for heterogeneous event payloads (at 100 TB
    // shredded variant subcolumns make these extractions columnar; plain
    // JSON strings re-parse per access). Oracle = DuckDB's JSON path.
    "q_fn_variant" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          min("k").as("k_min"), max("k").as("k_max"),
          count(when(col("k") > 50, 1)).as("n_high"))
        .orderBy("event_type")),

    "q_fn_case_coalesce" -> ((s, dir) =>
      Tables.t(s, dir, "orders")
        .select(
          when(col("o_totalprice") < 100000, "low")
            .when(col("o_totalprice") < 250000, "mid")
            .otherwise("high").as("bucket"),
          expr("coalesce(nullif(o_orderpriority, '1-URGENT'), 'fallback')").as("prio"))
        .groupBy("bucket", "prio")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bucket", "prio")),

    // fuzzy matching for entity resolution: edit distance to a probe key
    // (same Levenshtein definition in both engines)
    "q_fn_levenshtein" -> ((s, dir) =>
      Tables.t(s, dir, "customer")
        .select(col("c_custkey"),
          levenshtein(col("c_name"), lit("Customer#000000042")).cast("long").as("dist"))
        .filter(col("dist") <= 2)
        .orderBy("c_custkey")),

    // generator / lateral surface: posexplode a bounded slice — the
    // UDTF-shaped row expansion (one input row → N output rows with
    // ordinal), matched to DuckDB's unnest-over-range lateral join
    "q_fn_posexplode" -> ((s, dir) =>
      Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(slice(split(col("text"), " "), 1, 5)).as(Seq("pos", "token")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"))
        .orderBy("doc_id", "pos")
        .limit(200))
  )

  val oracle: Map[String, String] = Map(
    "q_fn_string" ->
      """SELECT c_custkey, upper(c_mktsegment) AS seg_u,
        |  substring(c_name, 1, 8) AS name8,
        |  concat_ws('|', c_mktsegment, c_name) AS joined,
        |  replace(c_name, '#', '-') AS repl,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  CAST(nullif(regexp_extract(c_name, '[0-9]+', 0), '') AS BIGINT) AS name_num
        |FROM customer ORDER BY c_custkey LIMIT 100""".stripMargin,

    "q_fn_date" ->
      """SELECT o.o_orderkey, l.l_linenumber,
        |  CAST(year(o.o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o.o_orderdate) AS BIGINT) AS mo,
        |  CAST(date_part('isodow', o.o_orderdate) AS BIGINT) AS dow_iso,
        |  CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month_start,
        |  CAST(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS BIGINT) AS ship_delay_days
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |ORDER BY o.o_orderkey, l.l_linenumber, ship_delay_days LIMIT 100""".stripMargin,

    "q_fn_math" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity,
        |  ROUND(abs(l_extendedprice - 1000.0), 6) AS abs_v,
        |  ROUND(sqrt(l_quantity), 6) AS sqrt_q,
        |  ROUND(ln(l_extendedprice), 6) AS ln_p,
        |  ROUND(power(l_quantity, 2), 6) AS pow_q
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity
        |LIMIT 100""".stripMargin,

    "q_fn_array" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
        |FROM documents ORDER BY doc_id LIMIT 100""".stripMargin,

    "q_fn_json" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, COUNT(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY k NULLS FIRST LIMIT 10""".stripMargin,

    "q_fn_map" ->
      """WITH lifted AS (
        |  SELECT event_type,
        |    map(list_transform(string_split(regexp_replace(props, '[{}" ]', '', 'g'), ','),
        |          x -> string_split(x, ':')[1]),
        |        list_transform(string_split(regexp_replace(props, '[{}" ]', '', 'g'), ','),
        |          x -> string_split(x, ':')[2])) AS m
        |  FROM events)
        |SELECT event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(m['k'][1] AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MAX(cardinality(m)) AS BIGINT) AS max_size,
        |  MIN(map_keys(m)[1]) AS min_key
        |FROM lifted GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_fn_variant" ->
      """SELECT event_type, COUNT(*) AS n,
        |  MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
        |  MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max,
        |  CAST(COUNT(*) FILTER (WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 50)
        |       AS BIGINT) AS n_high
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_fn_case_coalesce" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
        |            WHEN o_totalprice < 250000 THEN 'mid'
        |            ELSE 'high' END AS bucket,
        |  coalesce(nullif(o_orderpriority, '1-URGENT'), 'fallback') AS prio,
        |  COUNT(*) AS cnt
        |FROM orders GROUP BY 1, 2 ORDER BY bucket, prio""".stripMargin,

    "q_fn_levenshtein" ->
      """SELECT c_custkey,
        |  CAST(levenshtein(c_name, 'Customer#000000042') AS BIGINT) AS dist
        |FROM customer
        |WHERE levenshtein(c_name, 'Customer#000000042') <= 2
        |ORDER BY c_custkey""".stripMargin,

    "q_fn_posexplode" ->
      """SELECT doc_id, i AS pos, toks[i + 1] AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d,
        |  unnest(range(0, least(5, len(toks)))) t(i)
        |ORDER BY doc_id, pos LIMIT 200""".stripMargin
  )
}
