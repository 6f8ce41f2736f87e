package graft.queries

import graft.{QueryPack, Tables}
import graft.Fs.rmTree
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3/§2.5 `s_*` rows — approximate / sketch operators.
  * Spark-only (probabilistic ⇒ no DuckDB oracle; driver does a rows-only
  * check, ScalaTest bounds the error vs the exact twins).
  *
  * Scale notes: these ARE the 100 TB path. `approx_count_distinct` (HLL++)
  * and `hll_sketch_agg`/`hll_union_agg` (DataSketches) are mergeable —
  * partial sketches combine associatively across executors, so distinct
  * counting never shuffles raw keys, exactly like the reference's Redis
  * PFADD/PFMERGE workers. approx_percentile (KLL-style) likewise merges.
  */
object SketchQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    // approximate daily uniques — sketch twin of q_agg_distinct_daily
    "s_agg_hll" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          // mergeable DataSketches HLL: estimate from a reusable binary sketch
          expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("hll_sketch_users"))
        .orderBy("day")),

    // approximate quantiles — twin of q_quantile_exact. HASH-GRADE
    // oracle (promoted r17, audit row 3): at accuracy 10000 vs max
    // group ~3020 at sf0.01 the GK summary is in its EXACT regime
    // (rank error floor(n/accuracy) = 0), where approx_percentile's
    // answer is the ceil(p·n)-th smallest ≡ DuckDB quantile_disc.
    // ApproxQuantileExactSpec pins the 2× headroom at sf0.01 and the
    // ceil-rank rule on every boundary n (p·n integer) in 1..40; the
    // sf0.1 bench run stays genuinely approximate — only the
    // sf0.01-only oracle rides the exact regime.
    "s_agg_approx_quantile" -> ((s, dir) =>
      Tables.t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(expr("approx_percentile(o_totalprice, array(0.5, 0.9), 10000)").as("approx_p"))
        .select(col("o_orderpriority"),
          col("approx_p").getItem(0).as("p50"),
          col("approx_p").getItem(1).as("p90"))
        .orderBy("o_orderpriority")),

    // heavy hitters over event_type and user_id (count-min style).
    // freqItems returns ONE row of array columns; the verify harness's
    // pandas row-sort cannot hash arrays, so explode to scalar
    // (col, item) rows with a total order.
    "s_topk_freq" -> ((s, dir) =>
      Tables.events(s, dir)
        .stat.freqItems(Seq("event_type", "user_id"), 0.1)
        .select(explode(map(
          lit("event_type"), col("event_type_freqItems").cast("array<string>"),
          lit("user_id"), col("user_id_freqItems").cast("array<string>")))
          .as(Seq("col_name", "items")))
        .select(col("col_name"), explode(col("items")).as("item"))
        .orderBy("col_name", "item")),

    // mergeable-sketch rollup (the reference's PFMERGE analog): daily HLL
    // sketches union into a monthly distinct count per event_type WITHOUT
    // re-touching raw data — the 100 TB pattern for distinct over windows
    "s_agg_hll_union" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(expr("hll_sketch_agg(user_id)").as("daily_sketch"))
        .groupBy("event_type")
        .agg(expr("hll_sketch_estimate(hll_union_agg(daily_sketch))").as("monthly_users"),
          count(lit(1)).as("n_days"))
        .orderBy("event_type")),

    // mergeable QUANTILE-sketch rollup — the percentile analog of
    // s_agg_hll_union: daily BHYT histograms (operators.QuantileSketch)
    // union into monthly p50/p90/p99 per event_type without re-touching
    // raw data; deterministic, exact below bin capacity, error-bounded
    // in QuantileSketchSpec. Estimation is a declarative `aggregate`
    // walk over the bin array — no UDF after the sketch aggregate.
    "s_agg_quantile_union" -> ((s, dir) => {
      import graft.operators.QuantileSketch
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(QuantileSketch.sketchAgg(col("value").cast("double")).as("daily_sketch"))
        .groupBy("event_type")
        .agg(QuantileSketch.unionAgg(col("daily_sketch")).as("sk"),
          count(lit(1)).as("n_days"))
        .select(Seq(col("event_type"), col("n_days")) ++
          QuantileSketch.estimateCols(col("sk"), Seq(0.5, 0.9, 0.99)): _*)
        .orderBy("event_type")
    }),

    // Count-Min point-frequency estimates self-checked against exact
    // counts: one CMS over the full token stream (4×1024 LONGs ≈ 32 KiB,
    // map-side combined — only the matrix ever shuffles), then the
    // top-30 exact tokens probe it via the codegen'd built-in-expression
    // estimator. `overestimate` = est − exact is ≥ 0 by the CMS
    // one-sided guarantee, so the output is its own sanity check;
    // CountMinSpec pins the ≥ and εN bounds, the LOSSLESS element-wise
    // union (bitwise at ANY split — integer adds, unlike the pruning
    // SpaceSaving merge) and the parquet persist-union round-trip.
    "s_agg_cms" -> ((s, dir) => {
      import graft.operators.CountMinSketch
      val tok = Tables.t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
      val sk = tok.agg(CountMinSketch.sketchAgg(col("token")).as("sk"))
      tok.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("token")).limit(30)
        .crossJoin(broadcast(sk))
        .select(col("token"), col("exact_cnt"),
          CountMinSketch.estimate(col("sk"), col("token")).as("est_cnt"))
        .withColumn("overestimate", col("est_cnt") - col("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("token"))
    }),

    // cross-SESSION sketch rollup (the reference's PFMERGE-across-days
    // at warehouse scale): daily HLL + BHYT sketches are PERSISTED to a
    // day-partitioned parquet table, reloaded, and unioned into monthly
    // per-type distinct users and value percentiles — raw events are
    // touched exactly once, by the daily build. Union-after-reload ≡
    // single-pass is proven (bitwise, exact regime) in SketchStoreSpec.
    "s_agg_sketch_store" -> ((s, dir) => {
      import graft.operators.{QuantileSketch, SketchStore}
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(expr("hll_sketch_agg(user_id)").as("hll"),
          QuantileSketch.sketchAgg(col("value").cast("double")).as("qsk"))
      val store = java.nio.file.Files.createTempDirectory("graft_skstore").toString
      SketchStore.write(daily, store, "day")
      val users = SketchStore.rollupHll(s, store, Seq("event_type"), "hll")
        .withColumnRenamed("approx_distinct", "monthly_users")
        .drop("n_sketches")
      val out = SketchStore.rollupQuantiles(s, store, Seq("event_type"),
          "qsk", Seq(0.5, 0.9))
        .join(users, Seq("event_type"))
        .select(col("event_type"), col("n_sketches").as("n_days"),
          col("monthly_users"), col("p50"), col("p90"))
        .orderBy("event_type")
        .localCheckpoint() // materialize before the scratch store vanishes
      rmTree(store)
      out
    }),

    // HLL set ALGEBRA over mergeable sketches: distinct-user overlap
    // between two event types via inclusion-exclusion (|A∩B| = |A|+|B|
    // −|A∪B|, |A\B| = |A∪B|−|B|) — the audience-overlap question
    // answered from two per-segment sketches without ever co-shuffling
    // the raw user sets. Deterministic (DataSketches estimates are a
    // pure function of the sketch); error vs the exact overlap is
    // bounded in HllAlgebraSpec. Scale shape: two sketch aggregates +
    // a 1-row cross of the two 1-row frames.
    "s_agg_hll_algebra" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def sk(t: String, n: String) = ev.filter(col("event_type") === t)
        .agg(expr("hll_sketch_agg(user_id)").as(n))
      sk("view", "sk_a").crossJoin(sk("purchase", "sk_b"))
        .select(
          expr("hll_sketch_estimate(sk_a)").as("est_a"),
          expr("hll_sketch_estimate(sk_b)").as("est_b"),
          expr("hll_sketch_estimate(hll_union(sk_a, sk_b))").as("est_union"))
        // hll_sketch_estimate returns BIGINT — the algebra stays integer
        .select(col("est_a").as("est_view_users"),
          col("est_b").as("est_purchase_users"),
          col("est_union").as("est_either"),
          (col("est_a") + col("est_b") - col("est_union")).as("est_both"),
          (col("est_union") - col("est_b")).as("est_view_only"))
    }),

    // skew-salted two-phase aggregation over the stream table. The salt
    // never changes the answer (both phases are exact decimal sums), so
    // this carries a DuckDB oracle: the UNSALTED one-phase SQL must
    // hash-match — proving the two-phase rewrite is value-transparent.
    "s_agg_salted" -> ((s, dir) =>
      graft.operators.SaltedAgg.countSum(
        Tables.events(s, dir), "event_type", col("value").cast("decimal(18,2)"))
        .select(col("event_type"), col("cnt"),
          col("sum_value").cast("decimal(18,2)").cast("double").as("sum_value"))
        .orderBy("event_type")),

    // Space-Saving heavy hitters over the token stream — provable
    // (count, err) bounds from m counters per partition, partials merge
    // map-side (operators.SpaceSaving); m=16 < vocabulary so eviction
    // genuinely exercises on this corpus
    "s_topk_spacesaving" -> ((s, dir) => {
      val toks = Tables.t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .select(col("token"), xxhash64(col("token")).as("item"))
      graft.operators.SpaceSaving.topK(toks, "item", m = 16, k = 10)
        .join(toks.select("token", "item").distinct(), "item")
        .select(col("token"), col("est_count"), col("max_err"))
        .orderBy(col("est_count").desc, col("token"))
    }),

    // Bloom-membership incremental dedup — approximate twin of
    // q_dedup_incremental: the seen corpus folds into a broadcast bit
    // array (one mergeable aggregate), the new batch filters scan-side;
    // the seen corpus is never shuffled (operators.BloomDedup)
    "s_dedup_bloom" -> ((s, dir) => {
      val fp = xxhash64(PipelineQueries.docFingerprint)
      val docs = Tables.t(s, dir, "documents")
      val seen = docs.filter(col("doc_id") % 5 =!= 0).select(fp.as("fp"))
      val batch = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), fp.as("fp"))
      graft.operators.BloomDedup.novelRows(seen, batch, col("fp"))
        .select(col("doc_id"))
        .orderBy("doc_id")
    })
  )

  val oracle: Map[String, String] = Map(
    // exact-regime twin of s_agg_approx_quantile (r17): quantile_disc
    // IS approx_percentile's ceil(p·n) rank rule when rank error
    // floor(n/accuracy) = 0 — ApproxQuantileExactSpec pins the
    // headroom and the rule's boundary cases
    "s_agg_approx_quantile" ->
      """SELECT o_orderpriority,
        |  quantile_disc(o_totalprice, 0.5) AS p50,
        |  quantile_disc(o_totalprice, 0.9) AS p90
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // the unsalted single-phase twin of s_agg_salted — hash equality
    // proves the salted two-phase rewrite never changes values
    "s_agg_salted" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
