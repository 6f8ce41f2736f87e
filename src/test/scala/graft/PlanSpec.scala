package graft

import org.apache.spark.sql.functions._

/** Plan-quality regression tests — the 100 TB claims, checked against the
  * actual physical plans (SURVEY.md §4): pushdown reaches the scan,
  * projection is pruned, dims broadcast, top-k fuses, and a bucketed
  * layout eliminates the join exchange entirely.
  */
class PlanSpec extends SparkSpec {

  // AQE finalizes the physical plan (incl. WholeStageCodegen spans) only
  // at execution — run the query, then read the final plan
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def plan(name: String): String =
    finalPlan(SparkEntry.queries(name)(spark, sfDir))

  test("PLANS_r17.json: covers every query; scans visible; sampled digests match") {
    val path = java.nio.file.Paths.get("PLANS_r17.json")
    assert(java.nio.file.Files.exists(path),
      "plan digest artifact missing — regenerate with `runMain graft.PlanDigest PLANS_r17.json`")
    val text = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    val entries = """"(\w+)": \{([^}]*)\}""".r.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2)).toMap
    val missing = SparkEntry.queries.keySet -- entries.keySet
    assert(missing.isEmpty, s"queries missing from the digest: ${missing.mkString(", ")}")
    // Every query must READ something — file scan, checkpointed-RDD scan
    // (iterative ops), or local relation. A digest where all of them are
    // zero means the traversal went blind again (the round-8 AQE regex
    // bug: 21/182 digests were near-empty and strategy flips inside
    // materialized stages were invisible). q_dedup_exact_groups is the
    // one query that legitimately folds to EmptyRelation at sf0.01
    // (zero duplicate-text groups there by fixture design).
    val emptyOk = Set("q_dedup_exact_groups")
    def cnt(body: String, k: String): Int =
      s""""$k":(\\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt).getOrElse(0)
    val blind = entries.collect { case (q, body)
      if !emptyOk(q) &&
        cnt(body, "scans") + cnt(body, "rdd_scans") + cnt(body, "local_scans") == 0 => q }
    assert(blind.isEmpty,
      s"digests reading nothing — traversal blind spot or plan bug: ${blind.mkString(", ")}")
    // REGISTRY-WIDE single-reducer ban (VERDICT r12 #2): no query may
    // execute an unpartitioned Window (every row through ONE task) at
    // the digest SF. The exemption set is EMPTY as of r14 —
    // q_win_ntile_pct itself now runs ScalableNtile.ntilePct (hash
    // unchanged). Anything regressing here needs rankBy / rankCumsum /
    // the TakeOrdered self-rank pattern, not an exemption.
    val uwinExempt = Set.empty[String]
    val single = entries.collect { case (q, body)
      if !uwinExempt(q) && cnt(body, "uwin") > 0 => q }
    assert(single.isEmpty,
      s"unpartitioned Window executed by: ${single.mkString(", ")}")
    // REGISTRY-WIDE SortAggregate ban (VERDICT r13 wrong #2): a map- or
    // array-typed column in an aggregate buffer silently downgrades
    // every partition to a per-exchange sort — at 100 TB that is the
    // whole corpus sorted for queries whose outputs are a few scalars.
    // Project complex-typed extractions to scalars BEFORE groupBy (the
    // r6/r12/r14 lesson, three sightings). Exemptions must carry a
    // measured justification; none exist today.
    val sortAggExempt = Set.empty[String]
    val sorted = entries.collect { case (q, body)
      if !sortAggExempt(q) && cnt(body, "sort_agg") > 0 => q }
    assert(sorted.isEmpty,
      s"SortAggregate executed by: ${sorted.mkString(", ")}")
    // recompute a sample — a strategy flip in a signature query fails
    // HERE even if no dedicated shape test covers it; regenerate the
    // artifact when the change is intentional (same SF as the artifact:
    // sf0.01, where AQE doesn't fold plans empty)
    for (q <- Seq("q_scan_filter_project", "q_join_broadcast_dim", "q_join_asof_nearest")) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      df.collect()
      val now = graft.PlanDigest.digest(df.queryExecution.executedPlan)
      val want = """"(\w+)":(\d+)""".r.findAllMatchIn(entries(q))
        .map(m => m.group(1) -> m.group(2).toInt).toMap
      assert(now == want, s"plan drift on $q: committed $want, now $now")
    }
  }

  test("hybrid retrieval and RFM hold no single-reducer window (VERDICT r11)") {
    // the r11 fix: top-k arms run TakeOrderedAndProject + a bounded
    // self-rank; RFM quintiles run ScalableNtile. Any window that
    // remains (e.g. searchTopK's per-probe rank inside
    // s_hybrid_store_rrf) must be PARTITIONED — an empty partitionSpec
    // is the every-row-through-one-task class the verdict banned.
    import org.apache.spark.sql.execution.window.WindowExec
    for (q <- Seq("q_hybrid_rrf", "q_evt_rfm", "s_hybrid_store_rrf")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      val bad = graft.PlanDigest.nodes(df.queryExecution.executedPlan)
        .collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      assert(bad.isEmpty,
        s"$q executes ${bad.size} unpartitioned Window node(s) — single-reducer regression")
    }
  }

  test("LSH pair dedups aggregate hash-based — no array-buffer SortAggregate (r12)") {
    // r6 lesson, third finding of the same disease (VERDICT r11 item 8):
    // dropDuplicates over rows CARRYING array columns plans first(array)
    // partials, which no hash aggregate supports — every candidate
    // partition gets sorted and the exchange carries the full vectors.
    // Both operators now score before deduping, so the aggregate sees
    // scalars only. (q_fn_map, the last SortAggregate holdout, projects
    // its map extractions to scalars pre-groupBy as of r14 — the PLANS
    // digest test above holds the registry-wide sort_agg=0 blanket.)
    import org.apache.spark.sql.execution.aggregate.SortAggregateExec
    for (q <- Seq("s_dedup_minhash", "s_sim_ann_lsh")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      val bad = graft.PlanDigest.nodes(df.queryExecution.executedPlan)
        .collect { case a: SortAggregateExec => a }
      assert(bad.isEmpty,
        s"$q executes ${bad.size} SortAggregate node(s) — array crept back into a dedup buffer")
    }
  }

  test("routed rollup aggregate scans the CUBE, not the fact table") {
    val df = SparkEntry.queries("q_agg_routed_rollup")(spark, sfDir)
    df.collect()
    val scans = PlanDigest.nodes(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    // readStore resolves the cube through its manifest, so rootPaths are
    // the cube's data FILES — every one must live under .../cube/, none
    // under .../fact
    assert(scans.nonEmpty &&
      scans.forall(p => p.contains("graft_fx_routed") && p.contains("/cube/")),
      s"RollupRewrite did not swap the fact scan for the cube scan: $scans")
  }

  test("filters and projection push into the parquet scan") {
    val p = plan("q_scan_filter_project")
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed:\n$p")
    assert(!p.contains("l_partkey"), "projection not pruned — unused column in scan")
  }

  test("dimension join broadcasts; aggregate is partial+final") {
    val p = plan("q_join_broadcast_dim")
    assert(p.contains("BroadcastHashJoin"), s"dim join must broadcast:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final HashAggregate")
  }

  test("asof-nearest runs the TopKPerKey plan — no sort of the candidate stream") {
    // AQE's toString prints the Initial Plan too — count nodes only in
    // the executed Final Plan section
    val p = plan("q_join_asof_nearest").split("== Initial Plan ==")(0)
    assert(!p.contains("Window"), s"nearest-event must not rank via a window:\n$p")
    // partial+final custom exec: one candidate per (probe,user) leaves
    // each map partition via the per-key heap; the probes×events stream
    // is never sorted (min_by/min-of-struct would SortAggregate) — the
    // only Sort allowed is the final presentation ORDER BY
    assert("TopKPerKey".r.findAllIn(p).size >= 2,
      s"expected partial+final TopKPerKeyExec:\n$p")
    assert(!p.contains("SortAggregate"), s"candidate stream must not sort-agg:\n$p")
    assert("Sort ".r.findAllIn(p).size <= 1, s"candidate stream must not sort:\n$p")
  }

  test("global top-k fuses into TakeOrderedAndProject (no global sort)") {
    val p = plan("q_sort_limit_topk")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must fuse:\n$p")
  }

  // in SparkPlan.toString, whole-stage-codegen stages carry a "*(n) " prefix
  private def hasCodegen(p: String): Boolean =
    p.contains("WholeStageCodegen") || "\\*\\(\\d+\\)".r.findFirstIn(p).isDefined

  test("whole-stage codegen covers the flagship aggregate") {
    val p = plan("q_agg_pricing_summary")
    assert(hasCodegen(p), s"flagship must be codegen'd:\n$p")
  }

  test("graft_dot kernel stays inside whole-stage codegen (no HOF interpreter)") {
    graft.functions.VectorFunctions.register(spark)
    val df = Tables.t(spark, sfDir, "embeddings")
      .select(expr("graft_dot(embedding, embedding)").as("d"))
      .agg(sum("d"))
    val p = finalPlan(df)
    assert(hasCodegen(p), s"kernel fell out of codegen:\n$p")
  }

  test("day-partitioned layout prunes partitions for time-range scans") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    graft.sources.Layout.writeEventsPartitionedByDay(
      Tables.events(spark, sfDir), dir)
    val scan = graft.sources.Layout.readPartitionedEvents(spark, dir)
      .filter(col("event_date") === "2024-01-05")
    val p = finalPlan(scan)
    assert(p.contains("PartitionFilters: [isnotnull(event_date"),
      s"partition filter must prune directories:\n$p")
    // pruned scan reads exactly that day's rows
    val expected = Tables.events(spark, sfDir)
      .filter(to_date(col("ts")) === "2024-01-05").count()
    assert(scan.count() == expected && expected > 0)
  }

  test("bucketed layout eliminates the join exchange (co-located join)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val o = Tables.t(spark, sfDir, "orders")
    val l = Tables.t(spark, sfDir, "lineitem")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
    // force a non-broadcast join so the bucketing effect is observable
    // (at real scale neither fact side fits a broadcast anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      val p = finalPlan(joined)
      // look only at the AQE final plan, not the Initial Plan echo
      val initIdx = p.indexOf("== Initial Plan ==")
      val fin = if (initIdx > 0) p.substring(p.indexOf("== Final Plan =="), initIdx) else p
      assert(fin.contains("SortMergeJoin"), s"expected SMJ over bucketed tables:\n$fin")
      val joinPart = fin.substring(fin.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle its inputs:\n$fin")
      assert(fin.contains("Bucketed: true"), s"scan must be bucket-aware:\n$fin")
      // and results equal the unbucketed join
      val plainCnt = o.join(l, col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.agg(sum("cnt")).first().getLong(0) == plainCnt)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  // AQE plans echo "== Initial Plan ==" after the final one — keep only
  // the executed section so Exchange counts aren't doubled
  private def finalSection(p: String): String = {
    val initIdx = p.indexOf("== Initial Plan ==")
    if (initIdx > 0) p.substring(0, initIdx) else p
  }

  test("TPC-H composite: date filters push to scans, dims broadcast") {
    val p = finalSection(plan("q_tpch_q5"))
    assert(p.contains("BroadcastHashJoin"), s"small dims must broadcast:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate") ||
      p.contains("GreaterThanOrEqual(o_orderdate"),
      s"orderdate range must reach the orders scan:\n$p")
    // the selective region filter must run at its scan, not after the join
    assert(p.contains("EqualTo(r_name,ASIA)"), s"region filter must push:\n$p")
  }

  test("correlated EXISTS decorrelates to a semi join (no per-row subquery)") {
    val p = finalSection(plan("q_subq_exists"))
    assert(p.contains("LeftSemi"), s"EXISTS must become a semi join:\n$p")
  }

  test("deterministic sampling is map-only: no shuffle before the output sort") {
    // everything up to the presentation ORDER BY must be scan+filter+project
    // — at 100 TB the sample is a free pushdown-adjacent pass, not a job
    val df = SparkEntry.queries("q_sample_hash")(spark, sfDir)
    val inner = df.queryExecution.optimizedPlan.children.head // strip Sort
    val p = inner.toString
    assert(!p.contains("Exchange") && !p.contains("Repartition"),
      s"sample filter must not shuffle:\n$p")
    val phys = finalSection(finalPlan(df))
    assert("Exchange".r.findAllIn(phys).size == 1,
      s"only the output range sort may exchange:\n$phys")
  }

  test("bpe encode is map-only: broadcast merges, one corpus scan, no exchange") {
    // the tokenizer-apply pass runs over all 100 TB — it must be a pure
    // map (merge ranks + vocab ride the closure as broadcasts), never a
    // shuffle; the training job's exchanges happen in their own queries
    // before encode's plan is built
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val merges = graft.operators.BpeTrainer.train(docs, numMerges = 16)
    val enc = graft.operators.BpeTrainer.encode(
      docs, merges, graft.operators.BpeTrainer.alphabet(docs))
    val p = finalPlan(enc)
    assert(!p.contains("Exchange") && !p.contains("Repartition"),
      s"encode must not shuffle:\n$p")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"encode reads the corpus exactly once:\n$p")
  }

  test("pivot: map-side partial aggregates, shuffles bounded by group keys") {
    val p = finalSection(plan("q_agg_pivot"))
    // Spark's relational pivot is two aggregate phases — (day, type) count,
    // then pivotfirst on day — each partial+final, so every shuffle input
    // is already reduced map-side; the hand-written COUNT(CASE…) twin (the
    // oracle's shape) would be one phase, but both are scan-dominated at
    // scale because the (day, type) pre-aggregate is tiny
    assert(p.contains("partial_count"), s"expected map-side partial count:\n$p")
    assert(p.contains("partial_pivotfirst"), s"expected partial pivot agg:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"pivot must shuffle at most twice (pre-agg key, group key):\n$p")
  }

  test("TPC-H Q6 is scan-side only: all predicates pushed, no join, no hash shuffle") {
    val p = finalSection(plan("q_tpch_q6"))
    // PushedFilters is elided in toString — check the scan-side DataFilters
    assert(p.contains("isnotnull(l_shipdate") && p.contains("l_quantity#") &&
      p.contains("< 24"),
      s"range predicates must reach the lineitem scan:\n$p")
    assert(!p.contains("Join"), s"Q6 has no join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"single global aggregate — only the final single-partition exchange:\n$p")
  }

  test("funnel: stage aggregates broadcast back, events never cartesian") {
    val p = finalSection(plan("q_evt_funnel"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"funnel stages must stay equi-joins:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"per-user stage frames are aggregate-small and must broadcast:\n$p")
  }

  test("decontamination: benchmark shingle set broadcasts, corpus never shuffles to it") {
    val p = finalSection(plan("q_text_contamination"))
    assert(p.contains("BroadcastHashJoin"),
      s"the benchmark shingle set is tiny and must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side shingles must not shuffle for the overlap join:\n$p")
  }

  test("runtime bloom filter prunes the fact side of a selectively-filtered join") {
    // Spark injects bloom_filter_might_contain on the big side when the
    // other side is selectively filtered — at 100 TB this is row-group
    // I/O pruning the fact scan never sees. Size thresholds are tuned for
    // clusters; shrink them so the injection logic runs at test scale.
    val conf = spark.conf
    // creationSideThreshold is a MAX (the filter-building side must be
    // small), applicationSideScanSizeThreshold a MIN (the pruned scan
    // must be big); broadcast joins skip injection (the hash table
    // already prunes), so force the shuffle-join shape clusters see
    val settings = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = settings.map { case (k, _) => k -> conf.getOption(k) }
    settings.foreach { case (k, v) => conf.set(k, v) }
    try {
      val li = Tables.t(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
      val ord = Tables.t(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val q = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .agg(sum("l_quantity"))
      val p = q.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n$p")
      q.collect() // and the plan still executes correctly with it
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("perplexity: term-frequency table broadcasts, token stream never shuffles to it") {
    val p = finalSection(plan("q_text_perplexity"))
    assert(p.contains("BroadcastHashJoin"),
      s"vocab (types, not tokens) is small and must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus token stream must not shuffle for the tf join:\n$p")
  }

  test("TPC-H Q19: disjunctive quantity bounds still reach the lineitem scan") {
    val p = finalSection(plan("q_tpch_q19"))
    // Catalyst extracts the per-side OR from the cross-column disjunction:
    // ((q>=1 && q<=11) || (q>=10 && q<=20) || (q>=20 && q<=30)) filters
    // the lineitem scan even though each bracket also references part
    assert(p.contains("l_quantity#") && p.contains("Or"),
      s"union of quantity brackets must filter the lineitem side:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"part dim must broadcast:\n$p")
  }

  test("TPC-H Q7: both nation dims broadcast; no cartesian anywhere") {
    // pinned to sf0.01: at sf0.001 the two-nation trade lanes are empty
    // and AQE folds the whole plan into EmptyRelation (no joins to see)
    val p = finalSection(finalPlan(
      SparkEntry.queries("q_tpch_q7")(spark, "/root/testdata/sf0.01")))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"both nation sides are 2 rows and must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"Q7 joins are all equi:\n$p")
  }

  test("attribution: horizon range join stays keyed on user, never cartesian") {
    val p = finalSection(plan("q_evt_attribution"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the view-click join must use the user_id equi key:\n$p")
  }

  test("span dedup: scan pruned to (doc_id, text); one span-keyed shuffle, no join") {
    val p = plan("q_dedup_span")
    assert(!p.contains("n_chars") && !p.contains("lang"),
      s"span dedup reads only doc_id+text — ReadSchema not pruned:\n$p")
    // corpus span totals come from a count window over the span
    // partition — the span stream shuffles ONCE on the span key and is
    // never joined back to itself (the former aggregate-then-join shape
    // evaluated the explode twice)
    assert(!p.contains("Join"), s"span totals must not need a join:\n$p")
    assert(p.contains("Window"), s"expected the count window:\n$p")
  }

  test("bloom probe is pure built-in expressions inside codegen") {
    val bits = graft.operators.BloomDedup.build(
      Tables.t(spark, sfDir, "documents").select(xxhash64(col("text")).as("fp")),
      col("fp"), 1 << 12, 7)
    val df = Tables.t(spark, sfDir, "documents")
      .filter(!graft.operators.BloomDedup.mightContain(bits, 1 << 12, 7, xxhash64(col("text"))))
    val p = finalPlan(df)
    assert(hasCodegen(p), s"bloom probe fell out of whole-stage codegen:\n$p")
    assert(!p.toLowerCase.contains("udf"), s"probe must not use a UDF:\n$p")
  }
}
