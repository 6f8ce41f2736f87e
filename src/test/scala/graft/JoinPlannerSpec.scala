package graft

import graft.operators.JoinPlanner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-driven join planning (operators.JoinPlanner): on the r5
  * PageRank shape (stats-less checkpointed tables) the bare join
  * sort-merges, autoJoin broadcasts the small side with NO hand hint;
  * the strategy ladder flips BROADCAST → SHUFFLE_HASH → SMJ as the
  * budgets shrink; and two SIZE-IDENTICAL inputs pick different
  * strategies purely from the CMS join-size estimate (the heavy-hitter
  * blowup veto).
  */
class JoinPlannerSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  // the r5 shape: iteration state whose SIZE the planner cannot see.
  // localCheckpoint propagates the ORIGIN plan's estimate, and for an
  // aggregate that estimate stays input-sized — the planner plans the
  // tiny ranks table as if it were lineitem-sized (exactly why PageRank
  // needed hand hints in r5)
  private def edges = Tables.t(spark, sfDir, "lineitem")
    .select(col("l_orderkey").as("src"), col("l_suppkey").as("dst"))
    .localCheckpoint()

  private def ranks = Tables.t(spark, sfDir, "lineitem")
    .groupBy(col("l_suppkey").as("dst"))
    .agg((count(lit(1)).cast("double")).as("rank"))
    .localCheckpoint()

  test("r5 shape: off-broadcast the planner sort-merges; sketch stats pick SHUFFLE_HASH unhinted") {
    // Spark 4.1 sees materialized localCheckpoint sizes, so SMALL sides
    // broadcast even statically — the r5 blindness that remains is the
    // SMJ-vs-SHJ choice once the build side exceeds the broadcast
    // budget (preferSortMergeJoin wins without evidence the build fits
    // a hash table). Emulate that regime at test scale by zeroing the
    // broadcast budget on both planners.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val bare = edges.join(ranks, Seq("dst")).queryExecution.sparkPlan.toString
      assert(bare.contains("SortMergeJoin"),
        s"precondition lost: off-broadcast join no longer defaults to SMJ\n$bare")
      val auto = finalPlan(JoinPlanner.autoJoin(edges, ranks, Seq("dst"),
        broadcastBytes = 0L))
      assert(auto.contains("ShuffledHashJoin"),
        s"sketch-planned join must hash the hash-sized build side:\n$auto")
      // values identical to the bare join
      val a = JoinPlanner.autoJoin(edges, ranks, Seq("dst"),
        broadcastBytes = 0L).count()
      val b = edges.join(ranks, Seq("dst")).count()
      assert(a == b)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("sizedDimJoin: small dim broadcasts; over-threshold dim falls to a shuffle join (VERDICT r12 #3)") {
    // the q_select_dsir / q_text_perplexity shape: a DERIVED vocab dim
    // joined into the token stream. An unconditional broadcast() hint is
    // the r12 weak (GBs at web-corpus scale); sizedDimJoin materializes
    // the dim so AQE decides from its REAL size
    val toks = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val dim = toks.groupBy("token").agg(count(lit(1)).as("cf"))
    val small = finalPlan(JoinPlanner.sizedDimJoin(toks, dim, Seq("token")))
    assert(small.contains("BroadcastHashJoin"),
      s"an under-threshold dim must still broadcast:\n$small")
    // same dim, threshold below its materialized size → no broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 1)
    try {
      val big = finalPlan(JoinPlanner.sizedDimJoin(toks, dim, Seq("token")))
      assert(!big.contains("BroadcastHashJoin"),
        s"an over-threshold dim must NOT broadcast:\n$big")
      assert(big.contains("SortMergeJoin") || big.contains("ShuffledHashJoin"),
        s"expected a shuffle join above the threshold:\n$big")
      // and the results are hash-identical either way
      assert(JoinPlanner.sizedDimJoin(toks, dim, Seq("token")).count() ==
        toks.join(broadcast(dim), "token").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("budget ladder: shrinking the broadcast budget flips BROADCAST -> SHUFFLE_HASH -> SMJ") {
    val shj = finalPlan(JoinPlanner.autoJoin(edges, ranks, Seq("dst"),
      broadcastBytes = 1L))
    assert(shj.contains("ShuffledHashJoin"),
      s"past the broadcast budget the build side should hash:\n$shj")
    val smj = finalPlan(JoinPlanner.autoJoin(edges, ranks, Seq("dst"),
      broadcastBytes = 1L, hashBytes = 1L))
    assert(smj.contains("SortMergeJoin"),
      s"past both budgets the join should sort-merge:\n$smj")
  }

  test("strategy flips on the CMS estimate alone: same sizes, different multiplicity") {
    import spark.implicits._
    val n = 2000
    // uniform keys: join output == n — hash join is safe
    val uniL = (0 until n).map(i => (i.toLong, i)).toDF("k", "a").localCheckpoint()
    val uniR = (0 until n).map(i => (i.toLong, i)).toDF("k", "b").localCheckpoint()
    // one hot key on both sides: output == n² — blowup veto → SMJ
    val hotL = (0 until n).map(i => (1L, i)).toDF("k", "a").localCheckpoint()
    val hotR = (0 until n).map(i => (1L, i)).toDF("k", "b").localCheckpoint()
    val sUL = JoinPlanner.stats(uniL, uniL("k"))
    val sUR = JoinPlanner.stats(uniR, uniR("k"))
    val sHL = JoinPlanner.stats(hotL, hotL("k"))
    val sHR = JoinPlanner.stats(hotR, hotR("k"))
    // identical row counts and byte estimates — only the sketches differ
    assert(sUL.rows == sHL.rows && sUL.bytes == sHL.bytes)
    val (uniStrat, _) = JoinPlanner.choose(sUL, sUR, broadcastBytes = 1L)
    val (hotStrat, _) = JoinPlanner.choose(sHL, sHR, broadcastBytes = 1L)
    assert(uniStrat == JoinPlanner.ShuffleHash,
      s"uniform keys (est ≈ n) must hash, got $uniStrat")
    assert(hotStrat == JoinPlanner.SortMerge,
      s"hot-key blowup (est ≈ n²) must veto the hash family, got $hotStrat")
    // and the executed plans follow the choice
    val hotPlan = finalPlan(JoinPlanner.autoJoin(hotL, hotR, Seq("k"),
      leftStats = Some(sHL), rightStats = Some(sHR), broadcastBytes = 1L))
    assert(hotPlan.contains("SortMergeJoin"), s"blowup case must SMJ:\n$hotPlan")
  }
}
