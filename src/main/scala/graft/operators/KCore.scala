package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition — coreness(v) = the largest k such that v survives
  * in the subgraph where every vertex has degree ≥ k. The graph-curation
  * primitive behind "keep the densely-connected backbone": spam/link-farm
  * pruning, influence tiers, and robustness analysis all read core
  * numbers, and the peeling ORDER is the degeneracy ordering that makes
  * triangle-family algorithms linear-ish.
  *
  * Algorithm: distributed peeling with degree-jumping. Each round computes
  * degrees (one keyed aggregate), JUMPS the peel level k straight to the
  * current minimum degree + 1 when the graph is everywhere denser than k
  * — so every level in (k, minDeg] peels in a SINGLE round, not one round
  * per level: a chain of K5-cliques resolves in 2 rounds regardless of
  * chain length (OperatorSpec pins this). All vertices below the new k
  * are removed at once (two anti-joins on the edge list) with
  * core = k − 1; a vertex that leaves is exactly a vertex absent from the
  * surviving edge list, so the assignment is ONE anti-join of this
  * round's degree table against the survivors — which also catches
  * vertices whose last neighbor was removed this round (dropping them
  * silently was the obvious bug; the spec's star graph pins it).
  *
  * Round bound: every round removes ≥ 1 vertex (the minimum-degree vertex
  * is always below the post-jump k), so rounds ≤ |V|; with jumping,
  * rounds = Σ over peel levels of that level's cascade-wave count, which
  * collapses to ≈ #distinct core values on graphs whose minimum degree
  * tracks coreness. The adversarial case is a long path at a fixed level
  * (one wave per 2 endpoints) — inherent to the peel formulation, and
  * still |V|/2 vertex-keyed shuffles over a SHRINKING edge list, never a
  * corpus. Per round the driver does ONE scalar collect and the loop runs
  * three jobs (degree checkpoint, g2 checkpoint, cores-accumulator
  * checkpoint); the previous round's edge/degree/accumulator blocks are
  * freed INSIDE the loop as soon as their successors materialize (the
  * [[PageRank]] discipline — round-8 kept every round's blocks alive
  * until exit, and that residue is what inflated late-suite queries).
  */
object KCore {

  /** (id, core) for every vertex appearing in `edges` (undirected; both
    * or either direction may be present, self-loops dropped).
    */
  def coreness(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
               maxIters: Int = 1000): DataFrame =
    corenessCounted(edges, srcCol, dstCol, maxIters)._1

  /** As [[coreness]], also returning the number of peel rounds the loop
    * ran — the scale diagnostic the deep-core spec asserts on.
    */
  def corenessCounted(edges: DataFrame, srcCol: String = "src",
                      dstCol: String = "dst",
                      maxIters: Int = 1000): (DataFrame, Int) = {
    val spark = edges.sparkSession
    val sc = spark.sparkContext
    def ckpt(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint()
      (out, (sc.getPersistentRDDs.keySet -- before).toSet)
    }
    def free(ids: Set[Int]): Unit = ids.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    val half = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    var (g, gIds) = ckpt(
      half.union(half.select(col("dst").as("src"), col("src").as("dst"))).distinct())
    var (cores, coreIds) = ckpt(
      spark.range(0).select(col("id"), col("id").as("core")))
    var k = 1L
    var rounds = 0
    var done = false
    while (!done && rounds < maxIters) {
      val (deg, degIds) = ckpt(g.groupBy("src").agg(count(lit(1)).as("deg")))
      // one driver round-trip: min degree AND emptiness from the same row
      val probe = deg.agg(min("deg").as("m"), count(lit(1)).as("n")).collect()(0)
      if (probe.getLong(1) == 0L) {
        free(degIds)
        done = true
      } else {
        val minDeg = probe.getLong(0)
        if (minDeg >= k) k = minDeg + 1 // peel ALL levels ≤ minDeg this round
        val rm = deg.filter(col("deg") < k).select(col("src").as("id"))
        val (g2, g2Ids) = ckpt(g
          .join(rm.select(col("id").as("src")), Seq("src"), "left_anti")
          .join(rm.select(col("id").as("dst")), Seq("dst"), "left_anti"))
        // everything that left the degree table this round — the rm set
        // plus vertices whose last edge vanished — in one anti-join
        val removed = deg.select(col("src").as("id"))
          .join(g2.select(col("src").as("id")).distinct(), Seq("id"), "left_anti")
          .withColumn("core", lit(k - 1))
        val (cores2, cores2Ids) = ckpt(cores.union(removed))
        // cores2 and g2 are materialized — this round's deg and the
        // previous round's g/cores back nothing anymore; free them now
        free(gIds); free(coreIds); free(degIds)
        g = g2; gIds = g2Ids
        cores = cores2; coreIds = cores2Ids
        rounds += 1
      }
    }
    require(done, s"k-core peeling did not terminate in $maxIters rounds")
    free(gIds) // the loop exits only when g is empty
    val out = cores
      .select(col("id").cast("long").as("id"), col("core").cast("long").as("core"))
    (out, rounds)
  }
}
