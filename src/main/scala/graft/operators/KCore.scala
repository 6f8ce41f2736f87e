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
  * (skipping the empty stages a naive k += 1 loop would burn), removes
  * every vertex below k (two anti-joins on the edge list), and assigns
  * those vertices core = k − 1. Vertices whose last neighbor was removed
  * this round disappear from the edge list entirely — they peel at the
  * same stage and are caught by the explicit vanished-set diff (dropping
  * them silently was the obvious bug; the spec's star graph pins it).
  * Every round removes ≥ 1 vertex, so rounds ≤ |V| with the cascade
  * usually far shorter; each round's shuffles key on vertex id over the
  * CURRENT (shrinking) edge list — at 100 TB the cost tracks the edge
  * table, never a corpus, and the round state uses the repo's iterative
  * discipline (localCheckpoint + deterministic block cleanup on exit,
  * as in [[DedupClusters]]).
  */
object KCore {

  /** (id, core) for every vertex appearing in `edges` (undirected; both
    * or either direction may be present, self-loops dropped).
    */
  def coreness(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
               maxIters: Int = 1000): DataFrame = {
    val spark = edges.sparkSession
    val sc = spark.sparkContext
    val beforeIds = sc.getPersistentRDDs.keySet
    val half = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    var g = half.union(half.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val coreParts = Seq.newBuilder[DataFrame]
    var k = 1L
    var iters = 0
    var empty = g.isEmpty
    while (!empty && iters < maxIters) {
      val deg = g.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
      val minDeg = deg.agg(min("deg")).collect()(0).getLong(0)
      if (minDeg >= k) k = minDeg + 1 // jump over guaranteed-empty stages
      val rm = deg.filter(col("deg") < k).select(col("src").as("id"))
        .localCheckpoint()
      val g2 = g
        .join(rm.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(rm.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .localCheckpoint()
      // vertices that lost their last edge this round peel at this same
      // stage but never show up in a degree table again — diff them out
      val vanished = deg.select(col("src").as("id"))
        .join(rm, Seq("id"), "left_anti")
        .join(g2.select(col("src").as("id")).distinct(), Seq("id"), "left_anti")
        .localCheckpoint()
      coreParts += rm.union(vanished).withColumn("core", lit(k - 1))
      g = g2
      empty = g.isEmpty
      iters += 1
    }
    require(empty, s"k-core peeling did not terminate in $maxIters rounds")
    val parts = coreParts.result()
    val out = (if (parts.isEmpty)
        spark.range(0).select(col("id"), col("id").as("core"))
      else parts.reduce(_ union _))
      .select(col("id").cast("long").as("id"), col("core").cast("long").as("core"))
      .localCheckpoint()
    val added = sc.getPersistentRDDs.keySet -- beforeIds
    if (added.nonEmpty)
      (added - added.max).foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    out
  }
}
