package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERS from near-duplicate PAIRS — the step that turns
  * any pair detector (NgramJaccard, MinHashDedup, AnnLsh.nearDupPairs)
  * into an actual deduplicator: pairs only say "these two match"; keeping
  * one document per transitive group needs connected components plus a
  * canonical-representative rule.
  *
  * Algorithm: distributed min-label propagation ("hash-min"): every node
  * starts labeled with the smallest id among itself and its neighbors,
  * then each round replaces its label with the minimum over its
  * neighbors' labels, until a fixpoint. Each round is one equi-join of
  * the edge list with the label table plus a groupBy — all shuffles key
  * on node id, nothing driver-side but the loop itself, and
  * `localCheckpoint` truncates the growing lineage each round.
  *
  * Scale notes: rounds needed = graph diameter. Near-dup components are
  * near-cliques (every member matches most others), so the diameter is
  * tiny and 2–3 rounds converge regardless of corpus size; the edge list
  * shuffles by node id each round, which at 100 TB is the candidate-pair
  * table, orders of magnitude below the corpus. For adversarial
  * long-chain graphs the two-phase large-star/small-star alternation
  * (Kiveris et al., "Connected Components in MapReduce and Beyond")
  * converges in O(log²) rounds with the same join-shaped primitives —
  * swap the loop body, keep everything else. `maxIters` is a safety rail:
  * non-convergence throws rather than returning silently-partial labels.
  */
object DedupClusters {

  /** (id, cluster) for every node appearing in `pairs`; cluster = the
    * minimum node id of the connected component.
    */
  def components(pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id",
                 maxIters: Int = 20): DataFrame = {
    val half = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    val edges = half
      .union(half.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint() // materialize once: every round re-reads the edges
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("nb_min"))
      .select(col("id"), least(col("id"), col("nb_min")).as("lbl"))
      .localCheckpoint()
    var iters = 0
    var changed = 1L
    while (changed > 0 && iters < maxIters) {
      // candidate label per node = min label among its neighbors
      val cand = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(edges("src").as("cid")).agg(min(col("lbl")).as("cand"))
      val next = labels.join(cand, labels("id") === cand("cid"), "left")
        .select(labels("id"), labels("lbl"),
          least(labels("lbl"), coalesce(col("cand"), labels("lbl"))).as("nxt"))
        .localCheckpoint()
      changed = next.filter(col("nxt") < col("lbl")).count()
      labels = next.select(col("id"), col("nxt").as("lbl"))
      iters += 1
    }
    require(changed == 0,
      s"components did not converge after $maxIters rounds — the pair graph " +
        "has a longer diameter than near-dup clusters should; use a " +
        "star-contraction variant for this input")
    labels.select(col("id"), col("lbl").as("cluster"))
  }

  /** Per-document dedup decision over a pair table: every document in a
    * cluster labeled with the cluster's minimum doc id, `keep` true only
    * for that canonical minimum. Documents in no pair are absent (they
    * are trivially kept).
    */
  def canonical(pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id"): DataFrame =
    components(pairs, aCol, bCol)
      .select(col("id").as("doc_id"), col("cluster").as("cluster_id"),
        (col("id") === col("cluster")).as("keep"))
      .orderBy("doc_id")
}
