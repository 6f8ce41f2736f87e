package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  * on node id, nothing driver-side but the loop itself. Round state is
  * held with explicitly-managed persists (lineage truncates at the
  * InMemoryRelation leaf exactly as a checkpoint would) and every
  * superseded round's blocks are unpersisted IMMEDIATELY — the earlier
  * `localCheckpoint` version left each round's blocks pinned until the
  * periodic context cleaner (default 30 min), which in a 100-query
  * session is a storage leak that squeezes every later query.
  *
  * Each round ends with a POINTER JUMP (path halving): after taking the
  * min over neighbor labels, every node follows its new label one more
  * hop through the label table, so label chains collapse geometrically —
  * O(log diameter) rounds even on adversarial long-chain graphs (the
  * same doubling idea as Kiveris et al., "Connected Components in
  * MapReduce and Beyond"). Near-dup components are near-cliques, so in
  * practice 2–3 rounds converge regardless of corpus size.
  *
  * Scale notes: the edge list shuffles by node id each round — at 100 TB
  * that is the candidate-pair table, orders of magnitude below the
  * corpus. `maxIters` is a safety rail: non-convergence throws rather
  * than returning silently-partial labels.
  */
object DedupClusters {

  /** (id, cluster) for every node appearing in `pairs`; cluster = the
    * minimum node id of the connected component.
    */
  def components(pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id",
                 maxIters: Int = 20): DataFrame = {
    // materialize the (possibly expensive) pair detector ONCE before the
    // union — its two branches would otherwise each evaluate the upstream
    // plan; every propagation round then re-reads only these rows
    def dbg(m: String): Unit =
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(f"[cc] $m t=${System.nanoTime() / 1e9}%.2f")
    dbg("start")
    val half = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    dbg("half persist")
    // the union over the persisted half is cheap to recompute per round —
    // a second materialization would only add a copy of the data
    val edges = half
      .union(half.select(col("dst").as("src"), col("src").as("dst")))
    dbg("edges built")
    // persisted handle for the current round's label table (the thing we
    // unpersist when the round is superseded) and the projected view of it
    // that the next round joins against
    var labelsP = edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("nb_min"))
      .select(col("id"), least(col("id"), col("nb_min")).as("lbl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = labelsP
    dbg("labels init")
    var iters = 0
    var changed = 1L
    while (changed > 0 && iters < maxIters) {
      // candidate label per node = min label among its neighbors
      val cand = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(edges("src").as("cid")).agg(min(col("lbl")).as("cand"))
      val stepped = labels.join(cand, labels("id") === cand("cid"), "left")
        .select(labels("id"), labels("lbl"),
          least(labels("lbl"), coalesce(col("cand"), labels("lbl"))).as("mid"))
      // pointer jump (path halving): follow the new label one more hop
      // through the label table — labels chase 2^round hops per round, so
      // even adversarial chain graphs converge in O(log diameter) rounds
      val lblMap = labels.select(col("id").as("jid"), col("lbl").as("jlbl"))
      val next = stepped.join(lblMap, stepped("mid") === lblMap("jid"), "left")
        .select(stepped("id"), stepped("lbl"),
          least(col("mid"), coalesce(col("jlbl"), col("mid"))).as("nxt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // this count materializes `next` (and, round 1, `half` + the init
      // labels in the same job), so the old round can be dropped right after
      changed = next.filter(col("nxt") < col("lbl")).count()
      labelsP.unpersist(blocking = false)
      labelsP = next
      labels = next.select(col("id"), col("nxt").as("lbl"))
      iters += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(s"[cc] round $iters changed=$changed t=${System.nanoTime()/1e9}")
    }
    require(changed == 0,
      s"components did not converge after $maxIters rounds — the pair graph " +
        "has a longer diameter than near-dup clusters should; use a " +
        "star-contraction variant for this input")
    // hand back a plan with NO dependence on the loop's persisted state:
    // one eager localCheckpoint of the (tiny) final label table, then drop
    // every block the loop still holds
    val out = labels.select(col("id"), col("lbl").as("cluster")).localCheckpoint()
    labelsP.unpersist(blocking = false)
    half.unpersist(blocking = false)
    out
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
