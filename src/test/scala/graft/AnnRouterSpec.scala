package graft

import graft.operators.AnnPq
import org.apache.spark.sql.functions.col

/** Two-level centroid router (the autoConfig 100 TB note, implemented):
  * assignment over many cells routes through √nlist super-cells +
  * branch-limited exact argmin. The contracts: high agreement with the
  * flat argmin on real embeddings, graceful fallback when every probed
  * super-cell is empty, and purity (same input → same cell).
  */
class AnnRouterSpec extends SparkSpec {

  private def unit(v: Array[Float]): Array[Double] = {
    val raw = v.map(_.toDouble)
    val n = math.sqrt(raw.map(x => x * x).sum)
    if (n > 0) raw.map(_ / n) else raw
  }

  // spec-local flat argmin — independent of the code under test
  private def flatNearest(u: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    for (i <- cents.indices) {
      var d2 = 0.0
      for (d <- u.indices) { val t = u(d) - cents(i)(d); d2 += t * t }
      if (d2 < bestD) { bestD = d2; best = i }
    }
    best
  }

  test("routed assignment: branch ladder agreement; every miss is a near-tie; pure") {
    import spark.implicits._
    val vecs = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().map { case (_, v) => unit(v) }
    assert(vecs.length >= 300, "fixture corpus")
    // any representative point set works as "centroids" for the
    // agreement question — k-means quality is not under test. This
    // near-uniform corpus is the router's WORST case (super-cells
    // barely separate), so the floors here are conservative.
    val cents = vecs.take(300)
    def rate(branch: Int): Double = {
      val router = AnnPq.buildRouter(cents, branch = branch)
      vecs.count(u =>
        AnnPq.nearestCellRouted(u, router) == flatNearest(u, cents))
        .toDouble / vecs.length
    }
    val ladder = Seq(2, 4, 8, 12).map(b => b -> rate(b))
    info(ladder.map { case (b, r) => f"branch=$b: $r%.3f" }
      .mkString("router agreement ladder — ", ", ",
        f" (${vecs.length} vectors, ${cents.length} cells)"))
    // monotone in branch, and the default branch must clear its floor
    assert(ladder.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a - 1e-9 })
    assert(ladder.toMap.apply(4) >= 0.80,
      "default-branch agreement collapsed — the router is broken, not approximate")
    // what actually protects recall: every disagreement lands in a
    // NEAR-TIED cell (distance² within 25% of the true nearest — on
    // this near-uniform sphere nearest-cell d² ≈ 1.2 and tie bands are
    // broad), which the probe's nprobe-cell fan-out re-covers; PqTune
    // measures end-to-end recall UNCHANGED (0.98 at sf0.1) at branch=4
    val router = AnnPq.buildRouter(cents, branch = 4)
    def d2(u: Array[Double], c: Array[Double]): Double =
      u.indices.map(d => (u(d) - c(d)) * (u(d) - c(d))).sum
    vecs.foreach { u =>
      val r = AnnPq.nearestCellRouted(u, router)
      val f = flatNearest(u, cents)
      if (r != f)
        assert(d2(u, cents(r)) <= d2(u, cents(f)) * 1.25,
          "a routed miss must land in a near-tied cell, not an arbitrary one")
    }
    // purity: a second routing of the same vectors is identical
    assert(vecs.forall(u =>
      AnnPq.nearestCellRouted(u, router) == AnnPq.nearestCellRouted(u, router)))
  }

  test("branch widening converges to the flat argmin; empty probed super-cells fall back") {
    import spark.implicits._
    val vecs = Tables.t(spark, sfDir, "embeddings")
      .select(col("embedding")).as[Array[Float]].collect().map(unit).take(200)
    val cents = vecs.take(100)
    // at branch = number of super-cells, routing IS the flat argmin
    val full = AnnPq.buildRouter(cents, branch = Int.MaxValue >> 1)
    assert(vecs.forall(u =>
      AnnPq.nearestCellRouted(u, full) == flatNearest(u, cents)),
      "routing over every super-cell must equal the flat argmin exactly")
    // hand-built router whose only probed super-cell has no children:
    // the fallback must return the true flat argmin, never -1/throw
    val u0 = vecs.head
    val far = cents(flatNearest(u0, cents)).map(-_) // opposite pole
    val degenerate = AnnPq.CellRouter(
      superCents = Array(u0.clone(), far),
      children = Array(Array.empty[Int], cents.indices.toArray),
      cents = cents, branch = 1)
    assert(AnnPq.nearestCellRouted(u0, degenerate) == flatNearest(u0, cents),
      "empty probed super-cell must fall back to the exact argmin")
  }
}
