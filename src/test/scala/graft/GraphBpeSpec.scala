package graft

import graft.operators.{BpeTrainer, PageRank}

/** Exactness tests for the round-5 operators: PageRank against an
  * independent driver-local reference on a hand-built graph (dangling
  * node included), BPE merges against the classic hand-computed example
  * (Sennrich et al. §3.2's low/lower/newest/widest corpus).
  */
class GraphBpeSpec extends SparkSpec {

  // independent local PageRank with the same semantics: damping teleport
  // + uniform dangling redistribution
  private def localPageRank(edges: Seq[(Long, Long)], iters: Int,
                            d: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val out = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
    var rank = nodes.map(_ -> 1.0 / nodes.size).toMap
    for (_ <- 0 until iters) {
      val dangling = nodes.filterNot(out.contains).map(rank).sum
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => rank(s) / out(s) }.sum
      }
      rank = nodes.map(n => n ->
        ((1 - d) / nodes.size +
          d * (contrib.getOrElse(n, 0.0) + dangling / nodes.size))).toMap
    }
    rank
  }

  private val g: Seq[(Long, Long)] =
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (3L, 5L))

  test("pagerank: matches the independent local reference on a dangling graph") {
    import spark.implicits._
    val got = PageRank.run(g.toDF("src", "dst"), iters = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = localPageRank(g, iters = 12, d = 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, r) =>
      assert(math.abs(r - want(id)) < 1e-9, s"node $id: $r vs ${want(id)}")
    }
    // node 3 receives from 1, 2 and 4 — it must outrank everything
    assert(got(3L) == got.values.max)
  }

  test("pagerank: mass is conserved (dangling + teleport)") {
    import spark.implicits._
    val total = PageRank.run(g.toDF("src", "dst"), iters = 7)
      .collect().map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-9, s"rank mass drifted: $total")
  }

  test("pagerank: zero iterations returns the uniform prior") {
    import spark.implicits._
    val got = PageRank.run(g.toDF("src", "dst"), iters = 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.values.foreach(v => assert(math.abs(v - 1.0 / 5) < 1e-12))
  }

  test("bpe: merge sequence matches the classic hand-computed example") {
    import spark.implicits._
    // Sennrich's corpus: low×5 lower×2 newest×6 widest×3. Hand-derived:
    // (e,s)@9 (ties (s,t),(t,</w>) broken lexicographically), (es,t)@9,
    // (est,</w>)@9, then (l,o)@7 (tie (o,w)), (lo,w)@7.
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val merges = BpeTrainer.train(Seq((1L, text)).toDF("doc_id", "text"),
        numMerges = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val want = Seq(
      (1L, "e", "s", 9L), (2L, "es", "t", 9L), (3L, "est", "</w>", 9L),
      (4L, "l", "o", 7L), (5L, "lo", "w", 7L))
    assert(merges.toSeq == want, s"got ${merges.toSeq}")
  }

  test("bpe: stops when the best pair drops below minCount; empty corpus is empty") {
    import spark.implicits._
    // every word unique → every pair count 1 < minCount=2 → zero merges
    val unique = BpeTrainer.train(Seq((1L, "ab cd ef")).toDF("doc_id", "text"))
    assert(unique.count() == 0)
    val empty = BpeTrainer.train(Seq.empty[(Long, String)].toDF("doc_id", "text"))
    assert(empty.count() == 0)
  }
}
