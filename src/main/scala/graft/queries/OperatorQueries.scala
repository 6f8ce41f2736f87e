package graft.queries

import graft.{QueryPack, Tables}
import graft.operators.{AnnLsh, Multimodal, MinHashDedup, SimHashDedup, TopKAggregator}

/** Spark-only operator surface (probabilistic / binary — no SQL oracle;
  * driver rows-only check + ScalaTest error bounds vs exact twins).
  */
object OperatorQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    // MinHash-LSH near-dup candidates (exact twin: q_dedup_ngram_jaccard)
    "s_dedup_minhash" -> ((s, dir) =>
      MinHashDedup.nearDupPairs(Tables.t(s, dir, "documents"))),

    // SimHash near-dup pairs at Hamming distance <= 3
    "s_dedup_simhash" -> ((s, dir) =>
      SimHashDedup.nearDupPairs(Tables.t(s, dir, "documents"))),

    // LSH-bucketed approximate top-5 cosine (exact twin: q_sim_cosine_topk)
    "s_sim_ann_lsh" -> ((s, dir) =>
      AnnLsh.approxTopK(s, Tables.t(s, dir, "embeddings"))),

    // multimodal binary-column featurize (stubbed decode, real plumbing)
    "s_mm_features" -> ((s, dir) => Multimodal.featureStats(s, dir)),

    // typed bounded top-k Aggregator (map-side-combinable window-topk twin)
    "s_topk_per_key" -> ((s, dir) =>
      TopKAggregator.topOrdersPerCustomer(Tables.t(s, dir, "orders"), 3))
  )

  val oracle: Map[String, String] = Map.empty
}
