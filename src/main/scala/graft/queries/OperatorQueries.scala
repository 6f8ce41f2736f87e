package graft.queries

import graft.{QueryPack, Tables}
import graft.operators.{AnnIvf, AnnLsh, Multimodal, MinHashDedup, NgramJaccard, ScalableNtile, SimHashDedup, TopKAggregator}

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

    // IVF (k-means inverted lists) approximate top-5 cosine — the
    // data-adaptive scale path; measured recall@5 0.72 at nprobe=4/nlist=16
    // on this corpus vs 0.42 for LSH, scanning ~25% of the corpus
    "s_sim_ann_ivf" -> ((s, dir) =>
      AnnIvf.approxTopK(s, Tables.t(s, dir, "embeddings"))),

    // product-quantization ADC + exact re-rank — compresses the candidate
    // scan (codes instead of raw vectors); composes with IVF at scale
    "s_sim_ann_pq" -> ((s, dir) =>
      graft.operators.AnnPq.approxTopK(s, Tables.t(s, dir, "embeddings"))),

    // IVF-PQ: inverted lists prune the candidates, PQ codes shrink what
    // the pruned scan reads — the standard billion-vector composition
    "s_sim_ann_ivfpq" -> ((s, dir) =>
      graft.operators.AnnPq.approxTopK(s, Tables.t(s, dir, "embeddings"),
        nlist = 16, nprobe = 6)),

    // multimodal binary-column featurize (stubbed decode, real plumbing)
    "s_mm_features" -> ((s, dir) => Multimodal.featureStats(s, dir)),

    // typed bounded top-k Aggregator (map-side-combinable window-topk twin)
    "s_topk_per_key" -> ((s, dir) =>
      TopKAggregator.topOrdersPerCustomer(Tables.t(s, dir, "orders"), 3)),

    // df-cutoff n-gram Jaccard — the 100 TB guard against viral shingles
    // making the candidate join quadratic; identical to the exact twin
    // whenever every shared shingle's df <= cutoff (ScalaTest-proven)
    // (no output sort: s_* checks are order-insensitive, and the global
    // sort's range-sampling pass would re-evaluate the whole pair plan)
    "s_dedup_ngram_dfcut" -> ((s, dir) =>
      NgramJaccard.pairs(Tables.t(s, dir, "documents"), dfCutoff = Some(64L),
        sorted = false)),

    // exact scalable ntile twin: range-repartition global rank instead of
    // a single-reducer global window; identical output to q_win_ntile_pct
    "s_win_ntile_scalable" -> ((s, dir) =>
      ScalableNtile.ntilePct(Tables.t(s, dir, "orders"), 10)),

    // LSH-candidate + exact-rerank near-dup pairs — the scale path that
    // subsumes q_dedup_embed_cosine's all-pairs baseline (precision 1 by
    // construction; recall measured vs the exact twin in OperatorSpec)
    "s_dedup_embed_ann" -> ((s, dir) =>
      AnnLsh.nearDupPairs(s, Tables.t(s, dir, "embeddings"))),

    // PCA embedding compression (Spark ML, no UDFs in the bridge) — the
    // "shrink the vectors before the index" step; variance-retention and
    // norm-contraction proven in EmbedPcaSpec
    "s_embed_pca" -> ((s, dir) =>
      graft.operators.EmbedPca.project(Tables.t(s, dir, "embeddings")))
  )

  val oracle: Map[String, String] = Map.empty
}
