package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.9 — similarity search & multimodal joins.
  *
  * The cosine kernel is pure higher-order-function SQL (zip_with +
  * aggregate), double precision, left-to-right accumulation — bitwise
  * identical to DuckDB's list_dot_product. Norms are computed ONCE per
  * vector, then pairs only pay one dot product.
  *
  * Scale notes: brute-force probe×corpus is the exact baseline — the probe
  * side is broadcast so the corpus never shuffles, and per-probe top-k is a
  * partitioned window. The O(n²) pair queries are label-partitioned so the
  * join is an equi-join on label with a range residual (never a raw cross
  * product). The 100 TB path is the LSH-bucketed variant in
  * graft.operators.AnnLsh (s_sim_ann_lsh): random-hyperplane signatures
  * bucket the corpus, candidates come from an equi-join on bucket.
  */
object SimQueries extends QueryPack {

  /** Fused codegen dot kernel (graft.functions.DotProduct) — bitwise
    * identical to the aggregate(zip_with(...)) HOF formulation and to the
    * DuckDB oracle's list_dot_product (left-to-right double accumulation),
    * but a tight primitive loop inside whole-stage codegen.
    */
  private def dot(a: String, b: String) = expr(s"graft_dot($a, $b)")

  /** Shared normed-embeddings prep — also used by PipelineQueries'
    * embedding near-dup so the two stay bitwise-aligned.
    *
    * Ranking/threshold discipline: windows order and filters compare on
    * the UNROUNDED sim (bitwise identical across engines via graft_dot ≡
    * list_dot_product); ROUND(…,6) is applied only to the output column.
    * Rounding first would put the cross-engine round-tie risk exactly on
    * the threshold/rank boundary.
    */
  private[queries] def withNorm(s: org.apache.spark.sql.SparkSession, dir: String) = {
    graft.functions.VectorFunctions.register(s)
    Tables.t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(dot("v", "v")))
  }

  /** Execution-time row-count VALVE for the two contracted EXACT pair
    * scans (VERDICT r11 item 7): they exist as oracle twins at test
    * scale, and pointing one at a large corpus by accident must fail
    * LOUDLY before the quadratic join melts the cluster, not grind.
    * Same assert_true-as-filter trick as SubstrDedup's doc-length guard
    * (the always-true filter cannot be pruned away); the bound check is
    * one count of the INPUT (linear) cross-joined in as a 1-row
    * broadcast guard, so the valve itself is distributed and lazy.
    */
  private[graft] def exactPairValve(df: org.apache.spark.sql.DataFrame,
                                      of: org.apache.spark.sql.DataFrame,
                                      bound: Long, tag: String) = {
    val guard = of.agg(count(lit(1)).as("__n"))
      .select(expr(s"assert_true(__n <= ${bound}L, " +
        s"'$tag: exact all-pairs kernel capped at $bound input rows — " +
        "route large corpora through the approximate twin " +
        "(s_dedup_embed_ann / s_dedup_semantic / s_sim_ann_lsh)')").as("__ok"))
    df.crossJoin(broadcast(guard)).filter(col("__ok").isNull).drop("__ok")
  }

  /** Default valve bound: generous for any test/oracle scale, far below
    * anything whose pair count (n²/2) a cluster should attempt exactly.
    */
  private[graft] val ExactPairBound = 250000L

  val queries: Map[String, Fn] = Map(
    "q_sim_cosine_topk" -> ((s, dir) => {
      val e = withNorm(s, dir)
      val p = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
      val w = Window.partitionBy("probe_id").orderBy(col("sim_raw").desc, col("neighbor_id"))
      broadcast(p).join(e, col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          (dot("pv", "v") / (col("pn") * col("nrm"))).as("sim_raw"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select(col("probe_id"), col("neighbor_id"),
          round(col("sim_raw"), 6).as("sim"), col("rn"))
        .orderBy("probe_id", "rn")
    }),

    "q_sim_pairs_threshold" -> ((s, dir) => {
      val e = withNorm(s, dir)
      val a = exactPairValve(e.select(col("vec_id").as("a_id"), col("label"),
        col("v").as("av"), col("nrm").as("an")),
        e, ExactPairBound, "q_sim_pairs_threshold")
      val b = e.select(col("vec_id").as("b_id"), col("label").as("b_label"),
        col("v").as("bv"), col("nrm").as("bn"))
      a.join(b, col("label") === col("b_label") && col("a_id") < col("b_id"))
        .filter(dot("av", "bv") / (col("an") * col("bn")) >= 0.18)
        .groupBy("label")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("label")
    }),

    "q_sim_knn_label" -> ((s, dir) => {
      val e = withNorm(s, dir)
      val p = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
      val wk = Window.partitionBy("probe_id").orderBy(col("sim_raw").desc, col("neighbor_id"))
      val knn = broadcast(p).join(e, col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("label"),
          (dot("pv", "v") / (col("pn") * col("nrm"))).as("sim_raw"))
        .withColumn("rn", row_number().over(wk))
        .filter(col("rn") <= 10)
      val wv = Window.partitionBy("probe_id").orderBy(col("votes").desc, col("label"))
      knn.groupBy("probe_id", "label")
        .agg(count(lit(1)).as("votes"))
        .withColumn("vr", row_number().over(wv))
        .filter(col("vr") === 1)
        .select(col("probe_id"), col("label").as("pred_label"), col("votes"))
        .orderBy("probe_id")
    }),

    "q_mm_join" -> ((s, dir) => {
      val d = Tables.t(s, dir, "documents")
      val e = Tables.t(s, dir, "embeddings")
      d.join(e, d("doc_id") === e("vec_id"))
        .groupBy(e("label"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum("n_chars").cast("double") / count(lit(1)), 6).as("avg_chars"))
        .orderBy("label")
    }),

    "q_mm_enriched_filter" -> ((s, dir) => {
      val d = Tables.t(s, dir, "documents")
      val e = Tables.t(s, dir, "embeddings")
      d.join(e, d("doc_id") === e("vec_id"))
        .filter(d("lang") === "en" && e("label").isin(0, 1))
        .select(d("doc_id"), d("lang"), d("n_chars"), e("label"))
        .orderBy(col("n_chars").desc, col("doc_id"))
        .limit(20)
    }),

    // HYBRID retrieval, query-by-example on doc 0: keyword top-20
    // (docs sharing the probe's first-5-token vocabulary, ranked by the
    // INTEGER triple matched-terms / total-tf / doc_id — rank fusion
    // doesn't care which keyword scorer supplies the ranks, and the
    // integer ranking is cross-engine exact where a BM25 ordering would
    // sit on the float-sum tie boundary) ∪ cosine top-20 (the proven
    // bitwise graft_dot ≡ list_dot_product kernel), fused by reciprocal
    // rank: rrf = Σ_side 1/(60 + rank), the Cormack/Clarke/Büttcher
    // constant. Ranks are small integers so both engines compute
    // bit-identical doubles in the same textual order; a doc absent
    // from one side contributes 0 (rank reported as 0). Scale shape:
    // each side is a bounded top-k via TakeOrderedAndProject (per-
    // partition heaps, no single-reducer window), ranks assigned by a
    // 20-row self-count; the fusion join touches ≤ 40 rows.
    "q_hybrid_rrf" -> ((s, dir) => {
      val docs = Tables.t(s, dir, "documents")
      val probeTerms = docs.filter(col("doc_id") === 0)
        .select(explode(slice(split(col("text"), " "), 1, 5)).as("term"))
        .distinct()
      val kw = docs.filter(col("doc_id") =!= 0)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .join(broadcast(probeTerms), "term")
        .groupBy("doc_id")
        .agg(countDistinct("term").as("n_t"), count(lit(1)).as("tf"))
      // each arm's top-20 is a TakeOrderedAndProject, NOT a global
      // window (VERDICT r11: the window funneled the full candidate set
      // through one partition). Ranks derive window-free from the 20
      // checkpointed survivors: rank = 1 + strictly-better count over
      // the same materialized values — identical to row_number because
      // the order is total (doc_id tiebreak).
      val kwTop = kw.orderBy(col("n_t").desc, col("tf").desc, col("doc_id"))
        .limit(20).localCheckpoint()
      val kw20 = kwTop.alias("a")
        .join(broadcast(kwTop.alias("b")),
          col("b.n_t") > col("a.n_t") ||
            (col("b.n_t") === col("a.n_t") && col("b.tf") > col("a.tf")) ||
            (col("b.n_t") === col("a.n_t") && col("b.tf") === col("a.tf") &&
              col("b.doc_id") < col("a.doc_id")), "left")
        .groupBy(col("a.doc_id").as("doc_id"))
        .agg((count(col("b.doc_id")) + 1).cast("long").as("kw_rank"))
      val e = withNorm(s, dir)
      val p = e.filter(col("vec_id") === 0)
        .select(col("v").as("pv"), col("nrm").as("pn"))
      val vecTop = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(p))
        .select(col("vec_id").as("doc_id"),
          (dot("pv", "v") / (col("pn") * col("nrm"))).as("sim_raw"))
        .orderBy(col("sim_raw").desc, col("doc_id"))
        .limit(20).localCheckpoint()
      val vec20 = vecTop.alias("a")
        .join(broadcast(vecTop.alias("b")),
          col("b.sim_raw") > col("a.sim_raw") ||
            (col("b.sim_raw") === col("a.sim_raw") &&
              col("b.doc_id") < col("a.doc_id")), "left")
        .groupBy(col("a.doc_id").as("doc_id"))
        .agg((count(col("b.doc_id")) + 1).cast("long").as("vec_rank"))
      kw20.join(vec20, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("kw_rank"), lit(0L)).as("kw_rank"),
          coalesce(col("vec_rank"), lit(0L)).as("vec_rank"),
          expr("round(coalesce(cast(1 as double) / (60 + kw_rank), cast(0 as double)) + " +
            "coalesce(cast(1 as double) / (60 + vec_rank), cast(0 as double)), 6)").as("rrf"))
        .orderBy("doc_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_sim_cosine_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |pairs AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
        |            list_dot_product(p.v, c.v) / (p.nrm * c.nrm) AS sim_raw
        |          FROM n p JOIN n c ON c.vec_id <> p.vec_id
        |          WHERE p.vec_id < 10),
        |ranked AS (SELECT probe_id, neighbor_id, sim_raw,
        |             CAST(row_number() OVER (PARTITION BY probe_id
        |                                     ORDER BY sim_raw DESC, neighbor_id) AS BIGINT) AS rn
        |           FROM pairs)
        |SELECT probe_id, neighbor_id, ROUND(sim_raw, 6) AS sim, rn FROM ranked WHERE rn <= 5
        |ORDER BY probe_id, rn""".stripMargin,

    "q_sim_pairs_threshold" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |p AS (SELECT a.label,
        |        list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim_raw
        |      FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT label, COUNT(*) AS cnt FROM p WHERE sim_raw >= 0.18
        |GROUP BY label ORDER BY label""".stripMargin,

    "q_sim_knn_label" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |pairs AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id, c.label,
        |            list_dot_product(p.v, c.v) / (p.nrm * c.nrm) AS sim_raw
        |          FROM n p JOIN n c ON c.vec_id <> p.vec_id
        |          WHERE p.vec_id < 20),
        |knn AS (SELECT probe_id, label FROM (
        |          SELECT probe_id, label,
        |            row_number() OVER (PARTITION BY probe_id
        |                               ORDER BY sim_raw DESC, neighbor_id) AS rn
        |          FROM pairs) s WHERE rn <= 10),
        |votes AS (SELECT probe_id, label, COUNT(*) AS votes FROM knn GROUP BY 1, 2)
        |SELECT probe_id, label AS pred_label, votes FROM (
        |  SELECT probe_id, label, votes,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY votes DESC, label) AS vr
        |  FROM votes) s WHERE vr = 1 ORDER BY probe_id""".stripMargin,

    "q_mm_join" ->
      """SELECT e.label, COUNT(*) AS n_docs,
        |  ROUND(CAST(SUM(d.n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |GROUP BY e.label ORDER BY e.label""".stripMargin,

    "q_mm_enriched_filter" ->
      """SELECT d.doc_id, d.lang, d.n_chars, e.label
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |WHERE d.lang = 'en' AND e.label IN (0, 1)
        |ORDER BY d.n_chars DESC, d.doc_id LIMIT 20""".stripMargin,

    // the rrf expression is textually identical to the Spark side:
    // ranks are small integers, so both engines produce bit-identical
    // doubles before the single ROUND
    "q_hybrid_rrf" ->
      """WITH qt AS (SELECT DISTINCT unnest(string_split(text, ' ')[1:5]) AS term
        |            FROM documents WHERE doc_id = 0),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |        FROM documents WHERE doc_id <> 0),
        |kw AS (SELECT doc_id, COUNT(DISTINCT term) AS n_t, COUNT(*) AS tf
        |       FROM tok JOIN qt USING (term) GROUP BY 1),
        |kwr AS (SELECT doc_id, CAST(row_number() OVER
        |          (ORDER BY n_t DESC, tf DESC, doc_id) AS BIGINT) AS kw_rank FROM kw),
        |kw20 AS (SELECT doc_id, kw_rank FROM kwr WHERE kw_rank <= 20),
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |      FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |p AS (SELECT v AS pv, nrm AS pn FROM n WHERE vec_id = 0),
        |sims AS (SELECT c.vec_id AS doc_id,
        |           list_dot_product(p.pv, c.v) / (p.pn * c.nrm) AS sim_raw
        |         FROM n c CROSS JOIN p WHERE c.vec_id <> 0),
        |vr AS (SELECT doc_id, CAST(row_number() OVER
        |         (ORDER BY sim_raw DESC, doc_id) AS BIGINT) AS vec_rank FROM sims),
        |v20 AS (SELECT doc_id, vec_rank FROM vr WHERE vec_rank <= 20)
        |SELECT doc_id,
        |  COALESCE(kw_rank, 0) AS kw_rank,
        |  COALESCE(vec_rank, 0) AS vec_rank,
        |  round(coalesce(cast(1 as double) / (60 + kw_rank), cast(0 as double)) +
        |        coalesce(cast(1 as double) / (60 + vec_rank), cast(0 as double)), 6) AS rrf
        |FROM kw20 FULL OUTER JOIN v20 USING (doc_id)
        |ORDER BY doc_id""".stripMargin
  )
}
