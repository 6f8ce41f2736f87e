package graft.queries

import graft.{QueryPack, Tables}
import graft.operators.TokenPacker
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the selection half of a training-data
  * pipeline: deterministic reproducible sampling, weighted source mixing,
  * token-budget packing, and the composed curate step (quality filter →
  * exact dedup → sample). All oracle-checked against DuckDB.
  *
  * Determinism discipline: sampling uses a Knuth multiplicative hash on
  * doc_id reduced mod a prime FIRST (((doc_id % 1000003) * 2654435761)
  * % 1000) so the product never overflows int64 at any corpus size —
  * Spark wraps silently on overflow where DuckDB raises, so staying in
  * range is a cross-engine correctness requirement, not a style choice.
  * The bucket is a pure function of the row id: the sample is stable
  * across runs, partitionings, and engines (at 100 TB you'd widen to
  * xxhash64(doc_id) % 1000 — same shape, not SQL-portable to the oracle).
  *
  * Scale notes: sampling/mixing are map-only filters (no shuffle; the
  * rates dim broadcasts). Packing is the distributed two-pass prefix sum
  * (operators.TokenPacker) — the oracle's global window cumsum is the
  * single-reducer shape it replaces. The curate pipeline is filter →
  * hash-partitioned dedup window → map filter: one shuffle on the
  * fingerprint, which is also how it shards at 100 TB.
  */
object CurationQueries extends QueryPack {

  /** permille bucket 0..999, identical arithmetic in both engines. */
  private val bucketSql = "((doc_id % 1000003) * 2654435761) % 1000"

  /** Source mixing rates: srcN → (N % 4 + 1) * 200 permille — written as
    * a literal VALUES dim on both sides so the weights are data, not code.
    */
  private val mixRates: Seq[(String, Long)] =
    (0 until 20).map(i => (s"src$i", (i % 4 + 1) * 200L))

  private def mixRatesValues: String =
    mixRates.map { case (s, p) => s"('$s', $p)" }.mkString(", ")

  val queries: Map[String, Fn] = Map(
    // ---- deterministic reproducible sampling (~10%) ----
    "q_sample_hash" -> ((s, dir) =>
      Tables.t(s, dir, "documents")
        .filter(expr(s"$bucketSql < 100"))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")),

    // ---- weighted source mixing: per-source sampling rates ----
    "q_mix_weighted" -> ((s, dir) => {
      val docs = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val rates = s.createDataFrame(mixRates).toDF("r_source", "permille")
      docs.join(broadcast(rates), col("source") === col("r_source"))
        .filter(expr(s"$bucketSql < permille"))
        .groupBy("source", "permille")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").cast("long").as("n_tokens"))
        .orderBy("source")
    }),

    // ---- temperature-scaled source mixing (the α-smoothing recipe) ----
    // multilingual/multi-source LLM mixes upsample small sources by
    // raising raw token counts to α<1 (here α=0.5) and renormalizing:
    // target_share is the mixture weight a sampler would draw each source
    // with, upsample the ratio vs natural frequency. The smoothed weight
    // is floor(sqrt(tokens)) — sqrt of an integer-valued double is
    // correctly-rounded IEEE (identical both engines) and the floor makes
    // every downstream sum EXACT BIGINT arithmetic: no order-sensitive
    // double accumulation anywhere. Map-side partial agg, 20-row result.
    "q_mix_temperature" -> ((s, dir) => {
      val st = Tables.t(s, dir, "documents")
        .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          floor(sqrt(col("n_tokens").cast("double"))).as("w"))
      // totals via a 1-row broadcast, not a Window.partitionBy() total
      // (r13 uwin ban: even over a source-bounded frame, the empty
      // partition spec is the single-reducer class) — exact BIGINT sums
      // either way, same values. st checkpoints (source-bounded rows)
      // so the corpus scans ONCE, feeding both the rows and the total.
      val stC = st.localCheckpoint()
      val tot = stC.agg(sum("w").as("tot_w"), sum("n_tokens").as("tot_tok"))
      stC.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("w").cast("double") / col("tot_w"), 6).as("target_share"),
          round((col("w").cast("double") / col("tot_w")) /
            (col("n_tokens").cast("double") / col("tot_tok").cast("double")), 6)
            .as("upsample"))
        .orderBy("source")
    }),

    // ---- contiguous token-budget packing (2000 tokens per bin) ----
    "q_pack_contiguous" -> ((s, dir) =>
      TokenPacker.packContiguous(Tables.t(s, dir, "documents"), budget = 2000L)),

    // ---- greedy budgeted selection: best docs first, stop at 20k tokens ----
    // score = distinct-token count (exact integer — range boundaries can
    // never straddle engines); the oracle's global-window cumsum runs as
    // the distributed two-pass prefix sum (TokenPacker.selectBudget)
    "q_select_budget" -> ((s, dir) =>
      TokenPacker.selectBudget(Tables.t(s, dir, "documents"), budget = 20000L)),

    // ---- systematic proportional-to-weight sampling (~100 picks) ----
    // deterministic pick grid on the cumulative-token axis (no random
    // offset, so DuckDB agrees bit-for-bit); the oracle's global-window
    // cumsum runs as the same two-pass distributed prefix sum as
    // q_pack_contiguous (TokenPacker.systematic)
    "q_select_systematic" -> ((s, dir) =>
      TokenPacker.systematic(
        Tables.t(s, dir, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("weight")),
        n = 100L)),

    // ---- DSIR-style importance weighting (Xie et al., "Data Selection
    // for Language Models via Importance Resampling", 2023) ----
    // score(doc) = mean over token positions of ln(p_target / p_raw)
    // with add-1-smoothed unigram models — target = the English slice,
    // raw = the whole corpus; positive = "looks like the target
    // distribution", the resampling weight the paper importance-samples
    // by. Shape: both unigram models are TYPE tables (vocab-sized, not
    // corpus-sized) joined into ONE size-conditional log-ratio dim
    // (AQE broadcasts it at test scale, shuffle-joins it when a web
    // corpus's type table outgrows the threshold — r13); the token
    // stream joins it and reduces per doc, scanning the corpus once
    // (same discipline as q_text_perplexity, plan-proven there).
    "q_select_dsir" -> ((s, dir) => {
      val toks = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("token"))
      val tfr = toks.groupBy("token").agg(count(lit(1)).as("cr"))
      val tft = toks.filter(col("lang") === "en")
        .groupBy("token").agg(count(lit(1)).as("ct"))
      // vocab size and corpus totals reduce from the type table
      val consts = tfr.agg(sum("cr").cast("double").as("nr"),
        count(lit(1)).cast("double").as("v"))
        .crossJoin(toks.filter(col("lang") === "en")
          .agg(count(lit(1)).cast("double").as("nt")))
      val lr = tfr.join(tft, Seq("token"), "left")
        .crossJoin(broadcast(consts))
        .select(col("token"),
          (log((coalesce(col("ct"), lit(0L)).cast("double") + 1) / (col("nt") + col("v"))) -
            log((col("cr").cast("double") + 1) / (col("nr") + col("v")))).as("lr"))
      // SIZE-CONDITIONAL dim join (r13, the r12 vocab-broadcast weak):
      // the log-ratio dim is vocab-sized here but GBs on a web corpus —
      // sizedDimJoin materializes it so AQE broadcasts under the
      // threshold and shuffle-joins above it, instead of a hint that
      // OOMs at scale. Hash-identical either way.
      graft.operators.JoinPlanner.sizedDimJoin(toks, lr, Seq("token"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(col("lr")), 6).as("dsir_score"))
        .orderBy("doc_id")
    }),

    // ---- stratified sampling: exact per-language quota, hash-ordered ----
    // row_number over (lang, hash-bucket) gives each stratum its own
    // deterministic pseudo-random order, then a fixed quota — exact
    // per-class counts where rate-based sampling only hits them in
    // expectation. One shuffle on the stratum key; scales like any
    // partitioned window
    "q_sample_stratified" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy(expr(bucketSql), col("doc_id"))
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("lang"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 10)
        .orderBy("lang", "rn")
    }),

    // ---- incremental dedup: new batch vs already-ingested corpus ----
    // the steady-state pipeline shape (dedup each incoming batch against
    // history): fingerprint anti-join — one shuffle on the fingerprint,
    // history side prunable to its fingerprint column only. Even ids play
    // the seen corpus, odd ids the incoming batch (scale-invariant split)
    "q_dedup_incremental" -> ((s, dir) => {
      val fp = PipelineQueries.docFingerprint
      val docs = Tables.t(s, dir, "documents")
      val seen = docs.filter(col("doc_id") % 2 === 0).select(fp.as("fp"))
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), fp.as("fp"))
        .join(seen, Seq("fp"), "left_anti")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // ---- the composed curate step: quality filter → dedup → sample ----
    "q_curate_pipeline" -> ((s, dir) => {
      val scored = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          PipelineQueries.docFingerprint.as("fp"))
      val filtered = scored.filter(col("n_tokens") >= 5 && col("n_tokens") <= 5000)
      val w = Window.partitionBy("fp").orderBy("doc_id")
      filtered.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .filter(expr(s"$bucketSql < 500"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"))
        .orderBy("doc_id")
    })
  )

  /** The curate pipeline with in-flight audit metrics: an `Observation`
    * rides the SAME single action that materializes the kept set and
    * reports rows kept / tokens kept / fingerprint-dup survivors — the
    * numbers a data-governance report needs, with NO second pass over
    * the corpus (at 100 TB a recount is another full scan; accumulator-
    * backed observations are free). Returns the observed frame and the
    * observation; read `obs.get` after one action on the frame.
    */
  def auditedCuration(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("curate_audit")
    val out = queries("q_curate_pipeline")(s, dir)
      .observe(obs,
        count(lit(1)).as("n_kept"),
        sum(col("n_tokens")).as("tokens_kept"),
        count(when(col("n_tokens") >= 100, 1)).as("n_long"))
    (out, obs)
  }

  val oracle: Map[String, String] = Map(
    "q_sample_hash" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE $bucketSql < 100
         |ORDER BY doc_id""".stripMargin,

    "q_mix_weighted" ->
      s"""WITH rates AS (SELECT * FROM (VALUES $mixRatesValues) AS t(r_source, permille)),
         |docs AS (SELECT doc_id, source,
         |           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |         FROM documents)
         |SELECT source, CAST(permille AS BIGINT) AS permille,
         |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |FROM docs JOIN rates ON source = r_source
         |WHERE $bucketSql < permille
         |GROUP BY source, permille
         |ORDER BY source""".stripMargin,

    "q_select_dsir" ->
      """WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        |              FROM documents),
        |tfr AS (SELECT token, COUNT(*) AS cr FROM toks GROUP BY 1),
        |tft AS (SELECT token, COUNT(*) AS ct FROM toks WHERE lang = 'en' GROUP BY 1),
        |consts AS (SELECT
        |    (SELECT CAST(SUM(cr) AS DOUBLE) FROM tfr) AS nr,
        |    (SELECT CAST(COUNT(*) AS DOUBLE) FROM tfr) AS v,
        |    (SELECT CAST(COUNT(*) AS DOUBLE) FROM toks WHERE lang = 'en') AS nt),
        |lr AS (SELECT tfr.token,
        |         ln((CAST(COALESCE(tft.ct, 0) AS DOUBLE) + 1) / (c.nt + c.v)) -
        |         ln((CAST(tfr.cr AS DOUBLE) + 1) / (c.nr + c.v)) AS lr
        |       FROM tfr LEFT JOIN tft ON tfr.token = tft.token
        |       CROSS JOIN consts c)
        |SELECT t.doc_id, COUNT(*) AS n_tokens,
        |  ROUND(AVG(lr.lr), 6) AS dsir_score
        |FROM toks t JOIN lr ON t.token = lr.token
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    "q_mix_temperature" ->
      """WITH st AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |sw AS (SELECT source, n_docs, n_tokens,
        |         CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w
        |       FROM st),
        |tot AS (SELECT source, n_docs, n_tokens, w,
        |          SUM(w) OVER () AS tot_w, SUM(n_tokens) OVER () AS tot_tok
        |        FROM sw)
        |SELECT source, n_docs, n_tokens,
        |  ROUND(CAST(w AS DOUBLE) / tot_w, 6) AS target_share,
        |  ROUND((CAST(w AS DOUBLE) / tot_w) /
        |        (CAST(n_tokens AS DOUBLE) / CAST(tot_tok AS DOUBLE)), 6) AS upsample
        |FROM tot ORDER BY source""".stripMargin,

    "q_pack_contiguous" ->
      """SELECT doc_id, n_tokens,
        |  CAST((cum - n_tokens) // 2000 AS BIGINT) AS bin
        |FROM (SELECT doc_id, n_tokens,
        |        SUM(n_tokens) OVER (ORDER BY doc_id
        |                            ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM (SELECT doc_id,
        |              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |            FROM documents))
        |ORDER BY doc_id""".stripMargin,

    "q_select_budget" ->
      """WITH s AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS score
        |  FROM documents),
        |c AS (SELECT doc_id, score, n_tokens,
        |        CAST(SUM(n_tokens) OVER (ORDER BY score DESC, doc_id
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |          AS cum_tokens
        |      FROM s)
        |SELECT doc_id, score, n_tokens, cum_tokens
        |FROM c WHERE cum_tokens <= 20000 ORDER BY doc_id""".stripMargin,

    "q_select_systematic" ->
      """WITH s AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS weight
        |  FROM documents),
        |c AS (SELECT doc_id, weight,
        |        CAST(SUM(weight) OVER (ORDER BY doc_id
        |                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |          AS cum_weight
        |      FROM s),
        |t AS (SELECT CAST(SUM(weight) // 100 AS BIGINT) AS step FROM s)
        |SELECT doc_id, weight, cum_weight,
        |  CAST(cum_weight // step - (cum_weight - weight) // step AS BIGINT)
        |    AS n_picks
        |FROM c, t
        |WHERE cum_weight // step > (cum_weight - weight) // step
        |ORDER BY doc_id""".stripMargin,

    "q_sample_stratified" ->
      s"""SELECT doc_id, lang, rn FROM (
         |  SELECT doc_id, lang,
         |    CAST(row_number() OVER (PARTITION BY lang
         |                            ORDER BY $bucketSql, doc_id) AS BIGINT) AS rn
         |  FROM documents) s
         |WHERE rn <= 10
         |ORDER BY lang, rn""".stripMargin,

    "q_dedup_incremental" ->
      s"""WITH fp AS (SELECT doc_id, lang,
        |    ${PipelineQueries.docFingerprintSql} AS fp
        |  FROM documents)
        |SELECT n.doc_id, n.lang FROM fp n
        |WHERE n.doc_id % 2 = 1
        |  AND NOT EXISTS (SELECT 1 FROM fp o
        |                  WHERE o.doc_id % 2 = 0 AND o.fp = n.fp)
        |ORDER BY n.doc_id""".stripMargin,

    "q_curate_pipeline" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    ${PipelineQueries.docFingerprintSql} AS fp
         |  FROM documents),
         |filtered AS (SELECT * FROM scored WHERE n_tokens BETWEEN 5 AND 5000),
         |deduped AS (SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |    FROM filtered) s
         |  WHERE rn = 1)
         |SELECT doc_id, lang, source, n_tokens FROM deduped
         |WHERE $bucketSql < 500
         |ORDER BY doc_id""".stripMargin
  )
}
