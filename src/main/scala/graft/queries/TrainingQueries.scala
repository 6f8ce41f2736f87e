package graft.queries

import graft.{QueryPack, Tables}
import graft.operators.TokenPacker
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data preparation operators beyond curation/dedup — the ops a
  * team building an LLM corpus runs between "raw documents" and "tokenized
  * shards": benchmark decontamination, repetition-based quality filtering
  * (the Gopher rules' shape), tokenizer vocabulary construction, exact
  * embedding centroids, and behavioral sequence mining over the event
  * stream. All oracle-checked against DuckDB.
  *
  * Scale notes (100 TB):
  *  - decontamination joins the corpus' shingle table against the
  *    BENCHMARK shingle set — benchmarks are tiny (a few MB of eval data),
  *    so the set broadcasts and the corpus never shuffles; at production
  *    scale the broadcast side would be xxhash64-hashed shingles instead
  *    of strings (the oracle-portable form here keeps the strings).
  *  - repetition metrics are one explode + two keyed aggregations per
  *    document — embarrassingly parallel, shuffles keyed on doc_id only.
  *  - vocabulary construction aggregates the corpus down to the vocab
  *    (types, not tokens) before ranking, and the rank + running share
  *    run as TokenPacker.rankCumsum's range-partitioned rank + two-pass
  *    distributed prefix sum (r13) — no single-reducer window at ANY
  *    vocabulary size (a web corpus has 10⁸–10⁹ types).
  *  - centroids use a fixed-point trick for EXACT cross-engine sums:
  *    float32 inputs scaled by 2^24 and floored are summed as integers —
  *    associative and order-independent, so partition order can never
  *    flip a hash compare (double summation would be order-sensitive).
  */
object TrainingQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    // ---- benchmark decontamination: 3-gram overlap vs the eval set ----
    // "benchmark" = doc_id % 97 == 0 (a deterministic ~1% stand-in for a
    // held-out eval suite); a training doc is contaminated if it shares
    // any distinct 3-gram shingle with any benchmark doc. The benchmark
    // shingle set is distinct-ed and BROADCAST: the corpus-side shingle
    // stream is filtered in place, never shuffled.
    "q_text_contamination" -> ((s, dir) => {
      val sh = Tables.t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(0, size(toks) - 3)," +
            " i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])))")).as("sgl"))
      val bench = sh.filter(col("doc_id") % 97 === 0).select("sgl").distinct()
      sh.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "sgl")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        .orderBy("doc_id")
    }),

    // ---- Gopher-style repetition metrics per document ----
    // top-bigram share (most frequent bigram / all bigrams) and duplicate
    // -bigram fraction (repeated occurrences / all bigrams); the
    // `repetitive` flag compares in exact integer arithmetic (25·max >=
    // 2·total ⇔ share >= 0.08) so no float boundary can split engines.
    "q_text_repetition" -> ((s, dir) => {
      val bg = Tables.t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 2)," +
            " i -> concat(toks[i], ' ', toks[i + 1]))")).as("bg"))
      bg.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("mx"), sum("c").as("tot"),
          count(lit(1)).as("nd"))
        .select(col("doc_id"),
          col("tot").as("n_bigrams"),
          round(col("mx").cast("double") / col("tot"), 6).as("top_bigram_share"),
          round((col("tot") - col("nd")).cast("double") / col("tot"), 6).as("dup_frac"),
          (col("mx") * 25 >= col("tot") * 2).as("repetitive"))
        .orderBy("doc_id")
    }),

    // ---- tokenizer vocabulary construction with cumulative coverage ----
    // corpus term frequencies → rank by (cf desc, token) → running share
    // of the token stream each vocab prefix covers: the table a
    // frequency-based tokenizer (or an <unk> cutoff decision) reads off.
    // r13: the three global windows (row_number + running sum + total —
    // each a SINGLE-reducer stage holding the whole vocabulary, the r12
    // `weak`) are now TokenPacker.rankCumsum's range-partitioned
    // zipWithIndex rank + two-pass distributed prefix sum. A web-corpus
    // vocabulary is 10⁸–10⁹ types at 100 TB — this shape has no
    // single-reducer stage at any size. Same values to the bit: rank
    // and cum are exact integers, cum_share divides the same two longs
    // the windows produced (the oracle keeps its window formulation).
    "q_text_vocab" -> ((s, dir) => {
      val tf = Tables.t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cf"))
      val (ranked, total) = TokenPacker.rankCumsum(tf, "cf",
        Seq(col("cf").desc, col("token")))
      ranked.select(col("token"), col("cf"), col("rank"),
          round(col("cum").cast("double") / lit(total.toDouble), 6).as("cum_share"))
        .orderBy("rank")
    }),

    // ---- exact per-label embedding centroids (fixed-point sums) ----
    // float32 values scaled by 2^24 and floored sum EXACTLY as integers
    // (|v|<4 ⇒ |fx|<2^26, 64·500 terms ⇒ |Σ|«2^53): associative, so the
    // result is partition-order-independent and bitwise equal in DuckDB —
    // a double Σ would be order-sensitive and flip hash compares.
    "q_embed_centroid" -> ((s, dir) =>
      Tables.t(s, dir, "embeddings")
        .select(col("label").cast("long").as("label"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("label"), col("dim").cast("long").as("dim"),
          floor(col("x").cast("double") * 16777216).as("fx"))
        .groupBy("label", "dim")
        .agg(sum("fx").as("sfx"), count(lit(1)).as("n"))
        .select(col("label"), col("dim"),
          round(col("sfx").cast("double") / 16777216.0 / col("n"), 6).as("centroid"))
        .orderBy("label", "dim")),

    // ---- span-level exact-duplication signal (Lee et al., "Deduplicating
    // Training Data Makes Language Models Better") ----
    // every 8-token sliding window is a span; a span POSITION is
    // duplicated when its span text occurs >= 2 times anywhere in the
    // corpus (other docs or a within-doc repeat — exact-substring dedup
    // removes both). Per doc: span count, duplicated-position count, and
    // the duplicated fraction the pipeline thresholds on. Shape: ONE
    // shuffle of the span stream keyed on the span — a count window over
    // the span partition annotates every position with its corpus total,
    // so the former aggregate-then-join-back shape's second explode and
    // join disappear; at 100 TB the shuffle keys on xxhash64(span)
    // instead of the string (not oracle-portable, same result).
    "q_dedup_span" -> ((s, dir) => {
      val w = Window.partitionBy("span")
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 8)," +
            " i -> concat_ws(' ', slice(toks, i + 1, 8)))")).as("span"))
        .withColumn("c", count(lit(1)).over(w))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          count(when(col("c") >= 2, 1)).as("n_dup"),
          round(count(when(col("c") >= 2, 1)).cast("double") / count(lit(1)), 6)
            .as("dup_frac"))
        .orderBy("doc_id")
    }),

    // ---- unigram-LM negative log-likelihood per document ----
    // the CCNet-style "LM quality score" shape with the corpus itself as
    // the language model: nll(doc) = ln(N) − avg(ln cf(token)) — low =
    // stereotypical text, high = rare-token text; pipelines threshold on
    // it next to q_text_quality's surface stats. The term-frequency table
    // BROADCASTS (vocab is types, not tokens) and the grand total reduces
    // from tf, so the corpus token stream is never joined shuffle-side.
    "q_text_perplexity" -> ((s, dir) => {
      val tok = Tables.t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      // SIZE-CONDITIONAL dim (r13, the r12 vocab-broadcast weak): the tf
      // table is types-not-tokens but GBs on a web corpus — materialize
      // it so AQE broadcasts under the threshold and shuffle-joins above
      // it; the grand total reduces from the SAME materialization.
      val tf = graft.operators.JoinPlanner.sizedDim(
        tok.groupBy("token").agg(count(lit(1)).as("cf")))
      val tot = tf.agg(sum("cf").cast("double").as("n_total"))
      tok.join(tf, "token").crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          avg(log(col("cf"))).as("mll"), first(col("n_total")).as("nt"))
        .select(col("doc_id"), col("n_tokens"),
          round(log(col("nt")) - col("mll"), 6).as("nll"))
        .orderBy("doc_id")
    }),

    // ---- behavioral path mining: top 3-step event sequences ----
    // per-user event stream ordered by (µs, event_id) — the same total
    // order both engines see (epoch_us truncation proven by q_evt_funnel)
    // — sliding window of 3 via lead(); shuffle keys on user_id only.
    "q_evt_paths" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .withColumn("e2", lead("event_type", 1).over(w))
        .withColumn("e3", lead("event_type", 2).over(w))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("path"))
        .limit(20)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_text_contamination" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |           WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT doc_id,
        |         toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS sgl
        |       FROM d, unnest(range(1, len(toks) - 1)) AS t(i)),
        |bench AS (SELECT DISTINCT sgl FROM sh WHERE doc_id % 97 = 0)
        |SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM sh JOIN bench USING (sgl)
        |WHERE sh.doc_id % 97 != 0
        |GROUP BY sh.doc_id ORDER BY doc_id""".stripMargin,

    "q_text_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg
        |       FROM d, unnest(range(1, len(toks))) AS t(i)),
        |pc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |agg AS (SELECT doc_id, MAX(c) AS mx, CAST(SUM(c) AS BIGINT) AS tot,
        |          COUNT(*) AS nd
        |        FROM pc GROUP BY 1)
        |SELECT doc_id, tot AS n_bigrams,
        |  ROUND(CAST(mx AS DOUBLE) / tot, 6) AS top_bigram_share,
        |  ROUND(CAST(tot - nd AS DOUBLE) / tot, 6) AS dup_frac,
        |  (mx * 25 >= tot * 2) AS repetitive
        |FROM agg ORDER BY doc_id""".stripMargin,

    "q_text_vocab" ->
      """WITH tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cf FROM (
        |              SELECT unnest(string_split(text, ' ')) AS token
        |              FROM documents) t
        |            GROUP BY token)
        |SELECT token, cf,
        |  CAST(row_number() OVER (ORDER BY cf DESC, token) AS BIGINT) AS rank,
        |  ROUND(CAST(SUM(cf) OVER (ORDER BY cf DESC, token
        |                           ROWS UNBOUNDED PRECEDING) AS DOUBLE) /
        |        CAST(SUM(cf) OVER () AS DOUBLE), 6) AS cum_share
        |FROM tf ORDER BY rank""".stripMargin,

    "q_embed_centroid" ->
      """WITH x AS (SELECT CAST(label AS BIGINT) AS label, i AS dim,
        |             CAST(FLOOR(CAST(embedding[i + 1] AS DOUBLE) * 16777216) AS BIGINT) AS fx
        |           FROM embeddings, unnest(range(0, len(embedding))) AS t(i))
        |SELECT label, dim,
        |  ROUND(CAST(SUM(fx) AS DOUBLE) / 16777216.0 / COUNT(*), 6) AS centroid
        |FROM x GROUP BY label, dim ORDER BY label, dim""".stripMargin,

    "q_dedup_span" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |           WHERE len(string_split(text, ' ')) >= 8),
        |sp AS (SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS span
        |       FROM d, unnest(range(1, len(toks) - 6)) AS t(i)),
        |c AS (SELECT span, CAST(COUNT(*) AS BIGINT) AS c FROM sp GROUP BY 1)
        |SELECT sp.doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
        |  CAST(COUNT(*) FILTER (WHERE c.c >= 2) AS BIGINT) AS n_dup,
        |  ROUND(CAST(COUNT(*) FILTER (WHERE c.c >= 2) AS DOUBLE) / COUNT(*), 6)
        |    AS dup_frac
        |FROM sp JOIN c USING (span)
        |GROUP BY sp.doc_id ORDER BY doc_id""".stripMargin,

    "q_text_perplexity" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |tf AS (SELECT token, COUNT(*) AS cf FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cf) AS DOUBLE) AS n FROM tf)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  ROUND(ln((SELECT n FROM tot)) - AVG(ln(cf)), 6) AS nll
        |FROM tok JOIN tf USING (token)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_evt_paths" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |seq AS (SELECT event_type,
        |          lead(event_type, 1) OVER w AS e2,
        |          lead(event_type, 2) OVER w AS e3
        |        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT event_type || '>' || e2 || '>' || e3 AS path,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1 ORDER BY cnt DESC, path LIMIT 20""".stripMargin
  )
}
