package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.8 — text analysis & exact dedup (LLM-pipeline mandate).
  *
  * Scale notes: tokenization is `explode(split(...))` — a Generator inside
  * whole-stage codegen, no shuffle until the counting aggregate (which is
  * partial+final). Exact dedup groups by `sha2(text,256)` — at 100 TB the
  * hash (32 bytes) is what shuffles, never the document body; the keeper
  * choice (min doc_id) is a plain min aggregate. tf-idf is two aggregates
  * plus a broadcast of the tiny doc-count; the df (document-frequency)
  * side is an aggregate over the exploded tokens, not a self-join.
  */
object TextQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    "q_text_tokens_top20" -> ((s, dir) =>
      Tables.t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20)),

    "q_text_doc_stats" -> ((s, dir) =>
      Tables.t(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("total_chars"),
          round(sum("n_chars").cast("double") / count(lit(1)), 6).as("avg_chars"),
          sum(size(split(col("text"), " "))).cast("long").as("total_tokens"))
        .orderBy("lang")),

    // TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    // the word co-occurrence graph — a term is central if central terms
    // co-occur with it. Composes two existing parts: the bigram pair
    // extraction (map-only transform, no self-join) and operators
    // .PageRank (per-round SHUFFLE_HASH against a checkpointed edge
    // layout). The vocab dictionary is TYPE-bounded, so its window-id
    // assignment and the edge joins broadcast; the corpus token stream
    // is touched once. ORACLE-PROMOTED r12 on the back of
    // PageRank.runExact: ranks iterate in exact integer 1e-12 mass
    // units, so the DuckDB twin (the shared exactOracleCtes recurrence
    // over the same co-occurrence edges) reproduces every keyword rank
    // bit for bit; TextRankSpec keeps the semantic pins
    // (hub-outranks-leaf, mass conservation).
    "s_text_keywords" -> ((s, dir) => {
      val docs = Tables.t(s, dir, "documents")
      // r17: checkpoint the pair set — it feeds FOUR separate actions
      // (the vocab count job, the vocab rank job, and the named-edge
      // build inside the PageRank action; rankBy's RDD jobs cannot
      // share plan-level exchange reuse), so the bigram extraction +
      // distinct re-ran per consumer
      val pairs = docs.select(split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(t) - 2)," +
            " i -> struct(t[i] AS t1, t[i + 1] AS t2))")).as("p"))
        .select(col("p.t1").as("t1"), col("p.t2").as("t2"))
        .filter(col("t1") =!= col("t2"))
        .distinct()
        .localCheckpoint()
      // vocab ids by GLOBAL term rank — the distributed zipWithIndex
      // rank (r13: a web corpus has 10⁸–10⁹ types; the former
      // row_number window put them all through one reducer). Identical
      // ids to the oracle's row_number OVER (ORDER BY term): same total
      // order, same 1-based numbering — the hash grade holds.
      // vocab is broadcast from three plan branches (both edge-naming
      // joins + the final rank join) — checkpoint so the range-sorted
      // zipWithIndex rank computes once, not once per broadcast (r17)
      val vocab = graft.operators.ScalableNtile.rankBy(
          pairs.select(col("t1").as("term"))
            .union(pairs.select(col("t2").as("term"))).distinct(),
          Seq(col("term")))
        .withColumnRenamed("rank", "id")
        .localCheckpoint()
      val named = pairs
        .join(broadcast(vocab.withColumnRenamed("term", "t1")
          .withColumnRenamed("id", "src")), Seq("t1"))
        .join(broadcast(vocab.withColumnRenamed("term", "t2")
          .withColumnRenamed("id", "dst")), Seq("t2"))
        .select(col("src"), col("dst"))
      val edges = named // undirected co-occurrence: both directions
        .unionAll(named.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      graft.operators.PageRank.runExact(edges, iters = 6)
        .withColumnRenamed("id", "rid")
        .join(broadcast(vocab), col("rid") === vocab("id"))
        // integer mass units — partition-order-free, no rounding anywhere
        .select(col("term"), col("rank").as("rank_u"))
        .orderBy(col("rank_u").desc, col("term"))
        .limit(20)
    }),

    // relational PHRASE SEARCH (operators.InvertedIndex): posting lists
    // (term, doc, positions) joined to the phrase's (offset, term) rows,
    // positions realigned to the phrase start — a base where all k
    // offsets land is one occurrence. The phrase itself is data-driven
    // (the corpus's most frequent trigram, ties lexicographic), so the
    // whole query is deterministic and oracle-hashable. Cost tracks the
    // probed terms' posting lists, never the corpus; the persisted,
    // bucket-pruned variant is s_text_index_phrase.
    "q_text_phrase" -> ((s, dir) => {
      import graft.operators.InvertedIndex
      val docs = Tables.t(s, dir, "documents")
      // one driver-side string: referencing the span subtree from two
      // plan branches re-ran the full trigram aggregate per branch
      val span = InvertedIndex.topSpan(docs)
      val toks = span.split(' ').toSeq
      // r17: phraseOccurrences only consumes the phrase terms' posting
      // rows (inner join on term), but the join can't push that predicate
      // below the posting aggregate — an explicit isin filter on the
      // grouping key can, so the whole-corpus collect_list aggregate
      // shrinks to the probed terms. Same rows out, proven by the oracle
      // hash (DuckDB computes its own posting CTE).
      InvertedIndex.phraseOccurrences(
          InvertedIndex.build(docs).filter(col("term").isin(toks.distinct: _*)),
          InvertedIndex.phraseFrame(s, toks))
        .select(col("doc_id"), lit(span).as("phrase"), col("n_occ"))
        .orderBy("doc_id")
    }),

    // BM25 ranked retrieval (operators.InvertedIndex.bm25): the standard
    // probabilistic relevance score over the same posting rows — idf from
    // posting-list lengths, tf damped by the per-doc length normalizer
    // (k1=1.2, b=0.75). The query is the corpus's top trigram's distinct
    // tokens (data-driven, same derivation as q_text_phrase), output is
    // every candidate doc ORDERED BY doc_id with the score as a rounded
    // VALUE column — never ordered/limited by the rounded double (the
    // tie-flip doctrine); both engines execute the textually identical
    // score expression (InvertedIndex.Bm25ScoreSql). Cost tracks the
    // query terms' posting lists alone — dl rides every posting row
    // (the Lucene norms-inline layout), so there is no corpus-sized
    // length join; the persisted, bucket-pruned variant is
    // s_text_index_bm25.
    "q_text_bm25" -> ((s, dir) => {
      import graft.operators.InvertedIndex
      val docs = Tables.t(s, dir, "documents")
      val terms = InvertedIndex.topSpan(docs).split(' ').toSeq.distinct
      // r17: the full-index checkpoint existed only so the corpus stats
      // (n_docs, Σdl) and the candidate postings could share one
      // materialization — but the stats are a plain aggregate over the
      // DOCUMENTS (dl = token count per doc; every doc has ≥1 split
      // token, so `distinct (doc_id, dl) over the index` ≡ one row per
      // document), and the candidate postings shrink to the query terms
      // when the isin filter is pushed BELOW the posting aggregate.
      // Neither needs the whole-corpus collect_list build materialized.
      // Values unchanged — the oracle hash re-proves it.
      val stats = docs
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("tot_dl"))
      InvertedIndex.bm25(
          InvertedIndex.build(docs).filter(col("term").isin(terms: _*)),
          stats)
        .select(col("doc_id"), col("n_terms"), col("bm25"))
        .orderBy("doc_id")
    }),

    "q_text_bigrams" -> ((s, dir) =>
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
          .as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram"))
        .limit(20)),

    "q_text_tfidf_top" -> ((s, dir) => {
      val docs = Tables.t(s, dir, "documents")
      val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val dfreq = toks.groupBy("token").agg(countDistinct("doc_id").as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("token"))
      tf.filter(col("doc_id") < 20)
        .join(dfreq, "token")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("token"),
          round(col("tf") * log(col("n").cast("double") / col("df")), 6).as("tfidf"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("doc_id", "token", "tfidf", "rn")
        .orderBy("doc_id", "rn")
    }),

    "q_dedup_exact_groups" -> ((s, dir) =>
      Tables.t(s, dir, "documents")
        .groupBy(sha2(col("text"), 256).as("h"))
        .agg(count(lit(1)).as("cnt"), min("doc_id").as("keeper"))
        .filter(col("cnt") > 1)
        .orderBy("h")),

    "q_dedup_keep_first" -> ((s, dir) => {
      val w = Window.partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))
      Tables.t(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang")
    }),

    "q_dedup_distinct_rows" -> ((s, dir) =>
      Tables.t(s, dir, "documents")
        .select("lang", "source")
        .distinct()
        .agg(count(lit(1)).as("cnt"))),

    // EXACT duplicate-substring detection (operators.SubstrDedup — the
    // Lee et al. 2022 suffix-range operator): every maximal token span
    // ≥ 5 tokens that occurs verbatim elsewhere, minus each span's
    // globally-first (keeper) occurrence. One gram-keyed aggregate +
    // co-partitioned join-back, then gaps-and-islands over the
    // duplicate positions — no pairs, no suffix array. (doc_id,
    // span_start) is a total order: spans are disjoint within a doc.
    "q_dedup_substring" -> ((s, dir) =>
      graft.operators.SubstrDedup
        .duplicateSpans(Tables.t(s, dir, "documents"), 5)
        .orderBy("doc_id", "span_start")),

    // the REMOVAL pass over the same spans (keep-first cut): each doc's
    // text with covered tokens dropped — canonical occurrences intact,
    // fully-duplicated docs become "", sub-minLen docs pass through.
    // Reconstruction is order-deterministic (sorted (pos, tok) fold),
    // so the rewritten strings hash-match DuckDB's string_agg twin.
    "q_dedup_substr_cut" -> ((s, dir) =>
      graft.operators.SubstrDedup
        .removeSpans(Tables.t(s, dir, "documents"), 5)
        .orderBy("doc_id")),

    // the 100 TB exchange-width path (VERDICT r11 item 5): the SAME
    // span derivation with hashPrefilter=true — round 1 shuffles only
    // (xxhash64(gram), doc·2^20+pos) longs, round 2 re-keys the ~1% of
    // positions in repeated-hash groups by gram TEXT to both kill
    // collisions and crown the true keeper. Provably result-identical
    // (SubstrDedupSpec), so it shares q_dedup_substring's DuckDB oracle
    // verbatim — the exactness claim is hash-graded in the harness, and
    // the bench row prices the two-round trade against the direct form.
    "s_dedup_substr_hash" -> ((s, dir) =>
      graft.operators.SubstrDedup
        .duplicateSpans(Tables.t(s, dir, "documents"), 5, hashPrefilter = true)
        .orderBy("doc_id", "span_start")),

    // vocabulary-distribution profile per language: hapax legomena count
    // and the Zipf head share — two stacked aggregates over the exploded
    // token table, no joins
    // ---- PII detection + redaction (the compliance pass every corpus
    // runs before training) ----
    // deterministic PII is synthesized into the text IN BOTH ENGINES
    // (the parquet fixture has none), then detected and redacted with
    // backslash-free regexes that parse identically in Java regex and
    // RE2: emails → <EMAIL>, IPv4 → <IP>, phone-shaped digits →
    // <PHONE>. Map-only per doc (scan → project); the md5 of the
    // redacted text makes the oracle verify the REPLACEMENT byte-for-
    // byte, not just the counts. Redaction order: email (may contain
    // dots+digits) → IP → phone.
    "q_text_pii" -> ((s, dir) => {
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
      val ipRe = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
      val phoneRe = "[0-9]{3}[-][0-9]{4}"
      val aug = concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(""),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(""),
        when(col("doc_id") % 13 === 0,
          concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
            lit("."), ((col("doc_id") * 7) % 256).cast("string"),
            lit(".1"))).otherwise(""))
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), aug.as("aug"))
        .select(col("doc_id"),
          size(expr(s"regexp_extract_all(aug, '$emailRe', 0)")).cast("long").as("n_emails"),
          size(expr(s"regexp_extract_all(aug, '$ipRe', 0)")).cast("long").as("n_ips"),
          size(expr(s"regexp_extract_all(aug, '$phoneRe', 0)")).cast("long").as("n_phones"),
          md5(regexp_replace(regexp_replace(regexp_replace(col("aug"),
            lit(emailRe), lit("<EMAIL>")),
            lit(ipRe), lit("<IP>")),
            lit(phoneRe), lit("<PHONE>"))).as("redacted_md5"))
        .filter(col("n_emails") + col("n_ips") + col("n_phones") > 0)
        .orderBy("doc_id")
    }),

    // keyed PSEUDONYMIZATION with referential integrity: user ids on
    // both tables are replaced by sha2(salt || id) BEFORE the join, and
    // the joined segment × event-type audience counts still come out —
    // the GDPR-pipeline pattern where raw ids never leave the scan (the
    // downstream sees only pseudonyms, yet joins keep working because
    // the keyed hash is applied consistently). Deterministic: SHA-256
    // of identical strings in both engines; hash-grade oracle proves
    // the pseudonymized join ≡ the raw join's aggregate.
    "q_pii_pseudonymize" -> ((s, dir) => {
      val salt = "graft-salt-v1:"
      def pseudo(c: org.apache.spark.sql.Column) =
        sha2(concat(lit(salt), c.cast("string")), 256)
      val ev = Tables.events(s, dir)
        .select(pseudo(col("user_id")).as("uid"), col("event_type"))
      val cust = Tables.t(s, dir, "customer")
        .select(pseudo(col("c_custkey")).as("uid"), col("c_mktsegment"))
      ev.join(cust, "uid")
        .groupBy("c_mktsegment", "event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("uid")).as("n_users"))
        .orderBy("c_mktsegment", "event_type")
    }),

    "q_text_hapax" -> ((s, dir) =>
      Tables.t(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("token"))
        .groupBy("lang", "token")
        .agg(count(lit(1)).as("c"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_distinct"),
          count(when(col("c") === 1, 1)).as("n_hapax"),
          round(max("c").cast("double") / sum("c"), 6).as("top1_share"))
        .orderBy("lang")),

    // fixed-size overlapping token chunking (size 16, stride 12) — the
    // pretraining/RAG context-window splitter: one generator row per
    // chunk start, the slice+join happens inside the projection, no
    // shuffle until the presentation sort. At 100 TB this is map-only
    // per document — chunking never crosses document boundaries.
    "q_text_chunk" -> ((s, dir) =>
      Tables.t(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0), size(col("toks")) - 1, lit(12))).as("s"))
        .select(col("doc_id"),
          (col("s") / 12).cast("long").as("chunk_id"),
          least(lit(16), size(col("toks")) - col("s")).cast("long").as("chunk_len"),
          concat_ws(" ", slice(col("toks"), col("s") + 1, lit(16))).as("chunk_text"))
        .orderBy("doc_id", "chunk_id"))
  )

  /** Shared CTE prefix of the two substring-dedup oracles — ONE copy of
    * the window/first-occurrence/island derivation so the detection and
    * removal twins can never drift (the Bm25ScoreSql doctrine). 5-token
    * grams (toks[i:i+4] is 5 elements — DuckDB slices inclusively),
    * first occurrence = min of the same doc_id·2^20+pos encoding Spark
    * aggregates, islands break when pos > prev + 5.
    */
  private val SubstrCtes: String =
    """tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |w AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
      |             array_to_string(toks[i:i+4], ' ') AS gram
      |      FROM tok, unnest(range(1, len(toks) - 3)) AS t(i)),
      |g AS (SELECT gram, MIN(doc_id * 1048576 + pos) AS first_enc
      |      FROM w GROUP BY 1 HAVING COUNT(*) > 1),
      |dup AS (SELECT w.doc_id, w.pos FROM w JOIN g USING (gram)
      |        WHERE w.doc_id * 1048576 + w.pos <> g.first_enc),
      |m AS (SELECT doc_id, pos,
      |        CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
      |               OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 5
      |             THEN 1 ELSE 0 END AS brk
      |      FROM dup),
      |isl AS (SELECT doc_id, pos,
      |               SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |        FROM m)""".stripMargin

  val oracle: Map[String, String] = Map(
    // exact duplicate-substring detection: DuckDB re-derives the maximal
    // duplicated spans from scratch (same gram windows, same keep-first
    // encoding, same island merge) — integer outputs, hash-exact
    "q_dedup_substring" ->
      s"""WITH $SubstrCtes
         |SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |       CAST(MIN(pos) AS BIGINT) AS span_start,
         |       CAST(MAX(pos) + 4 AS BIGINT) AS span_end,
         |       CAST(MAX(pos) + 4 - MIN(pos) + 1 AS BIGINT) AS n_tokens
         |FROM isl GROUP BY doc_id, grp
         |ORDER BY doc_id, span_start""".stripMargin,

    // hashPrefilter is exactness-preserving, so its oracle IS the
    // direct form's — a hash mismatch here would falsify the 100 TB
    // path's central claim
    "s_dedup_substr_hash" ->
      s"""WITH $SubstrCtes
         |SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |       CAST(MIN(pos) AS BIGINT) AS span_start,
         |       CAST(MAX(pos) + 4 AS BIGINT) AS span_end,
         |       CAST(MAX(pos) + 4 - MIN(pos) + 1 AS BIGINT) AS n_tokens
         |FROM isl GROUP BY doc_id, grp
         |ORDER BY doc_id, span_start""".stripMargin,

    // the removal pass: rebuild each doc from the tokens NO island
    // covers (string_agg ORDER BY pos ≡ Spark's sorted (pos, tok)
    // fold); every doc present, fully-covered docs as ''
    "q_dedup_substr_cut" ->
      s"""WITH $SubstrCtes,
         |sp AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 4 AS e
         |       FROM isl GROUP BY doc_id, grp),
         |alltok AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS tk
         |           FROM tok, unnest(range(1, len(toks) + 1)) AS t(i)),
         |kept AS (SELECT a.doc_id, string_agg(a.tk, ' ' ORDER BY a.pos) AS text
         |         FROM alltok a
         |         WHERE NOT EXISTS (SELECT 1 FROM sp
         |                           WHERE sp.doc_id = a.doc_id
         |                             AND a.pos BETWEEN sp.s AND sp.e)
         |         GROUP BY a.doc_id)
         |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
         |       COALESCE(k.text, '') AS text
         |FROM documents d LEFT JOIN kept k USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q_text_phrase" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |           WHERE len(string_split(text, ' ')) >= 3),
        |sp AS (SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS span
        |       FROM d, unnest(range(1, len(toks) - 1)) AS t(i)),
        |top AS (SELECT span FROM (SELECT span, COUNT(*) AS c FROM sp GROUP BY 1)
        |        ORDER BY c DESC, span LIMIT 1)
        |SELECT sp.doc_id, (SELECT span FROM top) AS phrase,
        |  CAST(COUNT(*) AS BIGINT) AS n_occ
        |FROM sp WHERE sp.span = (SELECT span FROM top)
        |GROUP BY sp.doc_id ORDER BY sp.doc_id""".stripMargin,

    // ONE shared oracle constant (InvertedIndex.Bm25OracleSql, also
    // the s_text_index_bm25 oracle) interpolating the same score text
    // Spark executes, with the per-doc sum as a term-sorted left fold
    // in BOTH engines — bit-equal totals, so the ROUND(·, 6) is safe
    "q_text_bm25" -> graft.operators.InvertedIndex.Bm25OracleSql,

    "q_pii_pseudonymize" ->
      """WITH ev AS (SELECT sha256('graft-salt-v1:' || CAST(user_id AS VARCHAR)) AS uid,
        |              event_type FROM events),
        |cust AS (SELECT sha256('graft-salt-v1:' || CAST(c_custkey AS VARCHAR)) AS uid,
        |           c_mktsegment FROM customer)
        |SELECT c_mktsegment, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT uid) AS BIGINT) AS n_users
        |FROM ev JOIN cust USING (uid)
        |GROUP BY c_mktsegment, event_type
        |ORDER BY c_mktsegment, event_type""".stripMargin,

    "q_text_pii" ->
      """WITH aug AS (SELECT doc_id, text
        |  || CASE WHEN doc_id % 7 = 0
        |     THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |     ELSE '' END
        |  || CASE WHEN doc_id % 11 = 0
        |     THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |     ELSE '' END
        |  || CASE WHEN doc_id % 13 = 0
        |     THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.'
        |          || CAST((doc_id * 7) % 256 AS VARCHAR) || '.1'
        |     ELSE '' END AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(aug, '[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(aug, '[0-9]{3}[-][0-9]{4}')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}', '<IP>', 'g'),
        |    '[0-9]{3}[-][0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
        |FROM aug
        |WHERE len(regexp_extract_all(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}'))
        |    + len(regexp_extract_all(aug, '[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}'))
        |    + len(regexp_extract_all(aug, '[0-9]{3}[-][0-9]{4}')) > 0
        |ORDER BY doc_id""".stripMargin,

    "q_text_chunk" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE doc_id < 100)
        |SELECT t.doc_id, CAST(u.s / 12 AS BIGINT) AS chunk_id,
        |  CAST(least(16, len(t.toks) - u.s) AS BIGINT) AS chunk_len,
        |  array_to_string(list_slice(t.toks, u.s + 1, u.s + 16), ' ') AS chunk_text
        |FROM t, unnest(range(0, CAST(len(t.toks) AS BIGINT), 12)) AS u(s)
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "q_text_hapax" ->
      """WITH tc AS (
        |  SELECT lang, token, COUNT(*) AS c
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS token
        |        FROM documents) t
        |  GROUP BY lang, token)
        |SELECT lang, COUNT(*) AS n_distinct,
        |  COUNT(*) FILTER (WHERE c = 1) AS n_hapax,
        |  ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS top1_share
        |FROM tc GROUP BY lang ORDER BY lang""".stripMargin,

    "q_text_tokens_top20" ->
      """SELECT token, COUNT(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin,

    "q_text_doc_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_text_bigrams" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |pairs AS (SELECT toks[i] || ' ' || toks[i + 1] AS bigram
        |          FROM d, unnest(range(1, len(toks))) AS t(i))
        |SELECT bigram, COUNT(*) AS cnt FROM pairs
        |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin,

    // hash-grade twin of TextRank keywords (r12 promotion): the SAME
    // co-occurrence edge derivation (adjacent-token pairs, distinct,
    // both directions, vocab ids by row_number over term) feeding the
    // shared fixed-point recurrence (PageRank.exactOracleCtes — integer
    // 1e-12 mass units, so every keyword rank matches bit for bit).
    // Dedups are DISTINCT-over-UNION-ALL per the WITH RECURSIVE hazard
    // documented on the helper.
    "s_text_keywords" ->
      (graft.operators.PageRank.exactOracleCtes(
        """tok AS (SELECT string_split(text, ' ') AS l FROM documents),
          |pairs AS (SELECT DISTINCT l[i] AS t1, l[i + 1] AS t2
          |          FROM tok, unnest(range(1, len(l))) AS r(i)
          |          WHERE l[i] <> l[i + 1]),
          |vocab AS (SELECT term,
          |                 CAST(row_number() OVER (ORDER BY term) AS BIGINT) AS id
          |          FROM (SELECT DISTINCT term FROM
          |                 (SELECT t1 AS term FROM pairs
          |                  UNION ALL SELECT t2 FROM pairs))),
          |named AS (SELECT v1.id AS src, v2.id AS dst
          |          FROM pairs p
          |          JOIN vocab v1 ON v1.term = p.t1
          |          JOIN vocab v2 ON v2.term = p.t2),
          |edges AS (SELECT DISTINCT src, dst FROM
          |            (SELECT src, dst FROM named
          |             UNION ALL SELECT dst AS src, src AS dst FROM named))""".stripMargin,
        iters = 6) + """
        |SELECT v.term AS term, CAST((u.s).r AS BIGINT) AS rank_u
        |FROM pr, unnest(pr.st) AS u(s), vocab v
        |WHERE iter = 6 AND v.id = (u.s).id
        |ORDER BY rank_u DESC, term LIMIT 20""".stripMargin),

    "q_text_tfidf_top" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |scored AS (SELECT tf.doc_id, tf.token,
        |             ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
        |           FROM tf JOIN df USING (token) CROSS JOIN n
        |           WHERE tf.doc_id < 20),
        |ranked AS (SELECT doc_id, token, tfidf,
        |             CAST(row_number() OVER (PARTITION BY doc_id
        |                                     ORDER BY tfidf DESC, token) AS BIGINT) AS rn
        |           FROM scored)
        |SELECT doc_id, token, tfidf, rn FROM ranked WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin,

    "q_dedup_exact_groups" ->
      """SELECT sha256(text) AS h, COUNT(*) AS cnt, MIN(doc_id) AS keeper
        |FROM documents GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY h""".stripMargin,

    "q_dedup_keep_first" ->
      """WITH ranked AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_docs FROM ranked WHERE rn = 1
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_dedup_distinct_rows" ->
      """SELECT COUNT(*) AS cnt FROM (SELECT DISTINCT lang, source FROM documents) t""".stripMargin
  )
}
