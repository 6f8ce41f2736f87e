package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT duplicate-substring detection and removal — the suffix-range
  * operator (Lee et al. 2022, "Deduplicating Training Data Makes
  * Language Models Better") a serious pretraining pipeline runs
  * alongside MinHash: find every maximal token span of length ≥ minLen
  * that occurs verbatim elsewhere in the corpus (another document OR
  * earlier in the same one) and cut it, keeping exactly one canonical
  * occurrence — the globally FIRST by (doc_id, pos), matching
  * q_dedup_keep_first's keeper semantics.
  *
  * Formulation: a duplicated span of length m ≥ minLen is exactly a run
  * of m − minLen + 1 consecutive duplicated minLen-grams, so maximal
  * spans fall out of three relational steps, no suffix array needed:
  *
  *   1. emit every minLen-token window (doc_id, pos, gram) — the
  *      "bounded suffix" table, one narrow row per corpus position;
  *   2. ONE aggregate keyed by the gram text gives each gram's
  *      occurrence count and its first occurrence (min of the
  *      doc_id·2^20+pos encoding — a primitive long, so the aggregate
  *      stays HashAggregate; min(struct(..)) would fall back to
  *      SortAggregate, the r6 lesson). Joining back on the same key is
  *      co-partitioned with the aggregate's shuffle. An occurrence is
  *      DUPLICATE iff its gram occurs >1 times and it is not the first.
  *   3. merge overlapping/adjacent windows per doc (classic
  *      gaps-and-islands over the duplicate positions: break when
  *      pos > prev + minLen) into maximal spans.
  *
  * Scale shape: the shuffle is the gram-keyed aggregate over window
  * rows — corpus-token-sized × minLen characters, narrow, with map-side
  * partial aggregation; a viral gram ("in the middle of the") costs a
  * count and a min, never a pairwise join, so there is NO fan-out valve
  * to tune (contrast NgramJaccard's df cutoff — this operator never
  * materializes pairs). The island merge runs over the DUPLICATE
  * positions only (corpus-duplication-sized, partitioned by doc). At
  * 100 TB the gram bytes dominate the exchange; `hashPrefilter = true`
  * trims it — a first-pass group on xxhash64(gram) (8-byte keys) keeps
  * the gram TEXT out of the wide exchange for every window whose hash
  * is unique, and the exact gram-keyed pass then runs over the
  * duplicated slice alone. Exactness is preserved by construction (see
  * [[duplicatePositions]]); the default stays direct because at
  * test-fixture scale the second pass costs more than it saves.
  *
  * Detection ([[duplicateSpans]]) and removal ([[removeSpans]]) are
  * both deterministic integer/string logic end-to-end — DuckDB twins
  * reproduce them hash-exact (q_dedup_substring / q_dedup_substr_cut).
  */
object SubstrDedup {

  /** Positions are encoded doc_id·MaxDocTokens + pos so "first
    * occurrence" is one primitive-long min; docs must stay under 2^20
    * tokens (assert_true fails the job loudly if one doesn't — at that
    * length you chunk first: q_text_chunk).
    */
  val MaxDocTokens: Long = 1L << 20

  /** Compute-stage width (r17, the NgramJaccard doctrine): the window
    * transform is an interpreted HOF lambda and the gram aggregate
    * shuffles minLen-token strings — at test scale both ran as single
    * tasks (one-file scan, AQE size-coalesce). Scale-adaptive:
    * max(cores, inputBytes/64MB).
    */
  private def widthOf(docs: DataFrame): Int = {
    val bytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    math.max(docs.sparkSession.sparkContext.defaultParallelism.toLong,
      (bytes / (64L * 1024L * 1024L)).toLong).min(Int.MaxValue.toLong).toInt
  }

  private def windows(docs: DataFrame, minLen: Int,
                      idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        split(col(textCol), " ").as("toks"))
      .repartition(widthOf(docs))
      // as a FILTER (always-true: assert_true yields NULL or throws) so
      // column pruning cannot optimize the guard away. Both encoding
      // factors are guarded: pos < 2^20 AND 0 <= doc_id < MaxValue/2^20
      // — a doc_id ≥ 2^43 would silently wrap doc_id·2^20+pos under
      // non-ANSI Spark and could crown a wrong first occurrence (the
      // DuckDB twin would error instead — ADVICE r11), so it must fail
      // as loudly as the token bound
      .filter(expr(s"assert_true(size(toks) < $MaxDocTokens " +
        s"AND doc_id >= 0 AND doc_id < ${Long.MaxValue / MaxDocTokens}, " +
        s"'SubstrDedup: document exceeds $MaxDocTokens tokens or doc_id " +
        s"outside [0, ${Long.MaxValue / MaxDocTokens})') IS NULL"))
      .filter(size(col("toks")) >= minLen) // sequence() must not run backwards
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(toks) - $minLen), " +
          s"i -> named_struct('pos', cast(i as long), " +
          s"'gram', concat_ws(' ', slice(toks, i + 1, $minLen))))")).as("w"))
      .select(col("doc_id"), col("w.pos").as("pos"), col("w.gram").as("gram"))

  /** Duplicate-marked window positions: every (doc_id, pos) whose gram
    * occurs elsewhere, EXCEPT the gram's globally-first occurrence.
    *
    * `hashPrefilter` is the 100 TB exchange-width valve, EXACTNESS
    * PRESERVED: pass 1 aggregates on xxhash64(gram) — an 8-byte key
    * instead of the minLen-token text — and only windows whose HASH
    * repeats (duplicated grams plus the rare colliding strangers) carry
    * their text into the exact gram-keyed pass 2. A duplicated gram's
    * hash necessarily repeats, so no duplicate escapes the prefilter;
    * a collision-survivor whose exact group has one member is simply
    * not marked in pass 2 — so the result is identical to the direct
    * form (SubstrDedupSpec pins ≡ on the hand corpus and real
    * documents). Worth it when the corpus dwarfs its duplication: the
    * wide text shuffle shrinks from every window to the duplicated
    * ones.
    */
  private def duplicatePositions(docs: DataFrame, minLen: Int,
                                 idCol: String, textCol: String,
                                 hashPrefilter: Boolean): DataFrame = {
    val width = widthOf(docs)
    val w0 = windows(docs, minLen, idCol, textCol)
    val wPre = if (!hashPrefilter) w0 else {
      val wh = w0.withColumn("h", xxhash64(col("gram")))
        // one pinned h-exchange serves the hot aggregate AND the
        // semi-join probe side (ReusedExchange)
        .repartition(width, col("h"))
      val hot = wh.groupBy("h").agg(count(lit(1)).as("hc")).filter(col("hc") > 1)
      wh.join(hot.select("h"), Seq("h"), "left_semi").drop("h")
    }
    // one pinned gram-exchange below BOTH the first-occurrence aggregate
    // and the join-back probe side (the join was already co-partitioned
    // with the aggregate's shuffle; the pin only stops AQE folding the
    // KB-sized exchange to one task while the stage does real work)
    val w = wPre.repartition(width, col("gram"))
    val enc = col("doc_id") * MaxDocTokens + col("pos")
    val grams = w.groupBy("gram")
      .agg(count(lit(1)).as("c"), min(enc).as("first_enc"))
      .filter(col("c") > 1) // unique grams never join back — most of the table
    w.join(grams, "gram")
      .filter(enc =!= col("first_enc"))
      .select("doc_id", "pos")
  }

  /** Maximal duplicated spans per document:
    * (doc_id, span_start, span_end, n_tokens), token indices 0-based
    * inclusive, spans disjoint within a doc (overlapping and adjacent
    * duplicate windows merge). The canonical (first) occurrence of
    * every span is NOT reported — it is the keeper.
    */
  def duplicateSpans(docs: DataFrame, minLen: Int, idCol: String = "doc_id",
                     textCol: String = "text",
                     hashPrefilter: Boolean = false): DataFrame = {
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    duplicatePositions(docs, minLen, idCol, textCol, hashPrefilter)
      .withColumn("prev", lag("pos", 1).over(byPos))
      // all windows share length minLen, so islands break exactly when
      // the previous window [prev, prev+L) neither overlaps nor abuts
      // [pos, pos+L)
      .withColumn("brk",
        when(col("prev").isNull || col("pos") > col("prev") + minLen, 1L)
          .otherwise(0L))
      .withColumn("grp", sum("brk").over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "grp")
      .agg(min("pos").as("span_start"),
        (max("pos") + (minLen - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("n_tokens"))
  }

  /** Cut every duplicated span (keep-first): each surviving document's
    * text with the covered tokens removed — (doc_id, text), every input
    * doc present (fully-duplicated docs come back as the empty string;
    * docs shorter than minLen pass through verbatim).
    */
  def removeSpans(docs: DataFrame, minLen: Int, idCol: String = "doc_id",
                  textCol: String = "text",
                  hashPrefilter: Boolean = false): DataFrame = {
    val spans = duplicateSpans(docs, minLen, idCol, textCol, hashPrefilter)
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .withColumn("pos", col("pos").cast("long"))
    val kept = toks.join(spans,
        toks("doc_id") === spans("doc_id") &&
          col("pos").between(col("span_start"), col("span_end")),
        "left_anti")
      .groupBy("doc_id")
      // order-deterministic reconstruction: sort the (pos, tok) pairs,
      // not the shuffle arrival
      .agg(expr("concat_ws(' ', transform(array_sort(collect_list(" +
        "struct(pos, tok))), x -> x.tok))").as("text"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
  }
}
