package graft

import graft.operators.SubstrDedup
import org.apache.spark.sql.functions._

/** Exact duplicate-substring detection/removal (operators.SubstrDedup):
  * hand-graph truth for maximal-span merging, self-repeats, keep-first
  * canonical survival, sub-minLen passthrough, and full-coverage
  * erasure — plus removal ≡ detection consistency on real documents.
  */
class SubstrDedupSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e f"),          // canonical: first occurrence of everything
      (2L, "z a b c d e q"),        // 5-token span copied from doc 1
      (3L, "m n o p m n o p"),      // self-repeat of "m n o p"
      (4L, "a b"),                  // shorter than minLen: untouched
      (5L, "a b c")                 // fully duplicated: erased to ""
    ).toDF("doc_id", "text")
  }

  private def spans(minLen: Int): Map[(Long, Long), (Long, Long)] =
    SubstrDedup.duplicateSpans(corpus, minLen).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap

  test("duplicateSpans: maximal merged spans, self-repeats, keeper unreported") {
    val s = spans(3)
    // doc 2: windows at pos 1,2,3 ("a b c","b c d","c d e") all dup of
    // doc 1 → ONE merged span tokens 1..5 (5 tokens: "a b c d e")
    // doc 3: "m n o" (pos 4) + "n o p" (pos 5) dup of pos 0/1 → span 4..7
    // doc 5: whole doc "a b c" dup of doc 1 pos 0 → span 0..2
    assert(s == Map(
      (2L, 1L) -> (5L, 5L),
      (3L, 4L) -> (7L, 4L),
      (5L, 0L) -> (2L, 3L)))
    // doc 1 (the canonical occurrence) and doc 4 (< minLen) report nothing
    assert(!s.keySet.exists(k => k._1 == 1L || k._1 == 4L))
  }

  test("removeSpans: keep-first cut — canonical intact, copies cut, short docs verbatim, full dup → empty") {
    val out = SubstrDedup.removeSpans(corpus, 3).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "a b c d e f",
      2L -> "z q",
      3L -> "m n o p",
      4L -> "a b",
      5L -> ""))
  }

  test("hashPrefilter: the 100TB exchange-width path is result-identical to the direct form") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // hand corpus (includes self-repeats and full-coverage docs)
    assert(rows(SubstrDedup.duplicateSpans(corpus, 3, hashPrefilter = true)) ==
      rows(SubstrDedup.duplicateSpans(corpus, 3)))
    assert(rows(SubstrDedup.removeSpans(corpus, 3, hashPrefilter = true)) ==
      rows(SubstrDedup.removeSpans(corpus, 3)))
    // real documents
    val docs = Tables.t(spark, sfDir, "documents")
    assert(rows(SubstrDedup.duplicateSpans(docs, 5, hashPrefilter = true)) ==
      rows(SubstrDedup.duplicateSpans(docs, 5)))
  }

  test("real documents: every reported span is genuinely duplicated and removal is exactly the reported coverage") {
    val docs = Tables.t(spark, sfDir, "documents")
    val minLen = 5
    val sp = SubstrDedup.duplicateSpans(docs, minLen)
    assert(sp.count() > 0, "fixture should contain duplicated 5-grams")
    // spans disjoint and well-formed per doc
    val bad = sp.selectExpr("doc_id", "span_start", "span_end",
        "lag(span_end) over (partition by doc_id order by span_start) as prev_end")
      .filter(col("span_end") < col("span_start") ||
        (col("prev_end").isNotNull && col("span_start") <= col("prev_end")))
    assert(bad.isEmpty, "spans must be well-formed and disjoint")
    // token-count conservation: removed tokens == covered positions
    val origTokens = docs.select(size(split(col("text"), " ")).as("n"))
      .agg(sum("n")).head().getLong(0)
    val keptTokens = SubstrDedup.removeSpans(docs, minLen)
      .select(when(col("text") === "", 0)
        .otherwise(size(split(col("text"), " "))).as("n"))
      .agg(sum("n")).head().getLong(0)
    val covered = sp.agg(sum("n_tokens")).head().getLong(0)
    assert(origTokens - keptTokens == covered,
      s"cut $origTokens-$keptTokens tokens but reported $covered covered")
  }
}
