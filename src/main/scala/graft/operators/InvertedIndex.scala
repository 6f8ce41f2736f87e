package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Positional inverted index over a tokenized corpus — the full-text
  * half of a curation engine: term → (doc, positions) posting lists,
  * persisted bucketed-by-term so a query touches only its terms'
  * buckets, with phrase search expressed RELATIONALLY (offset-aligned
  * join + distinct-offset count), so it scales as a posting-list join,
  * never a corpus scan.
  *
  * Scale shape:
  *  - build: one explode + one (term, doc) aggregate — a single shuffle
  *    of the token stream, the same cost class as q_text_tfidf_top.
  *  - store: `partitionBy(bucket)` with bucket = xxhash64(term) mod B —
  *    a search for k phrase terms opens ≤ k of B directories
  *    (partition-pruned scan, proven in InvertedIndexSpec), each a
  *    sorted-by-term parquet a term predicate pushes into.
  *  - phrase query: postings of the phrase's terms join on doc_id with
  *    positions realigned to the phrase start (pos − offset); a base
  *    position where ALL k offsets land is an occurrence. Cost is the
  *    sum of the k posting lists, independent of corpus size.
  *
  * Phrase semantics match exact token-window equality (the q_dedup_span
  * span definition): overlapping occurrences count, and a term repeated
  * in the phrase must appear at every one of its offsets.
  */
object InvertedIndex {

  /** (term, doc_id, positions ARRAY<INT> sorted, tf) posting rows from a
    * whitespace-tokenized text column.
    */
  def build(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .groupBy("term", "doc_id")
      .agg(sort_array(collect_list("pos")).as("positions"),
        count(lit(1)).as("tf"))

  /** Persist posting rows as the index's BASE segment. Layout is
    * seg=<name>/bucket=<hash mod B>/: the seg layer is what makes
    * incremental and streaming appends atomic units (each append is one
    * new segment dir, published by one rename), the bucket layer is the
    * term-pruning unit. One term-sorted file per (segment, bucket).
    */
  def write(index: DataFrame, dir: String, buckets: Int = 32): Unit =
    writeSegment(index, new java.io.File(dir, "seg=base").toString, buckets)

  private def writeSegment(index: DataFrame, segDir: String, buckets: Int): Unit =
    index.withColumn("bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)))
      .repartition(col("bucket"))
      .sortWithinPartitions("term", "doc_id")
      .write.partitionBy("bucket").mode("overwrite").parquet(segDir)

  /** Incrementally index a batch of NEW documents as segment `seg`:
    * staged in a reader-invisible tmp dir, then published by ONE atomic
    * rename — readers see the whole segment or none of it, and the base
    * postings are never rewritten. Sound because posting rows are keyed
    * (term, doc_id) and phrase matching never merges across doc
    * boundaries, so disjoint doc_ids mean search-after-append ≡ full
    * rebuild (InvertedIndexSpec proves it). Re-appending an
    * already-indexed doc_id WOULD double its postings — dedup the batch
    * first (the BloomDedup / q_dedup_incremental path). Returns false
    * (a no-op) if the segment already exists — the idempotence hook
    * [[graft.streaming.IndexSink]] relies on for replayed triggers.
    */
  def append(docs: DataFrame, dir: String, seg: String,
             buckets: Int = 32): Boolean = {
    val segDir = new java.io.File(dir, s"seg=$seg")
    if (segDir.exists()) return false // committed already: replay no-op
    val tmp = new java.io.File(dir, s".tmp_seg_$seg") // dot: reader-invisible
    graft.Fs.rmTree(tmp.toString) // a torn earlier attempt restages cleanly
    writeSegment(build(docs), tmp.toString, buckets)
    java.nio.file.Files.move(tmp.toPath, segDir.toPath) // atomic publish
    true
  }

  /** Read ONLY the buckets that can hold `terms` — the directory-level
    * prune that makes an index lookup O(terms), not O(index).
    */
  def readForTerms(spark: SparkSession, dir: String, terms: Seq[String],
                   buckets: Int = 32): DataFrame = {
    val wanted = terms.map(t => bucketOf(t, buckets)).distinct
    spark.read.parquet(dir)
      .filter(col("bucket").isin(wanted: _*))
      .filter(col("term").isin(terms: _*))
  }

  /** The writer's bucket function, computed locally: xxhash64 of the
    * term string under Spark's default seed, mod `buckets`.
    */
  def bucketOf(term: String, buckets: Int): Long = {
    val bytes = term.getBytes("UTF-8")
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42L)
    ((h % buckets) + buckets) % buckets
  }

  /** Occurrences of `phrase` (ordered tokens) per doc from posting rows:
    * (doc_id, n_occ). Data-driven — `phrase` may itself be a computed
    * 1-column frame of (offset, term) rows; k is derived from it, so no
    * driver round-trip is needed.
    */
  def phraseOccurrences(postings: DataFrame, phrase: DataFrame): DataFrame = {
    val k = phrase.select(countDistinct("offset").as("k"))
    postings.join(phrase, Seq("term"))
      .select(col("doc_id"), col("offset"),
        explode(col("positions")).as("pos"))
      .select(col("doc_id"), col("offset"), (col("pos") - col("offset")).as("base"))
      .filter(col("base") >= 0)
      .groupBy("doc_id", "base")
      .agg(countDistinct("offset").as("n_off"))
      .crossJoin(broadcast(k))
      .filter(col("n_off") === col("k"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_occ"))
  }

  /** The corpus's most frequent n-token span (ties lexicographically
    * smallest) — a ONE-string driver collect off a span-type-bounded
    * aggregate. Shared by q_text_phrase and s_text_index_phrase so the
    * probe-phrase semantics (and their DuckDB oracle twins) can never
    * diverge, and so the span subtree is computed once, not once per
    * consumer branch.
    */
  def topSpan(docs: DataFrame, n: Int = 3, textCol: String = "text"): String =
    docs.select(split(col(textCol), " ").as("t"))
      .filter(size(col("t")) >= n)
      .select(explode(expr(
        s"transform(sequence(0, size(t) - $n)," +
          s" i -> concat_ws(' ', slice(t, i + 1, $n)))")).as("span"))
      .groupBy("span").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("span")).limit(1)
      .head().getString(0)

  /** Phrase frame from literal tokens: rows (offset, term). */
  def phraseFrame(spark: SparkSession, tokens: Seq[String]): DataFrame = {
    import spark.implicits._
    tokens.zipWithIndex.map { case (t, i) => (i, t) }.toDF("offset", "term")
  }

  /** End-to-end: search a PERSISTED index for a literal phrase, reading
    * only the phrase terms' buckets.
    */
  def searchPhrase(spark: SparkSession, dir: String, tokens: Seq[String],
                   buckets: Int = 32): DataFrame =
    phraseOccurrences(readForTerms(spark, dir, tokens, buckets),
      phraseFrame(spark, tokens))
}
