package graft

import org.apache.spark.sql.functions._

/** TextRank keywords (s_text_keywords): the co-occurrence-PageRank
  * composition behaves — a hub term that every sentence passes through
  * outranks peripheral terms, and the rank column is (since the r12
  * fixed-point promotion) an integer 1e-12-unit mass distribution over
  * the vocabulary, conserved up to the recurrence's bounded truncation.
  */
class TextRankSpec extends SparkSpec {

  private val Scale = 1000000000000L

  private def keywords(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_trank").toString
    try {
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      graft.queries.TextQueries.queries("s_text_keywords")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1))
    } finally Fs.rmTree(dir)
  }

  test("hub term outranks every peripheral term") {
    // star-shaped corpus: 'core' co-occurs with six distinct satellites,
    // satellites only ever touch 'core'
    val docs = Seq[(Long, String)](
      (1L, "alpha core beta"), (2L, "gamma core delta"),
      (3L, "epsilon core zeta"))
    val kw = keywords(docs)
    assert(kw.head._1 == "core", s"expected 'core' first, got ${kw.toSeq.take(3)}")
    val coreRank = kw.head._2
    assert(kw.tail.forall(_._2 < coreRank), "a satellite matched the hub's rank")
  }

  test("ranks over the whole vocab form a (truncation-bounded) mass distribution") {
    import spark.implicits._
    val docs = Seq[(Long, String)](
      (1L, "a b c d"), (2L, "b c d e"), (3L, "e f a"))
    val dir = java.nio.file.Files.createTempDirectory("graft_trank2").toString
    try {
      docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // vocabulary here is 6 terms < the limit(20), so the query returns
      // ALL ranks and their sum must be the full PageRank mass. The
      // fixed-point recurrence only ever TRUNCATES (never rounds up), so
      // total ∈ (scale − loss, scale]: each round loses < 1 unit per
      // truncating division — ≤ (2·n + |E| + 1) per round, microscopic
      // against scale = 1e12.
      val total = graft.queries.TextQueries.queries("s_text_keywords")(spark, dir)
        .agg(sum("rank_u")).as[Long].head()
      assert(total <= Scale && total > Scale - 1000000L,
        s"rank mass $total strayed from scale $Scale")
    } finally Fs.rmTree(dir)
  }
}
