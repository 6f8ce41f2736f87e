package graft

import graft.operators.{DedupStore, InvertedIndex}
import graft.streaming.IngestPipeline
import org.apache.spark.sql.functions._

/** The ingest topology (stream → DedupStore → InvertedIndex):
  * duplicates never reach the index, the catch-up derivation heals the
  * cross-store crash window, and maintenance versions never re-index.
  * (Erasure across the composed stores is EraseSink's job — covered in
  * ErasureSpec with dedupDir + indexDir both maintained.)
  */
class IngestPipelineSpec extends SparkSpec {

  import spark.implicits._

  private def mkDocs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  private def indexedDocIds(dir: String): Set[Long] =
    InvertedIndex.docLengths(spark, dir)
      .select("doc_id").as[Long].collect().toSet

  test("stream → dedup → index: duplicates never reach the index; search ≡ fresh build over accepted docs") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.nio.file.Files.createTempDirectory("graft_ipipe")
    val dedupDir = s"$base/dedup"; val idxDir = s"$base/idx"
    try {
      val in = MemoryStream[(Long, String)]
      val q = IngestPipeline.start(in.toDF().toDF("doc_id", "text"),
        dedupDir, idxDir, s"$base/ckpt", buckets = 8)
      try {
        in.addData((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
          (3L, "delta epsilon zeta"))
        q.processAllAvailable()
        in.addData((11L, "alpha beta gamma"), (12L, "eta theta iota"))
        q.processAllAvailable()
      } finally q.stop()
      assert(indexedDocIds(idxDir) == Set(1L, 3L, 12L),
        "the index must hold exactly the accepted docs")
      // ranked retrieval over the pipeline's segmented index must equal
      // a fresh single-shot index of the accepted corpus
      val freshDir = s"$base/fresh"
      InvertedIndex.write(InvertedIndex.build(
        DedupStore.readDocs(spark, dedupDir).select("doc_id", "text")), freshDir)
      val terms = Seq("alpha", "epsilon", "iota")
      def search(d: String) = InvertedIndex.searchBm25(spark, d, terms)
        .orderBy("doc_id").collect().toSeq
      assert(search(idxDir) == search(freshDir),
        "pipeline index diverged from the fresh build over accepted docs")
    } finally Fs.rmTree(base.toString)
  }

  test("catch-up heals the crash window between dedup commit and index append") {
    val base = java.nio.file.Files.createTempDirectory("graft_ipipe_cw")
    val dedupDir = s"$base/dedup"; val idxDir = s"$base/idx"
    try {
      // trigger 1 completed both halves
      DedupStore.appendBatch(spark, mkDocs((1L, "alpha beta")), dedupDir, buckets = 4)
      assert(IngestPipeline.indexCatchUp(spark, dedupDir, idxDir) == 1L)
      // trigger 2 "crashed" after the dedup commit, before the index
      // append — the replayed trigger's appendBatch is a no-op...
      DedupStore.appendBatch(spark, mkDocs((2L, "gamma delta")), dedupDir)
      assert(DedupStore.appendBatch(spark, mkDocs((2L, "gamma delta")), dedupDir) == 0L)
      // ...and catch-up still indexes the committed-but-unindexed version
      assert(IngestPipeline.indexCatchUp(spark, dedupDir, idxDir) == 1L)
      assert(indexedDocIds(idxDir) == Set(1L, 2L))
      // a second catch-up is a clean no-op
      assert(IngestPipeline.indexCatchUp(spark, dedupDir, idxDir) == 0L)
    } finally Fs.rmTree(base.toString)
  }

  test("maintenance versions never re-index: delete and compactSeen add no segments") {
    val base = java.nio.file.Files.createTempDirectory("graft_ipipe_mv")
    val dedupDir = s"$base/dedup"; val idxDir = s"$base/idx"
    try {
      DedupStore.appendBatch(spark,
        mkDocs((1L, "alpha beta"), (2L, "gamma delta")), dedupDir, buckets = 4)
      assert(IngestPipeline.indexCatchUp(spark, dedupDir, idxDir) == 1L)
      val segs = InvertedIndex.segments(spark, idxDir)
      // delete rewrites survivor doc files under a NEW version prefix —
      // the ingest tag (absent) is what keeps them out of the index
      DedupStore.delete(spark, dedupDir, Seq(1L))
      DedupStore.compactSeen(spark, dedupDir)
      assert(IngestPipeline.indexCatchUp(spark, dedupDir, idxDir) == 0L)
      assert(InvertedIndex.segments(spark, idxDir) == segs,
        "maintenance rewrites must not become index segments")
    } finally Fs.rmTree(base.toString)
  }
}
