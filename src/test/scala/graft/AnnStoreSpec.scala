package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Index persistence: search over a reloaded index must equal the fresh
  * in-memory build bit-for-bit, appended vectors must be findable
  * without retraining, codebooks must round-trip, and the probed-cell
  * pruning must reach the lists scan as PARTITION filters.
  */
class AnnStoreSpec extends SparkSpec {

  private lazy val emb = Tables.t(spark, sfDir, "embeddings")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq

  test("search after save+reload equals the fresh in-memory build") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ann").toString
    try {
      AnnIndexStore.save(spark, emb, dir)
      val fresh = rows(AnnIvf.approxTopK(spark, emb))
      val stored = rows(AnnIndexStore.searchTopK(spark, dir,
        emb.filter(col("vec_id") < 10)))
      assert(stored == fresh, s"stored $stored\nfresh $fresh")
    } finally graft.Fs.rmTree(dir)
  }

  test("append assigns against persisted centroids; appended vectors are found") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_app").toString
    try {
      AnnIndexStore.save(spark, emb, dir)
      // exact copies of the probes under new ids: cosine 1.0 to their
      // originals, same cell by the same argmin — must surface at rank 1
      val copies = emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      AnnIndexStore.append(spark, copies, dir)
      val got = AnnIndexStore.searchTopK(spark, dir, emb.filter(col("vec_id") < 10))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      (0L until 10L).foreach { pid =>
        val top = got.filter(_._1 == pid).minBy(_._4)
        assert(top._2 == pid + 1000000L && top._3 == 1.0,
          s"probe $pid: expected its appended twin at rank 1, got $top")
      }
    } finally graft.Fs.rmTree(dir)
  }

  test("PQ codebooks round-trip bitwise") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_pq").toString
    try {
      AnnIndexStore.save(spark, emb, dir, m = 8)
      val want = AnnPq.trainCodebooks(
        AnnIvf.collectTrain(emb, 65536), m = 8, k = 16, seed = 42)
      val got = AnnIndexStore.loadCodebooks(spark, dir)
      assert(got.length == want.length)
      for (b <- want.indices; j <- want(b).indices)
        assert(java.util.Arrays.equals(got(b)(j), want(b)(j)),
          s"codebook ($b,$j) drifted through parquet")
    } finally graft.Fs.rmTree(dir)
  }

  test("probed cells prune the lists scan as partition filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_plan").toString
    try {
      AnnIndexStore.save(spark, emb, dir)
      val df = AnnIndexStore.searchTopK(spark, dir, emb.filter(col("vec_id") < 10))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[.*list_id".r.findFirstIn(p).isDefined,
        s"cell pruning must reach the scan as a partition filter:\n$p")
    } finally graft.Fs.rmTree(dir)
  }
}
