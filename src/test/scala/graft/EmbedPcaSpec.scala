package graft

import graft.operators.EmbedPca
import org.apache.spark.sql.functions._

/** s_embed_pca — PCA embedding compression: output shape, projection
  * norms never exceed the originals (orthogonal projection contracts),
  * and the top-k components retain at least their proportional share of
  * variance.
  */
class EmbedPcaSpec extends SparkSpec {

  private lazy val vecs = Tables.t(spark, sfDir, "embeddings")

  test("projection emits k scalar rows per vector, ordered") {
    val out = EmbedPca.project(vecs, k = 8)
    val n = vecs.count()
    assert(out.count() == n * 8)
    assert(out.groupBy("vec_id").count().filter(col("count") =!= 8).count() == 0)
  }

  test("orthogonal projection contracts norms") {
    val proj = EmbedPca.project(vecs, k = 8)
      .groupBy("vec_id").agg(sum(col("pca_val") * col("pca_val")).as("p2"))
    val orig = vecs.select(col("vec_id"),
      expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))").as("o2"))
    // rounding the projection to 6 decimals can only move p2 by ~1e-5
    val bad = proj.join(orig, "vec_id")
      .filter(col("p2") > col("o2") + 1e-4).count()
    assert(bad == 0, s"$bad vectors grew under projection")
  }

  test("top-8 of 64 uniform dimensions keep at least ~their share of variance") {
    val ev = EmbedPca.explainedVariance(vecs, k = 8)
    // random near-isotropic vectors: expected share = 8/64 = 0.125; the
    // top components are the LARGEST eigenvalues so they always do at
    // least as well — assert a floor safely below it
    assert(ev >= 0.10, s"explained variance $ev below floor")
    assert(ev <= 1.0 + 1e-9)
  }
}
