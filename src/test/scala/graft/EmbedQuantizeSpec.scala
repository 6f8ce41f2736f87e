package graft

import graft.operators.EmbedQuantize
import org.apache.spark.sql.functions._

/** EmbedQuantize: codes in range, reconstruction inside the provable
  * half-step bound on real embeddings, exactness on degenerate dims,
  * and the query's summary invariants.
  */
class EmbedQuantizeSpec extends SparkSpec {

  test("codes are int8-range; reconstruction within (hi-lo)/255/2 per dim") {
    val vecs = Tables.t(spark, sfDir, "embeddings")
    val q = EmbedQuantize.quantize(vecs)
    val bad = q.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") > 255).count()
    assert(bad == 0, s"$bad codes outside 0..255")
    // join the per-dim bound and check every element's error against ITS
    // dimension's half-step (tight form of the operator contract)
    val err = q.select(posexplode(expr(
        "zip_with(embedding, decoded, (a, b) -> abs(cast(a as double) - b))"))
        .as(Seq("dim", "e")))
    val bounds = EmbedQuantize.stats(vecs)
      .select(col("dim"), ((col("hi") - col("lo")) / 255 / 2 + 1e-9).as("bound"))
    val over = err.join(broadcast(bounds), "dim")
      .filter(col("e") > col("bound")).count()
    assert(over == 0, s"$over elements beyond the half-step bound")
  }

  test("degenerate (constant) dimension decodes exactly; round-trip is idempotent") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 5.0f, -2.0f), 0),
      (2L, Array(1.0f, 7.0f, -2.0f), 0),
      (3L, Array(1.0f, 6.0f, -2.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val q = EmbedQuantize.quantize(vecs).orderBy("vec_id")
    val rows = q.select("decoded").collect().map(_.getSeq[Double](0))
    // dims 0 and 2 are constant → hi == lo → decode == lo exactly
    rows.foreach { r => assert(r(0) == 1.0 && r(2) == -2.0, r.mkString(",")) }
    // endpoints of the varying dim reconstruct exactly (codes 0 and 255)
    assert(rows(0)(1) == 5.0 && rows(1)(1) == 7.0)
    // re-quantizing the decoded vectors is a fixed point (same codes)
    val again = EmbedQuantize.quantize(
      q.select(col("vec_id"), col("decoded").as("embedding"), col("label")))
      .orderBy("vec_id").select("codes").collect().map(_.getSeq[Int](0))
    val first = q.select("codes").collect().map(_.getSeq[Int](0))
    assert(again.toSeq == first.toSeq, "round-trip must be idempotent")
  }

  test("s_embed_quantize summary: errors positive, within bound ratio 1") {
    val out = SparkEntry.queries("s_embed_quantize")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) >= r.getDouble(3), "max >= mean")
      assert(r.getDouble(4) <= 1.001, s"err_vs_bound ${r.getDouble(4)} > 1")
    }
  }
}
