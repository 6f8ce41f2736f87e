package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of an embedding column — the standard 4×
  * memory/IO compression step before an ANN index at 100 TB (per-dim
  * min/max affine codes, the simplest member of the family PQ extends;
  * e.g. Faiss's ScalarQuantizer). Compose: quantize → AnnIvf/AnnLsh over
  * the codes, exact re-rank on the float column for the candidates only.
  *
  * Shape: ONE corpus pass computes per-dimension (lo, hi) as a d-row
  * aggregate over the exploded (dim, value) pairs; the d-element scale
  * arrays come back as a broadcast 1-row crossJoin (never a driver-side
  * loop), and encode/decode are pure `transform` HOFs over the array
  * column — map-only, codegen'd, no shuffle after the stats pass.
  *
  * Error contract (proven in EmbedQuantizeSpec): round-to-nearest over
  * 255 levels keeps every reconstructed element within
  * (hi_d − lo_d)/255/2 of the original, so downstream cosine/L2 scores
  * degrade by a bounded, dimension-local amount.
  */
object EmbedQuantize {

  /** Per-dimension (dim, lo, hi) — the codebook, one row per dimension. */
  def stats(vecs: DataFrame, embCol: String = "embedding"): DataFrame =
    vecs.select(posexplode(col(embCol).cast("array<double>")).as(Seq("dim", "v")))
      .groupBy("dim")
      .agg(min("v").as("lo"), max("v").as("hi"))

  /** The 1-row broadcastable codebook (`_lo`, `_w` d-element arrays) —
    * built once, shareable between [[quantize]] and any bound math.
    */
  def codebook(vecs: DataFrame, embCol: String = "embedding"): DataFrame =
    // sort_array keeps the struct's dim order = array index
    stats(vecs, embCol)
      .agg(sort_array(collect_list(struct(col("dim"), col("lo"), col("hi")))).as("s"))
      .select(expr("transform(s, x -> x.lo)").as("_lo"),
        // degenerate dims (hi == lo) quantize to code 0 and decode to lo
        // exactly — guard the divide, not the data
        expr("transform(s, x -> greatest(x.hi - x.lo, cast(1e-300 as double)))").as("_w"))

  /** Input rows plus `codes` (ARRAY<INT> in 0..255) and `decoded`
    * (ARRAY<DOUBLE>) — encode and reconstruction in one declarative
    * projection against the broadcast codebook (built here if the
    * caller doesn't pass one).
    */
  def quantize(vecs: DataFrame, embCol: String = "embedding",
               cb0: Option[DataFrame] = None): DataFrame = {
    val cb = cb0.getOrElse(codebook(vecs, embCol))
    val enc: Column = expr(
      s"transform($embCol, (v, i) -> " +
        "cast(round((cast(v as double) - _lo[i]) / _w[i] * 255) as int))")
    val dec: Column = expr(
      "transform(codes, (q, i) -> _lo[i] + cast(q as double) / 255 * _w[i])")
    vecs.crossJoin(broadcast(cb))
      .withColumn("codes", enc)
      .withColumn("decoded", dec)
      .drop("_lo", "_w")
  }

  /** Summary the bench/verify harness can rows-check: per label, vector
    * count and the max / mean absolute reconstruction error vs the worst
    * per-dim half-step bound (err_vs_bound ≤ 1 + fp-slop everywhere).
    */
  def summary(vecs: DataFrame, embCol: String = "embedding"): DataFrame = {
    // ONE stats pass: the codebook feeds both the quantizer and the
    // worst-dim half-step bound (it already holds every hi − lo as _w)
    val cb = codebook(vecs, embCol)
    val q = quantize(vecs, embCol, Some(cb))
    val absErr = expr(
      s"zip_with($embCol, decoded, (a, b) -> abs(cast(a as double) - b))")
    val halfStep = cb.select(
      (expr("array_max(_w)") / 255 / 2).as("bound"))
    q.select(col("label"), absErr.as("e"))
      .select(col("label"),
        expr("aggregate(e, cast(0 as double), (m, x) -> greatest(m, x))").as("vec_max"),
        expr("aggregate(e, cast(0 as double), (m, x) -> m + x) / size(e)").as("vec_mean"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        max("vec_max").as("max_err"), avg("vec_mean").as("mean_err"))
      .crossJoin(broadcast(halfStep))
      .select(col("label"), col("n_vecs"),
        round(col("max_err"), 6).as("max_err"),
        round(col("mean_err"), 6).as("mean_err"),
        round(col("max_err") / col("bound"), 3).as("err_vs_bound"))
      .orderBy("label")
  }
}
