package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-modal alignment by closed-form ridge regression between
  * modality feature spaces: given paired rows (x ∈ ℝᵖ from modality A,
  * y ∈ ℝᵠ from modality B), learn the affine map W minimizing
  * ‖XW − Y‖² + λ‖W‖², then project A-features into B's embedding space
  * for cross-modal retrieval (image-features → text-embedding lookup
  * and the like). This is the honest linear core of the CLIP-style
  * alignment the offline environment cannot train end-to-end — a real,
  * measurable operator (exact recovery + retrieval recall both
  * spec-asserted), not a pretend neural encoder.
  *
  * Scale shape (the point): the fit is ONE distributed pass that
  * reduces to the (p+1)×(p+1) Gram matrix G = X̃ᵀX̃ and the (p+1)×q
  * cross-moment C = X̃ᵀY (X̃ = bias-augmented X) — a few KB of partials
  * per partition combined via `treeAggregate`, a driver-side O(p³+p²q)
  * solve, and a broadcast-sized model back out. No shuffle of the data
  * ever happens; corpus size only changes the number of map tasks. The
  * projection is pure Catalyst HOFs (`transform`/`zip_with`/
  * `aggregate` over a literal weight matrix) — codegen'd, no UDF.
  *
  * The (tiny, dense) normal-equations solve lives here rather than in
  * an external library: Gauss-Jordan with partial pivoting, exact-
  * deterministic given its inputs. Bias is not regularized (standard).
  */
object CrossModal {

  /** Learned affine map: `w` is (p+1)×q row-major — rows 0..p-1 weight
    * x's coordinates, row p is the bias.
    */
  case class Model(p: Int, q: Int, lambda: Double, w: Array[Array[Double]])

  /** Fit on a DataFrame bearing `xCol`/`yCol` array<float> columns.
    * Dims are pinned by the first row; a ragged row fails fast (a
    * silent mis-sized outer product would corrupt the Gram quietly).
    */
  def fitRidge(pairs: DataFrame, lambda: Double = 1e-6,
               xCol: String = "x", yCol: String = "y"): Model = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val data = pairs.select(col(xCol), col(yCol))
      .as[(Array[Float], Array[Float])]
    val head = data.head()
    val p = head._1.length; val q = head._2.length
    require(p > 0 && q > 0, "empty feature vectors")
    val m = p + 1 // bias-augmented
    // one pass: per-partition dense accumulation, elementwise combine
    val (g, c) = data.rdd.treeAggregate(
      (new Array[Double](m * m), new Array[Double](m * q)))(
      seqOp = { case ((gAcc, cAcc), (x, y)) =>
        require(x.length == p && y.length == q,
          s"ragged pair: got (${x.length}, ${y.length}), expected ($p, $q)")
        var i = 0
        while (i <= p) {
          val xi = if (i == p) 1.0 else x(i).toDouble
          var j = 0
          while (j <= p) {
            gAcc(i * m + j) += xi * (if (j == p) 1.0 else x(j).toDouble)
            j += 1
          }
          var k = 0
          while (k < q) { cAcc(i * q + k) += xi * y(k).toDouble; k += 1 }
          i += 1
        }
        (gAcc, cAcc)
      },
      combOp = { case ((g1, c1), (g2, c2)) =>
        var i = 0
        while (i < g1.length) { g1(i) += g2(i); i += 1 }
        i = 0
        while (i < c1.length) { c1(i) += c2(i); i += 1 }
        (g1, c1)
      },
      depth = 2)
    // ridge on the weight rows only, never the bias row
    val a = Array.tabulate(m, m)((i, j) =>
      g(i * m + j) + (if (i == j && i < p) lambda else 0.0))
    val b = Array.tabulate(m, q)((i, k) => c(i * q + k))
    Model(p, q, lambda, solveInPlace(a, b))
  }

  /** Gauss-Jordan with partial pivoting, q right-hand sides at once —
    * mutates its arguments, returns the solution matrix.
    */
  private def solveInPlace(a: Array[Array[Double]],
                           b: Array[Array[Double]]): Array[Array[Double]] = {
    val m = a.length
    val q = b(0).length
    var col = 0
    while (col < m) {
      var piv = col
      var best = math.abs(a(col)(col))
      var r = col + 1
      while (r < m) {
        val v = math.abs(a(r)(col)); if (v > best) { best = v; piv = r }; r += 1
      }
      require(best > 1e-12,
        s"singular normal equations at column $col — degenerate features; raise lambda")
      if (piv != col) {
        val t = a(piv); a(piv) = a(col); a(col) = t
        val tb = b(piv); b(piv) = b(col); b(col) = tb
      }
      val d = a(col)(col)
      r = 0
      while (r < m) {
        if (r != col) {
          val f = a(r)(col) / d
          if (f != 0.0) {
            var c2 = 0
            while (c2 < m) { a(r)(c2) -= f * a(col)(c2); c2 += 1 }
            var k = 0
            while (k < q) { b(r)(k) -= f * b(col)(k); k += 1 }
          }
        }
        r += 1
      }
      col += 1
    }
    Array.tabulate(m)(r => Array.tabulate(q)(k => b(r)(k) / a(r)(r)))
  }

  /** The projection x → ŷ as a pure Catalyst column over `xCol`
    * (array<float>): the weight matrix rides as a q×(p+1) literal and
    * each output coordinate is a codegen'd zip_with/aggregate dot —
    * no UDF, no per-row JVM boxing beyond the array itself. Output is
    * array<float> so it cosine-joins against stored embeddings
    * directly (graft_dot takes float or double arrays).
    */
  def projectCol(model: Model, xCol: String): Column = {
    // rows of Wᵀ: one q-length literal list of (p+1)-length weight rows
    val wt = typedlit((0 until model.q).map(k =>
      (0 to model.p).map(j => model.w(j)(k))))
    val augX = concat(col(xCol).cast("array<double>"), array(lit(1.0d)))
    transform(wt, wr =>
      aggregate(zip_with(augX, wr, (a, b) => a * b), lit(0.0d), (acc, v) => acc + v))
      .cast("array<float>")
  }

  /** pairs + model → DataFrame with `outCol` (array<float>) appended. */
  def project(df: DataFrame, model: Model, xCol: String = "x",
              outCol: String = "y_hat"): DataFrame =
    df.withColumn(outCol, projectCol(model, xCol))
}
