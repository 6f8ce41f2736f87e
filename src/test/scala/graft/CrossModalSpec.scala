package graft

import graft.operators.CrossModal
import org.apache.spark.sql.functions._

/** Cross-modal alignment (r14): the closed-form distributed ridge fit
  * recovers a planted affine map exactly, the Catalyst projection
  * column equals the driver-side mat-vec, the fit is partition-layout
  * independent to float-reduce tolerance, and a noisy held-out split
  * still retrieves its own targets — the measurable linear core of
  * CLIP-style alignment.
  */
class CrossModalSpec extends SparkSpec {

  import spark.implicits._

  private val p = 6; private val q = 10

  // planted affine map B: q rows × (p+1) cols (last col = bias),
  // deterministic small rationals
  private def bMat(i: Int, j: Int): Double = ((i * 7 + j * 13) % 11 - 5) / 5.0

  private def applyB(x: Array[Float]): Array[Float] =
    Array.tabulate(q) { i =>
      var acc = bMat(i, p) // bias
      var j = 0
      while (j < p) { acc += bMat(i, j) * x(j); j += 1 }
      acc.toFloat
    }

  // coord 0 is injective in id (the modular pattern alone repeats every
  // 23 ids — duplicate x's would make own-target retrieval ill-posed)
  private def synthX(id: Int): Array[Float] =
    Array.tabulate(p)(j =>
      if (j == 0) (id - 200) / 200.0f
      else (((id * 31 + j * 17) % 23) - 11) / 11.0f)

  private def pairs(n: Int, noise: Double = 0.0) =
    (0 until n).map { id =>
      val x = synthX(id)
      val y = applyB(x).zipWithIndex.map { case (v, k) =>
        (v + noise * (((id * 13 + k * 7) % 19) - 9) / 9.0).toFloat
      }
      (id.toLong, x, y)
    }.toDF("id", "x", "y")

  test("exact recovery: a noiseless planted affine map solves to machine precision") {
    val model = CrossModal.fitRidge(pairs(200), lambda = 1e-10)
    assert(model.p == p && model.q == q)
    for (i <- 0 until q; j <- 0 to p)
      assert(math.abs(model.w(j)(i) - bMat(i, j)) < 1e-6,
        s"W[$j][$i] = ${model.w(j)(i)}, planted ${bMat(i, j)}")
  }

  test("the Catalyst projection column equals the driver-side mat-vec") {
    val df = pairs(50)
    val model = CrossModal.fitRidge(df, lambda = 1e-10)
    val projected = CrossModal.project(df, model)
      .select(col("id"), col("y_hat")).as[(Long, Array[Float])]
      .collect().toMap
    (0 until 50).foreach { id =>
      val expected = applyB(synthX(id)) // recovery is exact, so ŷ = Bx̃
      val got = projected(id.toLong)
      assert(got.length == q)
      got.zip(expected).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-5, s"id=$id: $a vs $b")
      }
    }
  }

  test("the fit is partition-layout independent (float-reduce tolerance)") {
    val one = CrossModal.fitRidge(pairs(300).repartition(1), lambda = 1e-6)
    val many = CrossModal.fitRidge(pairs(300).repartition(7), lambda = 1e-6)
    for (j <- 0 to p; i <- 0 until q)
      assert(math.abs(one.w(j)(i) - many.w(j)(i)) < 1e-8,
        s"partitioning moved W[$j][$i] by ${math.abs(one.w(j)(i) - many.w(j)(i))}")
  }

  test("noisy fit + held-out projection still retrieves its own target (recall@1)") {
    val all = pairs(400, noise = 0.02).localCheckpoint()
    val model = CrossModal.fitRidge(all.filter(col("id") < 300), lambda = 1e-4)
    val corpus = all.select(col("id"), col("y")).as[(Long, Array[Float])]
      .collect()
    val heldOut = CrossModal.project(all.filter(col("id") >= 300), model)
      .select(col("id"), col("y_hat")).as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val hits = heldOut.count { case (id, yh) =>
      corpus.maxBy { case (_, y) => cos(yh, y) }._1 == id
    }
    assert(hits >= 90, s"recall@1 on 100 held-out probes: $hits/100")
  }

  test("the projection composes with the persisted ANN store: cross-modal retrieval through AnnIndexStore") {
    val base = java.nio.file.Files.createTempDirectory("graft_xmodal_ann")
    try {
      val all = pairs(300).localCheckpoint() // noiseless: recovery is exact
      val model = CrossModal.fitRidge(all, lambda = 1e-8)
      operators.AnnIndexStore.save(spark,
        all.select(col("id").as("vec_id"), col("y").as("embedding")),
        s"$base/ann", nlist = 8)
      // offset probe ids: searchTopK excludes same-id matches by contract
      val probes = CrossModal.project(all.filter(col("id") < 40), model)
        .select((col("id") + 10000L).as("vec_id"), col("y_hat").as("embedding"))
      val top1 = operators.AnnIndexStore
        .searchTopK(spark, s"$base/ann", probes, k = 1, nprobe = 4)
        .select(col("probe_id"), col("neighbor_id"))
        .as[(Long, Long)].collect()
      val hits = top1.count { case (p, n) => p - 10000L == n }
      assert(hits >= 38, s"cross-modal ANN recall@1: $hits/40")
    } finally Fs.rmTree(base.toString)
  }

  test("ragged pairs and degenerate features fail fast") {
    val ragged = Seq((Array(1f, 2f), Array(1f)), (Array(1f), Array(1f)))
      .toDF("x", "y")
    assertThrows[Exception](CrossModal.fitRidge(ragged, 1e-6))
    // a constant zero feature column with zero ridge → singular Gram
    val degenerate = (0 until 20)
      .map(i => (Array(0f, i.toFloat), Array(i.toFloat)))
      .toDF("x", "y")
    val ex = intercept[Exception](CrossModal.fitRidge(degenerate, lambda = 0.0))
    assert(ex.getMessage != null)
  }
}
