package graft

import graft.operators.QualityModel
import org.apache.spark.sql.functions._

/** Model-based quality filtering: the distributed trainer must actually
  * learn (beat the majority class), be deterministic at any partition
  * count (fixed-point gradient sums), and score map-only.
  */
class QualityModelSpec extends SparkSpec {

  // allowlist-rate teacher — NOT the `lang` column, which is independent
  // of the text on this fixture (measured; see QualityModel scaladoc)
  private lazy val docs = Tables.t(spark, sfDir, "documents")
  private lazy val labeled = QualityModel.allowlistLabels(docs)

  test("trained classifier beats the majority-class baseline") {
    val w = QualityModel.train(docs, labeled)
    val scored = QualityModel.score(docs, w).join(labeled, "doc_id")
      .select(col("label"), (col("score") >= 0.5).cast("int").as("pred"))
      .collect()
    val acc = scored.count(r => r.getInt(0) == r.getInt(1)).toDouble / scored.length
    val majority = {
      val pos = scored.count(_.getInt(0) == 1).toDouble / scored.length
      math.max(pos, 1 - pos)
    }
    assert(acc > majority + 0.05,
      f"accuracy $acc%.3f must beat majority baseline $majority%.3f by 5pp")
  }

  test("hash-sample training: half-corpus model within 0.02 accuracy of the full model") {
    def accuracyOf(w: Array[Double]): Double = {
      val scored = QualityModel.score(docs, w).join(labeled, "doc_id")
        .select(col("label"), (col("score") >= 0.5).cast("int").as("pred"))
        .collect()
      scored.count(r => r.getInt(0) == r.getInt(1)).toDouble / scored.length
    }
    val full = accuracyOf(QualityModel.train(docs, labeled))
    val half = accuracyOf(QualityModel.train(docs, labeled, sampleFraction = 0.5))
    info(f"full=$full%.3f half-sample=$half%.3f")
    assert(math.abs(full - half) <= 0.02,
      f"sampled training drifted: full $full%.3f vs half $half%.3f " +
        "(257-weight model — sample complexity should be tiny)")
  }

  test("training is deterministic across partition counts") {
    val w4 = QualityModel.train(docs, labeled, epochs = 3)
    val w7 = QualityModel.train(docs.repartition(7), labeled.repartition(3),
      epochs = 3)
    assert(w4.toSeq == w7.toSeq,
      "fixed-point gradient sums must make weights partition-order independent")
  }

  test("training reduces log-loss epoch over epoch") {
    def logloss(w: Array[Double]): Double = {
      val rows = QualityModel.score(docs, w).join(labeled, "doc_id")
        .select(col("score"), col("label").cast("double")).collect()
      rows.map { r =>
        val p = math.min(math.max(r.getDouble(0), 1e-9), 1 - 1e-9)
        val y = r.getDouble(1)
        -(y * math.log(p) + (1 - y) * math.log(1 - p))
      }.sum / rows.length
    }
    val w0 = Array.fill(257)(0.0) // untrained: loss = ln 2
    val w3 = QualityModel.train(docs, labeled, epochs = 3)
    val w8 = QualityModel.train(docs, labeled, epochs = 8)
    assert(logloss(w3) < logloss(w0), "3 epochs must improve on zero weights")
    assert(logloss(w8) < logloss(w3), "8 epochs must improve on 3")
  }

  test("scoring pass output: one row per doc, scores in (0,1)") {
    val w = QualityModel.train(docs, labeled, epochs = 2)
    val scored = QualityModel.score(docs, w)
    assert(scored.count() == docs.count())
    val mm = scored.agg(min("score"), max("score")).collect()(0)
    assert(mm.getDouble(0) > 0.0 && mm.getDouble(1) < 1.0)
  }
}
