package graft.operators

import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding dimensionality reduction via Spark ML PCA — the
  * standard "compress the embedding column before the expensive
  * similarity pass" step of an embedding pipeline (compose: PCA → AnnLsh
  * or AnnPq for cheaper candidate generation at 100 TB).
  *
  * Uses the built-in distributed PCA (covariance + local eigen on the
  * driver's d×d matrix — d is the embedding width, never the corpus), so
  * the corpus-sized work is one pass of outer products; `array_to_vector`
  * / `vector_to_array` bridge the SQL array column to ML vectors without
  * a UDF. The projection itself is a broadcast matrix multiply per row —
  * map-only, no shuffle.
  *
  * Output is EXPLODED to scalar rows (vec_id, dim, value): the verify
  * harness's rows-check cannot sort array cells.
  */
object EmbedPca {

  /** (vec_id, dim, val) — the k-dim projection of every embedding;
    * `val` rounded for stable display, full precision lives in `model`.
    */
  def project(vecs: DataFrame, k: Int = 8): DataFrame = {
    val v = vecs.select(col("vec_id"),
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val model = new PCA().setInputCol("features").setOutputCol("pca")
      .setK(k).fit(v)
    model.transform(v)
      .select(col("vec_id"), posexplode(vector_to_array(col("pca"))).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        round(col("v"), 6).as("pca_val"))
      .orderBy("vec_id", "dim")
  }

  /** Fraction of total variance the top-k components carry — the number
    * that decides whether k was enough before shrinking the index.
    */
  def explainedVariance(vecs: DataFrame, k: Int = 8): Double = {
    val v = vecs.select(
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
    new PCA().setInputCol("features").setOutputCol("pca").setK(k).fit(v)
      .explainedVariance.toArray.sum
  }
}
