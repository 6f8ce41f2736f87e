package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Approximate nearest-neighbor search via random-hyperplane LSH
  * (training-pipeline similarity mandate — the 100 TB scale path next to
  * the exact brute-force baseline in SimQueries).
  *
  * L hash tables × P hyperplanes: each vector gets a P-bit bucket per
  * table (sign of dot(v, plane)); candidates are corpus vectors sharing a
  * bucket with the probe in ANY table; final ranking is exact cosine over
  * candidates only.
  *
  * Scale notes: planes are a tiny broadcast dim (L·P rows). Bucketing is
  * a narrow map + one groupBy(vec); the probe⇄corpus match is an
  * equi-join on (table, bucket) — the whole point: candidate volume is
  * corpus/2^P per table instead of the full corpus. Recall/cost is tuned
  * by (L, P); an IVF variant would replace random planes with k-means
  * centroids, same join shape.
  */
object AnnLsh {

  /** Deterministic pseudo-random hyperplanes (seeded). */
  private def planes(spark: SparkSession, tables: Int, planesPerTable: Int,
                     dim: Int, seed: Long): DataFrame = {
    val rnd = new Random(seed)
    val rows = for (t <- 0 until tables; p <- 0 until planesPerTable)
      yield (t, p, Array.fill(dim)(rnd.nextGaussian()))
    spark.createDataFrame(rows).toDF("table_id", "plane_id", "w")
  }

  /** (id, table_id, bucket) — the P sign bits packed into a long. */
  def buckets(vectors: DataFrame, idCol: String, vecCol: String,
              planesDf: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(planesDf))
      .withColumn("bit", when(expr(s"graft_dot($vecCol, w)") >= 0,
        expr("shiftleft(1L, plane_id)")).otherwise(0L))
      .groupBy(col(idCol), col("table_id"))
      .agg(sum("bit").as("bucket"))

  /** Approximate top-k cosine neighbors for each probe.
    *
    * Recall/cost on THIS corpus (near-uniform random vectors, top-5
    * neighbor sims only 0.3–0.5): measured recall@5 ≈ 0.20 at L=4/P=6,
    * 0.42 at L=8/P=6; more planes empties buckets (0.12 at P=8). Random-
    * hyperplane LSH rewards real cluster structure — on an embedding
    * corpus with near-dup structure (sim ≥ 0.8) the same L=8/P=6 config
    * has per-table collision ≈ 0.66 and recall ≈ 1-(1-0.66)^8 ≈ 0.99.
    * Defaults are the measured sweet spot here.
    */
  def approxTopK(spark: SparkSession, embeddings: DataFrame, probeMaxId: Long = 10,
                 k: Int = 5, tables: Int = 8, planesPerTable: Int = 6,
                 seed: Long = 42): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    if (embeddings.isEmpty) {
      return Seq.empty[(Long, Long, Double, Long)]
        .toDF("probe_id", "neighbor_id", "sim", "rn")
    }
    val dim = embeddings.select(size(col("embedding"))).first().getInt(0)
    val pl = planes(spark, tables, planesPerTable, dim, seed)
    val vecs = embeddings.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
    val bk = buckets(vecs.select(col("vec_id"), col("v")), "vec_id", "v", pl)
    // cache: both the probe side and the corpus side derive from this plan;
    // without it the dominant bucketing stage executes twice
    val withB = vecs.join(bk, "vec_id").cache()
    val probes = withB.filter(col("vec_id") < probeMaxId)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"),
        col("table_id").as("p_table"), col("bucket").as("p_bucket"))
    val cands = broadcast(probes)
      .join(withB, col("table_id") === col("p_table") &&
        col("bucket") === col("p_bucket") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        col("pv"), col("pn"), col("v"), col("nrm"))
      .dropDuplicates("probe_id", "neighbor_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("sim").desc, col("neighbor_id"))
    cands.select(col("probe_id"), col("neighbor_id"),
        round(expr("graft_dot(pv, v)") / (col("pn") * col("nrm")), 6).as("sim"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .orderBy("probe_id", "rn")
  }
}
