package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
  * Data-efficient learning at web-scale through semantic deduplication",
  * 2023): k-means-cluster the embedding space, compare ONLY
  * within-cluster pairs, and drop every vector that has a lower-id
  * within-cluster neighbor at or above the cosine threshold — the
  * embedding-space complement of MinHash/SimHash for text.
  *
  * Scale shape — the 100 TB property is that NO cross-cluster pair is
  * ever materialized: candidate generation is an equi-join on the
  * cluster id (expected pair volume ~ corpus²/nlist for balanced cells,
  * vs corpus² for the exact twin q_dedup_embed_cosine), and the cluster
  * assignment reuses AnnIvf.buildIndex — bounded driver-side k-means
  * training, broadcast-literal centroid argmin in one codegen'd
  * projection, so the only corpus-sized shuffle is the list_id join.
  * Precision is 1.0 by construction (within-cell similarity is the
  * exact cosine at the same threshold); recall is the fraction of true
  * near-dup pairs whose endpoints land in one cell — measured against
  * the exact twin in SemDedupSpec, and rising with nlist shrinking or
  * real (clustered) embeddings, exactly as in the paper.
  */
object SemDedup {

  /** Within-cluster near-duplicate pairs (a_id < b_id, cosine ≥
    * `threshold`), carrying the shared cluster id.
    */
  def nearDupPairs(spark: SparkSession, embeddings: DataFrame,
                   threshold: Double = 0.4, nlist: Int = 16,
                   seed: Long = 42): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val (assigned, _) = AnnIvf.buildIndex(spark, embeddings, nlist, seed)
    val vecs = embeddings.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      .join(assigned, "vec_id")
    val a = vecs.select(col("list_id"), col("vec_id").as("a_id"),
      col("v").as("av"), col("nrm").as("an"))
    val b = vecs.select(col("list_id"), col("vec_id").as("b_id"),
      col("v").as("bv"), col("nrm").as("bn"))
    a.join(b, Seq("list_id")) // equi-join on the cell — never all-pairs
      .filter(col("a_id") < col("b_id"))
      .select(col("list_id"), col("a_id"), col("b_id"),
        (expr("graft_dot(av, bv)") / (col("an") * col("bn"))).as("sim_raw"))
      .filter(col("sim_raw") >= threshold)
      .select(col("list_id"), col("a_id"), col("b_id"),
        round(col("sim_raw"), 6).as("sim"))
  }

  /** Per-vector keep/drop decision over the whole corpus: a vector is
    * dropped iff it appears as the HIGHER id of some within-cluster pair
    * (keep-min-id — deterministic, one representative survives each
    * semantic duplicate chain). Emitting every vector keeps the output
    * a total function of the corpus rather than a possibly-empty pair
    * list.
    */
  def decisions(spark: SparkSession, embeddings: DataFrame,
                threshold: Double = 0.4, nlist: Int = 16,
                seed: Long = 42): DataFrame = {
    val drops = nearDupPairs(spark, embeddings, threshold, nlist, seed)
      .select(col("b_id").as("vec_id")).distinct()
      .withColumn("dropped", lit(true))
    embeddings.select(col("vec_id"))
      .join(drops, Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("dropped"), lit(false)).as("dropped"))
      .orderBy("vec_id")
  }
}
