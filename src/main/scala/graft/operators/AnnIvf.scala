package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * data-adaptive alternative to AnnLsh's random hyperplanes.
  *
  * Train k-means centroids (seeded, deterministic), assign every corpus
  * vector to its nearest centroid (the inverted lists), then search each
  * probe only in the `nprobe` nearest lists, reranking candidates by
  * exact cosine.
  *
  * Scale notes: at test scale k-means trains on the full corpus; at
  * 100 TB train on a sample (`.sample(...)` before `fit` — centroid
  * quality needs only a representative subset) while list assignment
  * stays one narrow map over everything. Centroids are tiny and
  * broadcast; the probe search is an equi-join on list id — candidate
  * volume is ~ corpus · nprobe / nlist instead of the full corpus. This
  * is the standard shape of billion-vector IVF indexes; swapping cosine
  * rerank for product quantization changes only the rerank expression.
  */
object AnnIvf {

  /** (vec_id, list_id) assignments + the centroid table (list_id, c). */
  def buildIndex(spark: SparkSession, embeddings: DataFrame, nlist: Int = 16,
                 seed: Long = 42): (DataFrame, DataFrame) = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val train = embeddings.select(col("vec_id"), col("embedding")).cache()
    try {
      val n = train.count()
      val k = math.min(nlist.toLong, math.max(1L, n)).toInt
      val asMl = train.map { r =>
        (r.getLong(0), Vectors.dense(r.getSeq[Float](1).map(_.toDouble).toArray))
      }.toDF("vec_id", "features")
      // few iterations suffice: buckets only need stable coarse centroids,
      // not converged clusters (recall is governed by nprobe, not k-means
      // convergence)
      val model = new KMeans().setK(k).setSeed(seed).setMaxIter(8)
        .setFeaturesCol("features").fit(asMl)
      val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray)
      }.toSeq.toDF("list_id", "c")
      // materialize assignments before releasing the training cache
      val assigned = model.transform(asMl)
        .select(col("vec_id"), col("prediction").as("list_id")).cache()
      assigned.count()
      (assigned, centroids)
    } finally { train.unpersist(); () }
  }

  /** Approximate top-k cosine neighbors searching nprobe inverted lists. */
  def approxTopK(spark: SparkSession, embeddings: DataFrame, probeMaxId: Long = 10,
                 k: Int = 5, nlist: Int = 16, nprobe: Int = 4,
                 seed: Long = 42): DataFrame = {
    import spark.implicits._
    // KMeans cannot fit zero rows; an empty corpus means empty results
    if (embeddings.isEmpty) {
      return Seq.empty[(Long, Long, Double, Long)]
        .toDF("probe_id", "neighbor_id", "sim", "rn")
    }
    val (assigned, centroids) = buildIndex(spark, embeddings, nlist, seed)
    val vecs = embeddings.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      .join(assigned, "vec_id")
      .cache()
    // nprobe nearest lists per probe, by euclidean distance to centroid
    val probes = vecs.filter(col("vec_id") < probeMaxId)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
    val wLists = Window.partitionBy("probe_id").orderBy(col("dist2"), col("list_id"))
    val probeLists = probes.crossJoin(broadcast(centroids))
      .withColumn("dist2",
        expr("aggregate(zip_with(pv, c, (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), 0D, (acc, z) -> acc + z)"))
      .withColumn("lr", row_number().over(wLists))
      .filter(col("lr") <= nprobe)
      .select("probe_id", "pv", "pn", "list_id")
    // candidates = corpus vectors in those lists
    val wTop = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("neighbor_id"))
    broadcast(probeLists).join(vecs, Seq("list_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        round(expr("graft_dot(pv, v)") / (col("pn") * col("nrm")), 6).as("sim"))
      .dropDuplicates("probe_id", "neighbor_id")
      .withColumn("rn", row_number().over(wTop).cast("long"))
      .filter(col("rn") <= k)
      .orderBy("probe_id", "rn")
  }
}
