package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * data-adaptive alternative to AnnLsh's random hyperplanes.
  *
  * Train k-means centroids on a bounded, deterministic sample collected
  * to the driver (local Lloyd's — centroid quality needs only a
  * representative subset, and nlist·dim doubles are tiny), then assign
  * every corpus vector to its nearest centroid in ONE narrow codegen'd
  * projection over broadcast-literal centroids (the inverted lists), then
  * search each probe only in the `nprobe` nearest lists, reranking
  * candidates by exact cosine.
  *
  * Scale notes: this IS the billion-vector IVF shape — training cost is
  * O(sample · nlist · iters) on one node regardless of corpus size, list
  * assignment is a single map over everything (no ML-pipeline jobs: round
  * 1's Spark-ML KMeans ran 8+ sequential jobs over a 2k-vector frame,
  * pure fixed overhead), and the probe search is an equi-join on list id
  * — candidate volume ~ corpus · nprobe / nlist instead of the full
  * corpus. Swapping cosine rerank for product quantization changes only
  * the rerank expression.
  */
object AnnIvf {

  /** Driver-local Lloyd's iterations, deterministic under `seed`. */
  private def localKMeans(points: Array[Array[Double]], k: Int, iters: Int,
                          seed: Long): Array[Array[Double]] = {
    val dim = points(0).length
    val rnd = new Random(seed)
    var centroids = rnd.shuffle(points.indices.toVector).take(k)
      .map(i => points(i).clone()).toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      points.foreach { p =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < centroids.length) {
          var d = 0.0
          var j = 0
          while (j < dim) { val t = p(j) - centroids(c)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c } // strict < : first min wins
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += p(j); j += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(k)(c =>
        if (counts(c) > 0) sums(c).map(_ / counts(c)) else centroids(c))
    }
    centroids
  }

  /** (vec_id, list_id) assignments + the centroid table (list_id, c). */
  def buildIndex(spark: SparkSession, embeddings: DataFrame, nlist: Int = 16,
                 seed: Long = 42, maxTrain: Int = 65536): (DataFrame, DataFrame) = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    if (embeddings.isEmpty) {
      return (Seq.empty[(Long, Int)].toDF("vec_id", "list_id"),
        Seq.empty[(Int, Seq[Double])].toDF("list_id", "c"))
    }
    // deterministic bounded sample: first maxTrain ids (at 100 TB swap for
    // .sample(fraction, seed) — any representative subset trains equally well)
    val train = embeddings.select(col("vec_id"), col("embedding"))
      .orderBy("vec_id").limit(maxTrain)
      .collect().map(_.getSeq[Float](1).toArray.map(_.toDouble))
    val k = math.min(nlist, train.length)
    val centroids = localKMeans(train, k, iters = 10, seed = seed)
    val centroidsDf = centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("list_id", "c")
    // nearest-centroid assignment as one projection: argmin_i dist² via the
    // lexicographic min of (score_i, i) structs, where score_i = |c_i|² -
    // 2·v·c_i (the |v|² term is constant per row). Ties break to the lowest
    // list id — same first-min rule as the training loop.
    val scored: Column = array(centroids.zipWithIndex.map { case (c, i) =>
      val normSq = c.map(x => x * x).sum
      struct(
        (call_function("graft_dot", col("embedding"), typedlit(c.toSeq)) * -2.0
          + normSq).as("s"),
        lit(i).as("i"))
    }: _*)
    val assigned = embeddings.select(col("vec_id"),
      array_min(scored).getField("i").as("list_id"))
    (assigned, centroidsDf)
  }

  /** Approximate top-k cosine neighbors searching nprobe inverted lists. */
  def approxTopK(spark: SparkSession, embeddings: DataFrame, probeMaxId: Long = 10,
                 k: Int = 5, nlist: Int = 16, nprobe: Int = 4,
                 seed: Long = 42): DataFrame = {
    import spark.implicits._
    // k-means cannot fit zero rows; an empty corpus means empty results
    if (embeddings.isEmpty) {
      return Seq.empty[(Long, Long, Double, Long)]
        .toDF("probe_id", "neighbor_id", "sim", "rn")
    }
    val (assigned, centroids) = buildIndex(spark, embeddings, nlist, seed)
    // cache: probe side and corpus side both derive from this plan (one-shot
    // harness; long-lived sessions should unpersist after materializing —
    // same caveat as MinHash/SimHash)
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
