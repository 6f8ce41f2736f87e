package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search") — the third family member next to AnnLsh
  * (random hyperplanes) and AnnIvf (inverted lists), attacking a
  * different bottleneck: MEMORY BANDWIDTH. Vectors are compressed M
  * subspaces → one small codebook id each, so the candidate scan reads
  * M bytes per vector instead of dim·8 (64-dim doubles → 8 codes =
  * 64× less data), with distances approximated from per-probe lookup
  * tables (asymmetric distance computation, ADC) and the top candidates
  * re-ranked exactly.
  *
  * Spark shape: codebooks train driver-side on a bounded sample (M
  * independent tiny k-means via AnnIvf.localKMeans — same rationale as
  * IVF training); encoding is ONE narrow projection per vector (argmin
  * over K sub-centroids per block, the AnnIvf assignment pattern); the
  * ADC scan is an equi-join-free broadcast of the probes' LUTs followed
  * by a single `aggregate()` over the code array — all built-ins, fully
  * codegen'd, no UDF. Exact re-rank touches only top `rerank` rows per
  * probe.
  *
  * Scale notes: plain PQ still scans every CODE row (it compresses, it
  * does not prune) — the production composite is IVF-PQ: AnnIvf's lists
  * bound the candidates, this encoding shrinks what the scan reads;
  * both halves are here and compose by joining on vec_id. On the unit
  * sphere euclidean order = cosine order, so codebooks train and ADC
  * runs on L2-NORMALIZED vectors (the AnnIvf geometry argument).
  */
object AnnPq {

  /** Codebooks(m)(j) = sub-centroid j of subspace m, each subDim wide. */
  private[operators] def trainCodebooks(train: Array[Array[Double]], m: Int, k: Int,
                                        seed: Long): Array[Array[Array[Double]]] = {
    val dim = train(0).length
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val subDim = dim / m
    Array.tabulate(m) { b =>
      val sub = train.map(v => v.slice(b * subDim, (b + 1) * subDim))
      AnnIvf.localKMeans(sub, math.min(k, sub.length), iters = 10, seed = seed + b)
    }
  }

  /** Approximate top-k cosine neighbors for probes (vec_id < probeMaxId):
    * ADC over PQ codes + exact re-rank of the best `rerank` candidates.
    *
    * With `nlist > 0` this runs IVF-PQ: AnnIvf's inverted lists prune the
    * candidate set to the probe's `nprobe` nearest cells FIRST, and the
    * ADC scan reads only those cells' codes — candidate volume drops to
    * ~corpus·nprobe/nlist AND each candidate costs M bytes instead of
    * dim·8. That composition is the standard billion-vector layout.
    */
  def approxTopK(spark: SparkSession, embeddings: DataFrame, probeMaxId: Long = 10,
                 k: Int = 5, m: Int = 8, codes: Int = 16, rerank: Int = 64,
                 seed: Long = 42, maxTrain: Int = 65536,
                 nlist: Int = 0, nprobe: Int = 6): DataFrame = {
    import spark.implicits._
    def dbg(msg: String): Unit =
      if (sys.env.contains("GRAFT_PQ_DEBUG"))
        println(f"[pq] $msg t=${System.nanoTime() / 1e9}%.2f")
    dbg("start")
    graft.functions.VectorFunctions.register(spark)
    // deterministic bounded training sample, L2-normalized; doubles as the
    // emptiness probe (no separate isEmpty job) and is REUSED for the IVF
    // coarse quantizer below — one collect trains both quantizers
    val train = AnnIvf.collectTrain(embeddings, maxTrain)
    if (train.isEmpty) {
      return Seq.empty[(Long, Long, Double, Long)]
        .toDF("probe_id", "neighbor_id", "sim", "rn")
    }
    dbg("train collected")
    val dim = train(0).length
    val subDim = dim / m
    val books = trainCodebooks(train, m, codes, seed)
    dbg("codebooks trained")

    // ---- encode: per subspace, argmin over its K sub-centroids ----
    // A typed mapPartitions kernel, deliberately: the encode is a dense
    // data-independent numeric loop (m·K·subDim ≈ 1k mul-adds per row).
    // Expressed as SQL it is bad BOTH ways — unrolling m·K argmin structs
    // compiles a giant whole-stage method (~12 s one-off janino), while
    // HOF loops never codegen and pay boxed interpretation per element
    // (~11 s per cold scan here). The imperative escape hatch is the
    // right tool for this stage (same rationale as Multimodal.featurize);
    // everything around it stays declarative. Ties break to the lowest j
    // — the same first-min rule as the codebook training.
    val bBooks = spark.sparkContext.broadcast(books)
    val encoded = {
      import spark.implicits._
      embeddings.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val bks = bBooks.value
          it.map { case (id, vf) =>
            val raw = vf.map(_.toDouble)
            var s = 0.0
            var d = 0
            while (d < raw.length) { s += raw(d) * raw(d); d += 1 }
            val n = math.sqrt(s)
            val u = if (n > 0) raw.map(_ / n) else raw
            val cs = new Array[Int](bks.length)
            var b = 0
            while (b < bks.length) {
              val book = bks(b)
              var best = 0
              var bestD = Double.MaxValue
              var j = 0
              while (j < book.length) {
                var d2 = 0.0
                var t = 0
                while (t < book(j).length) {
                  val diff = u(b * book(j).length + t) - book(j)(t)
                  d2 += diff * diff
                  t += 1
                }
                if (d2 < bestD) { bestD = d2; best = j } // strict < : first min
                j += 1
              }
              cs(b) = best
              b += 1
            }
            (id, vf, n, cs)
          }
        }
        .toDF("vec_id", "v", "e_nrm", "codes")
        .cache()
    }

    // ---- probes' ADC lookup tables: lut[b*K + j] = |p_b - c_{b,j}|² ----
    val probeRows = encoded.filter(col("vec_id") < probeMaxId)
      .select(col("vec_id"), col("v"), col("e_nrm")).collect()
    dbg("probes collected (cache populated)")
    val luts = probeRows.map { r =>
      val raw = r.getSeq[Float](1).toArray.map(_.toDouble)
      val n = r.getDouble(2)
      val p = if (n > 0) raw.map(_ / n) else raw
      val lut = new Array[Double](m * codes)
      for (b <- 0 until m; j <- books(b).indices) {
        var d2 = 0.0
        var d = 0
        while (d < subDim) {
          val t = p(b * subDim + d) - books(b)(j)(d); d2 += t * t; d += 1
        }
        lut(b * codes + j) = d2
      }
      (r.getLong(0), lut.toSeq)
    }.toSeq
    val lutDf = luts.toDF("probe_id", "lut")

    // ---- ADC scan: dist ≈ Σ_b lut[b*K + code_b], one aggregate() ----
    // flat PQ scans every code row; IVF-PQ (nlist > 0) first prunes to
    // the probes' nprobe nearest inverted lists, then ADC-scans only them
    val scanSide = if (nlist > 0) {
      val (assigned, centroids) =
        AnnIvf.buildIndex(spark, embeddings, nlist, seed, trainOpt = Some(train))
      val probes = encoded.filter(col("vec_id") < probeMaxId)
        .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("e_nrm").as("pn"))
      val wL = Window.partitionBy("probe_id").orderBy(col("dist2"), col("list_id"))
      val probeLists = probes.crossJoin(broadcast(centroids))
        .withColumn("dist2", col("c_normsq") - expr("graft_dot(pv, c)") * 2.0 /
          when(col("pn") > 0, col("pn")).otherwise(lit(1.0)))
        .withColumn("lr", row_number().over(wL)).filter(col("lr") <= nprobe)
        .select("probe_id", "list_id")
      broadcast(probeLists.join(lutDf, "probe_id"))
        .join(encoded.join(assigned, "vec_id"), "list_id")
    } else encoded.crossJoin(broadcast(lutDf))
    val wTop = Window.partitionBy("probe_id").orderBy(col("adc"), col("neighbor_id"))
    val cands = scanSide
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("v"), col("e_nrm"),
        expr(s"aggregate(sequence(0, ${m - 1}), cast(0 as double), " +
          s"(acc, b) -> acc + lut[b * $codes + codes[b]])").as("adc"))
      .withColumn("arn", row_number().over(wTop))
      .filter(col("arn") <= rerank)

    // ---- exact re-rank of the ADC survivors ----
    val probeVecs = lutDf.select(col("probe_id").as("pid")).join(
      encoded.select(col("vec_id").as("pid"), col("v").as("pv"), col("e_nrm").as("pn")), "pid")
    val wFinal = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("neighbor_id"))
    cands.join(broadcast(probeVecs), col("probe_id") === col("pid"))
      .select(col("probe_id"), col("neighbor_id"),
        round(expr("graft_dot(pv, v)") / (col("pn") * col("e_nrm")), 6).as("sim"))
      .withColumn("rn", row_number().over(wFinal).cast("long"))
      .filter(col("rn") <= k)
      .orderBy("probe_id", "rn")
  }
}
