package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact, shuffle-parallel ntile + percent_rank — the 100 TB twin of
  * q_win_ntile_pct's empty-partition global window (which Spark executes
  * on a SINGLE reducer: every row moves to one task).
  *
  * Shape: range-repartition on the sort key (Spark samples split points,
  * so partitions are balanced), sort within partitions, then convert the
  * per-partition row index to a GLOBAL rank via zipWithIndex (one tiny
  * extra job collecting just the partition sizes — the standard
  * distributed ranking idiom). ntile/percent_rank are then pure per-row
  * arithmetic on (rank, n):
  *
  *   ntile(k):  the first n % k buckets hold ⌈n/k⌉ rows, the rest ⌊n/k⌋
  *              (exactly Spark's NTile semantics, reproduced closed-form);
  *   percent_rank = (rank - 1) / (n - 1)   (0 when n == 1).
  *
  * Output is row-for-row identical to the window formulation because the
  * total order (o_totalprice, o_orderkey) is unique — ScalaTest-checked.
  */
object ScalableNtile {

  /** (o_orderkey, decile, pct) over orders, matching q_win_ntile_pct. */
  def ntilePct(orders: DataFrame, k: Int, partitions: Int = 32): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val keyed = orders.select(col("o_orderkey"), col("o_totalprice"))
    val n = keyed.count()
    if (n == 0L) {
      return Seq.empty[(Long, Long, Double)].toDF("o_orderkey", "decile", "pct")
    }
    // same size-derived partition count as ntileBy (r17) — rank values
    // are partitioning-independent
    val parts = math.max(1, math.min(partitions.toLong, (n + 65535) / 65536)).toInt
    val ranked = keyed
      .repartitionByRange(parts, col("o_totalprice"), col("o_orderkey"))
      .sortWithinPartitions("o_totalprice", "o_orderkey")
      .rdd.zipWithIndex()
      .map { case (row, idx) => (row.getLong(0), idx + 1) } // 1-based rank
      .toDF("o_orderkey", "r")
    val bucketSize = n / k
    val rem = n % k
    val threshold = rem * (bucketSize + 1) // rows covered by the big buckets
    // integer `div`, not `/` (Column./ is double division)
    val decile =
      if (bucketSize == 0L) col("r") // n < k: each row its own bucket
      else when(col("r") <= threshold,
          expr(s"(r - 1) div ${bucketSize + 1} + 1"))
        .otherwise(expr(s"$rem + (r - 1 - $threshold) div $bucketSize + 1"))
    val pct =
      if (n == 1L) lit(0.0)
      else round((col("r") - 1).cast("double") / lit((n - 1).toDouble), 6)
    ranked.select(col("o_orderkey"),
        decile.cast("long").as("decile"),
        pct.as("pct"))
      .orderBy("o_orderkey")
  }

  /** Global `row_number() OVER (ORDER BY sort)` without the
    * single-reducer window (r13, the registry-wide uwin ban):
    * range-repartition on the sort, sort within partitions, convert the
    * per-partition index to a global 1-based rank via partition-count
    * offsets (one tiny job collecting `partitions` longs). `sort` must
    * be a TOTAL order or ranks are engine-dependent. Returns the input
    * columns + `rank` (LONG) — identical values to the window
    * formulation, no stage holding more than one partition's rows.
    */
  def rankBy(df: DataFrame, sort: Seq[org.apache.spark.sql.Column],
             partitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val rdd = df
      .repartitionByRange(partitions, sort: _*)
      .sortWithinPartitions(sort: _*)
      .rdd
    val counts = rdd.mapPartitionsWithIndex { case (i, it) =>
      var n = 0L; it.foreach(_ => n += 1); Iterator((i, n))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val out = rdd.mapPartitionsWithIndex { case (i, it) =>
      var r = offsets(i)
      it.map { row => r += 1
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ r) }
    }
    spark.createDataFrame(out,
      org.apache.spark.sql.types.StructType(df.schema.fields :+
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.LongType, nullable = false)))
  }

  /** GENERIC exact ntile over any frame — same range-partitioned
    * zipWithIndex rank as [[ntilePct]], parameterized by sort order
    * (r12, for q_evt_rfm's three scorings). `sort` must be a TOTAL
    * order (tie-break on a unique key) or bucket assignment is
    * engine-dependent; `keyCol` must be a LONG unique key. Returns
    * (keyCol, outCol) for joining back — one rank job per scoring
    * instead of one single-reducer window per scoring.
    */
  def ntileBy(df: DataFrame, keyCol: String, k: Int,
              sort: Seq[org.apache.spark.sql.Column], outCol: String,
              partitions: Int = 32, nOpt: Option[Long] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ki = df.columns.indexOf(keyCol)
    require(ki >= 0, s"ntileBy: $keyCol not in ${df.columns.mkString(", ")}")
    // callers that rank one checkpointed frame several ways (q_evt_rfm's
    // three scorings) pass the count once instead of re-running a count
    // job per scoring (r17)
    val n = nOpt.getOrElse(df.count())
    if (n == 0L) return Seq.empty[(Long, Long)].toDF(keyCol, outCol)
    // partition count derived from the input size (≥64k rows per range
    // partition), capped by `partitions`: ranks are identical under any
    // partitioning (global rank via per-partition offsets), so the only
    // effect is not paying 32-way range sampling + task scheduling to
    // sort a few thousand rows (r17; at scale n/64k exceeds any cap and
    // the parameter governs as before)
    val parts = math.max(1, math.min(partitions.toLong, (n + 65535) / 65536)).toInt
    val ranked = df
      .repartitionByRange(parts, sort: _*)
      .sortWithinPartitions(sort: _*)
      .rdd.zipWithIndex()
      .map { case (row, idx) => (row.getLong(ki), idx + 1) }
      .toDF(keyCol, "r")
    val bucketSize = n / k
    val rem = n % k
    val threshold = rem * (bucketSize + 1)
    val bucket =
      if (bucketSize == 0L) col("r")
      else when(col("r") <= threshold,
          expr(s"(r - 1) div ${bucketSize + 1} + 1"))
        .otherwise(expr(s"$rem + (r - 1 - $threshold) div $bucketSize + 1"))
    ranked.select(col(keyCol), bucket.cast("long").as(outCol))
  }
}
