package graft

import graft.operators.{CountMinSketch, SketchStore}
import org.apache.spark.sql.functions._

/** Count-Min sketch (operators.CountMinSketch): one-sided error with the
  * εN bound on real corpus tokens, LOSSLESS union (bitwise at any split
  * and any partition count — integer adds, no pruning), weight
  * linearity, and the persist-then-union round-trip.
  */
class CountMinSpec extends SparkSpec {

  private val depth = 4
  private val width = 1024

  private def tokens = Tables.t(spark, sfDir, "documents")
    .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))

  test("estimate >= exact for EVERY token; max overestimate within 2N/width") {
    import spark.implicits._
    val sk = tokens.agg(CountMinSketch.sketchAgg(col("token"), depth, width).as("sk"))
    val n = tokens.count()
    val checked = tokens.groupBy("token").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sk))
      .select(col("token"), col("exact"),
        CountMinSketch.estimate(col("sk"), col("token"), depth, width).as("est"))
    val under = checked.filter(col("est") < col("exact")).count()
    assert(under == 0, s"$under tokens UNDER-estimated — violates the CMS one-sided guarantee")
    val maxOver = checked.agg(max(col("est") - col("exact"))).as[Long].head()
    val bound = 2L * n / width + 1
    assert(maxOver <= bound,
      s"max overestimate $maxOver exceeds 2N/w = $bound (N=$n, w=$width)")
  }

  test("union is lossless: split-by-doc merge == single pass, bitwise; partition-count invariant") {
    import spark.implicits._
    def bins(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.as[Array[Long]].head().toSeq
    val single = bins(tokens.repartition(1)
      .agg(CountMinSketch.sketchAgg(col("token"), depth, width)))
    val seven = bins(tokens.repartition(7)
      .agg(CountMinSketch.sketchAgg(col("token"), depth, width)))
    assert(single == seven, "sketch differs across partition counts")
    // three disjoint shards, each sketched independently, then unioned
    val sharded = bins(tokens
      .groupBy((col("doc_id") % 3).as("shard"))
      .agg(CountMinSketch.sketchAgg(col("token"), depth, width).as("sk"))
      .agg(CountMinSketch.unionAgg(col("sk"), depth, width)))
    assert(sharded == single, "union of per-shard sketches != single-pass sketch")
  }

  test("weight linearity: weight=3 sketch == 3 x unit sketch, element-wise") {
    import spark.implicits._
    val unit = tokens.agg(CountMinSketch.sketchAgg(col("token"), depth, width))
      .as[Array[Long]].head()
    val tripled = tokens
      .agg(CountMinSketch.sketchAgg(col("token"), depth, width, lit(3L)))
      .as[Array[Long]].head()
    assert(tripled.toSeq == unit.map(_ * 3).toSeq)
  }

  test("persisted daily sketches union to the single-pass sketch, bitwise") {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).cast("string").as("day"))
      .agg(CountMinSketch.sketchAgg(col("user_id"), depth, width).as("cms"))
    val dir = java.nio.file.Files.createTempDirectory("graft_cms").toString
    try {
      SketchStore.write(daily, dir, "day")
      val reloaded = SketchStore.read(spark, dir)
        .agg(CountMinSketch.unionAgg(col("cms"), depth, width))
        .as[Array[Long]].head()
      val single = Tables.events(spark, sfDir)
        .agg(CountMinSketch.sketchAgg(col("user_id"), depth, width))
        .as[Array[Long]].head()
      assert(reloaded.toSeq == single.toSeq,
        "persisted-union sketch != single-pass sketch")
    } finally Fs.rmTree(dir)
  }

  test("join-size estimate: one-sided, bounded, scala == column form") {
    import spark.implicits._
    val a = Tables.events(spark, sfDir).select(col("user_id").as("k"))
    val b = Tables.t(spark, sfDir, "orders").select(col("o_custkey").as("k"))
    def sketch(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.agg(CountMinSketch.sketchAgg(col("k"), depth, width))
        .as[Array[Long]].head()
    val (ska, skb) = (sketch(a), sketch(b))
    val est = CountMinSketch.joinSizeEstimate(ska, skb, depth, width)
    val exact = a.join(b, "k").count()
    assert(est >= exact, s"join estimate $est under exact $exact — violates one-sidedness")
    val bound = exact + a.count() * b.count() / width
    assert(est <= bound, s"join estimate $est above exact+NaNb/w = $bound")
    // column form agrees with the driver-side arithmetic bit for bit
    val estCol = a.agg(CountMinSketch.sketchAgg(col("k"), depth, width).as("ska"))
      .crossJoin(b.agg(CountMinSketch.sketchAgg(col("k"), depth, width).as("skb")))
      .select(CountMinSketch.joinSizeEstimateCol(col("ska"), col("skb"), depth, width))
      .as[Long].head()
    assert(estCol == est, s"column-form estimate $estCol != scala form $est")
  }

  test("join-size estimate is exact when a sketch row is collision-free") {
    import spark.implicits._
    // 6 distinct keys, multiplicities 1..6 and 6..1 — at width 1024 the
    // probability all 4 rows collide somewhere is nil; est must be exact:
    // sum over keys of cntA*cntB = 1*6+2*5+...+6*1 = 56
    val a = (1 to 6).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k")
    val b = (1 to 6).flatMap(k => Seq.fill(7 - k)(k.toLong)).toDF("k")
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.agg(CountMinSketch.sketchAgg(col("k"), depth, width))
        .as[Array[Long]].head()
    assert(CountMinSketch.joinSizeEstimate(sk(a), sk(b), depth, width) == 56L)
  }

  test("empty input: zero matrix; every estimate is 0") {
    import spark.implicits._
    val empty = tokens.filter(lit(false))
      .agg(CountMinSketch.sketchAgg(col("token"), depth, width).as("sk"))
    val est = empty
      .select(CountMinSketch.estimate(col("sk"), lit("anything"), depth, width))
      .as[Long].head()
    assert(est == 0L)
  }
}
