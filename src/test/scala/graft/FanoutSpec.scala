package graft

import graft.operators.Fanout
import org.apache.spark.sql.functions._

/** Fan-out materializes all three reference views from one cached scan,
  * each consistent with an independently-computed aggregate.
  */
class FanoutSpec extends SparkSpec {

  test("writeAll materializes three consistent views from one input") {
    val out = java.nio.file.Files.createTempDirectory("graft_fanout").toString
    val ev = Tables.events(spark, sfDir)
    val counts = Fanout.writeAll(spark, ev, out)
    assert(counts.keySet == Set("counts_per_user", "uniques_hourly", "topk_hourly"))
    assert(counts.values.forall(_ > 0))

    // per-user counts sum back to the total event count
    val totalFromView = spark.read.parquet(s"$out/counts_per_user")
      .agg(sum("cnt")).first().getLong(0)
    assert(totalFromView == ev.count())

    // exact uniques per hour match a direct computation
    val direct = ev.groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val viaView = spark.read.parquet(s"$out/uniques_hourly")
      .collect().map(r => r.get(0).toString -> r.getLong(2)).toMap
    assert(viaView == direct)

    // top-k view has <= 5 ranked users per hour, rank 1 first
    val topk = spark.read.parquet(s"$out/topk_hourly")
    assert(topk.groupBy("hour").agg(count(lit(1)).as("n"))
      .filter(col("n") > 5).count() == 0)
    assert(topk.filter(col("rn") === 1).count() ==
      topk.select("hour").distinct().count())
  }
}
