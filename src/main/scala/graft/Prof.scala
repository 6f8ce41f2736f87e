package graft
import org.apache.spark.sql.SparkSession

/** Event-log profiler runner: `runMain graft.Prof q_a q_b ...` — same
  * session config as Bench/TimeQ, but with the rolling event log enabled
  * and each query's WARM (second) run wrapped in a `WARM:<name>` job
  * group so `scripts/evprof.py` can print per-query job/stage/task
  * tables. Dev tool for optimization rounds (the r17 measurement
  * protocol, committed this time).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    new java.io.File("/tmp/sparkev").mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", "/tmp/sparkev")
      .config("spark.eventLog.rolling.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[prof] unknown query: $name")
        case Some(fn) =>
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          val cold = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.setJobGroup(s"WARM:$name", name)
          val t1 = System.nanoTime()
          fn(spark, sfDir).count()
          val warm = (System.nanoTime() - t1) / 1e9
          spark.sparkContext.clearJobGroup()
          println(f"[prof] $name%-28s cold $cold%6.2f s  warm $warm%6.2f s  rows $n")
          Blocks.dropAll(spark)
      }
    }
    spark.stop()
  }
}
