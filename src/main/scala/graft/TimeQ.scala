package graft
import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries: `runMain graft.TimeQ q_a q_b ...`
  * (dev loop for perf work — Bench runs the whole suite; this runs a few
  * named queries with the same session config, twice each, printing
  * cold/warm seconds).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // match Bench's session exactly so warm numbers compare 1:1
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[timeq] unknown query: $name")
        case Some(fn) =>
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            val n = fn(spark, sfDir).count()
            ((System.nanoTime() - t0) / 1e9, n)
          }
          println(f"[timeq] $name%-28s cold ${times(0)._1}%6.2f s  warm ${times(1)._1}%6.2f s  rows ${times(0)._2}")
          Blocks.dropAll(spark) // same between-query cleanup as Bench
      }
    }
    spark.stop()
  }
}
