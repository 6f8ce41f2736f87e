package graft

import org.apache.spark.sql.SparkSession

/** Per-query physical-plan digest → committed JSON (PLANS_r{N}.json):
  * the plan-drift regression artifact the round-5 verdict asked for.
  * PlanSpec pins shapes for the queries it covers; this captures EVERY
  * query's executed plan as a handful of normalized counts, so a
  * strategy flip (broadcast→SMJ, hash→sort agg, a new exchange) between
  * rounds shows up as a one-line diff even where no spec looks.
  *
  * `runMain graft.PlanDigest <outFile> [sfDir]` — runs each query once
  * (AQE finalizes plans only at execution) at the small SF and writes
  * one JSON line per query, keys sorted, counts taken from the FINAL
  * adaptive plan only.
  */
object PlanDigest {

  /** Node counts that characterize a plan's shape, from the final-plan
    * section of an executed plan's toString (AQE prints the initial
    * plan too — everything after "== Initial Plan ==" is dropped).
    */
  def digest(executedPlan: String): Map[String, Int] = {
    val p = executedPlan.split("== Initial Plan ==")(0)
    def n(pat: String): Int = pat.r.findAllIn(p).size
    Map(
      "exchanges"      -> n("Exchange (hash|range|SinglePartition)"),
      "broadcasts"     -> n("BroadcastExchange"),
      "bhj"            -> n("BroadcastHashJoin"),
      "smj"            -> n("SortMergeJoin"),
      "shj"            -> n("ShuffledHashJoin"),
      "bnlj"           -> n("BroadcastNestedLoopJoin"),
      "hash_agg"       -> n("HashAggregate"),
      "obj_hash_agg"   -> n("ObjectHashAggregate"),
      "sort_agg"       -> n("SortAggregate"),
      "sorts"          -> n("""[^a-zA-Z]Sort \["""),
      "windows"        -> n("""Window \["""),
      "scans"          -> n("FileScan|Scan parquet|BatchScan"),
      "pushed_filters" -> n("PushedFilters: \\[(?!\\])"),
      "generates"      -> n("Generate "),
      "custom"         -> n("TopKPerKey(Partial|Final)"),
      "codegen_spans"  -> p.linesIterator.flatMap("""\*\((\d+)\)""".r
        .findAllMatchIn(_).map(_.group(1).toInt)).toSet.size)
  }

  def main(args: Array[String]): Unit = {
    val outFile = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lines = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect() // finalize the adaptive plan
        val d = digest(df.queryExecution.executedPlan.toString)
        val fields = d.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":$v""" }.mkString(",")
        spark.catalog.clearCache()
        Some(s"""  "$name": {$fields}""")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandigest] $name failed: ${e.getMessage}")
          None
      }
    }
    val json = lines.mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.getBytes("UTF-8"))
    println(s"[plandigest] wrote ${lines.size} digests to $outFile")
    spark.stop()
  }
}
