package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // size-first post-shuffle coalescing (see Bench) — results are
      // partition-count-invariant by construction, which the 7-cpu
      // determinism probe re-proves on every run
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter: comma-separated names (or a substring) to
    // dump just a few queries. The driver never sets this.
    val only = sys.env.get("GRAFT_VERIFY_ONLY").map(_.split(',').toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(o => o.contains(name) || o.exists(name.contains))
    }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = (e.getClass.getSimpleName + ": " +
          String.valueOf(e.getMessage)).linesIterator.mkString(" ").take(500)
      }
      // operators cache intermediates for intra-query reuse; dropping them
      // (and leaked result-checkpoint blocks) between queries keeps a
      // 100+-query session from accumulating storage that squeezes later
      // queries
      Blocks.dropAll(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Round-8 (VERDICT r7 item 3): failed dumps become an ARTIFACT, not
    // stderr lint — a silent coverage contraction (44 queries in r7) shows
    // up as a non-empty file the driver/judge can diff.
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED to dump — see verify_errors.json")
    spark.stop()
  }
}
