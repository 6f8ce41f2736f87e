package graft

import org.apache.spark.sql.functions.col
import java.nio.file.Files
import scala.sys.process._

/** SURVEY.md §5.3.2 — replays the driver's t2 loop on sf0.001 before every
  * commit: dump every oracle-checked query to parquet, run the paired SQL
  * through DuckDB (shelling out to python3), compare via the same
  * normalization as scripts/check_oracle.py. Skips cleanly if the
  * python3+duckdb oracle is unavailable.
  */
class OracleMirrorSpec extends SparkSpec {

  private val duckdbAvailable =
    try { Seq("python3", "-c", "import duckdb").! == 0 } catch { case _: Throwable => false }

  test("every oracle query matches DuckDB on sf0.001") {
    assume(duckdbAvailable, "python3+duckdb oracle not available")
    val outDir = Files.createTempDirectory("oracle_mirror").toFile.getAbsolutePath
    SparkEntry.oracleSql.keys.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    val q = (s: String) => "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    val rc = Seq("python3", "scripts/check_oracle.py", sfDir, outDir).!
    assert(rc == 0, s"oracle mismatch — run: python3 scripts/check_oracle.py $sfDir $outDir")
  }

  test("t1 smoke: entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("events loader regression: ts arrives as exact micros TIMESTAMP_NTZ") {
    // SURVEY.md §5.3.6 — schema-adaptive twin of the adaptive loader. On a
    // NANOS layout (nanosAsLong → BIGINT) it would have caught the /1000
    // double-rounding bug: integer-div micros must reconstruct every raw
    // nano value's prefix. On the current MICROS layout the loader must be
    // a value-exact identity. SQL `div` truncates toward zero — identical
    // to floor for the post-epoch timestamps this data guarantees.
    import org.apache.spark.sql.functions.unix_micros
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val viaLoader = Tables.events(spark, sfDir)
      .select(unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(_.getLong(0)).sorted
    val expected = (raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.select(col("ts")).collect().map(_.getLong(0) / 1000L)
      case _ =>
        raw.select(unix_micros(col("ts").cast("timestamp")).as("us"))
          .collect().map(_.getLong(0))
    }).sorted
    assert(viaLoader.toSeq == expected.toSeq)
    assert(expected.headOption.forall(_ >= 0), "pre-epoch data would need a floor-div loader")
  }
}
