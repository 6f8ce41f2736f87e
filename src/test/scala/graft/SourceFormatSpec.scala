package graft

import org.apache.spark.sql.functions._

/** Source/sink format breadth beyond parquet: ORC round-trips the event
  * schema losslessly and its scan honors predicate pushdown — the same
  * scan-side guarantees PlanSpec proves for parquet (avro is not bundled
  * in this Spark distribution's jars, so parquet/orc/csv/json/text is
  * the complete on-disk surface here).
  */
class SourceFormatSpec extends SparkSpec {

  test("orc: lossless round-trip of the event schema") {
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    ev.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == ev.schema,
      s"schema drift through orc: ${back.schema} vs ${ev.schema}")
    assert(back.count() == ev.count())
    // value-level fidelity, not just counts: checksum both sides
    def sig(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("string"), col("ts").cast("string")).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0) // order-independent, no overflow
    assert(sig(back) == sig(ev), "content checksum mismatch through orc")
  }

  test("orc: predicates push into the orc scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc2").toString
    Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value")
      .write.mode("overwrite").orc(dir)
    val q = spark.read.orc(dir)
      .filter(col("user_id") > 100 && col("event_type") === "click")
      .select("event_id")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(user_id"),
      s"user_id filter not pushed to the orc scan:\n$p")
    assert(!p.toLowerCase.contains("readschema: struct<event_id:bigint,user_id:bigint,event_type:string,value:double>"),
      "projection not pruned in the orc scan")
    q.collect()
  }
}
