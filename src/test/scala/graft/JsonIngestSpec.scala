package graft

import graft.sources.JsonIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Ingest-validation behavior: valid events parse; malformed / incomplete /
  * out-of-domain events land in the reject channel with a reason — the
  * reference's validate-and-ack-away path.
  */
class JsonIngestSpec extends SparkSpec {

  private val lines = Seq(
    """{"event_id": 1, "ts": "2024-01-01T00:00:01", "user_id": 7, "event_type": "view", "value": 1.5, "props": "{}"}""",
    """{"event_id": 2, "ts": "2024-01-01T00:00:02", "user_id": 8, "event_type": "purchase", "value": 9.99, "props": "{\"k\": 3}"}""",
    """not json at all""",
    """{"ts": "2024-01-01T00:00:03", "user_id": 9, "event_type": "view", "value": 1.0, "props": "{}"}""",
    """{"event_id": 4, "ts": "2024-01-01T00:00:04", "user_id": 10, "event_type": "teleport", "value": 1.0, "props": "{}"}""",
    """{"event_id": 5, "ts": "2024-01-01T00:00:05", "user_id": 11, "event_type": "view", "value": -3.0, "props": "{}"}""")

  test("batch parse: valid rows survive, each bad row gets the right reason") {
    import spark.implicits._
    val parsed = JsonIngest.parse(lines.toDF("value"))
    val ok = JsonIngest.valid(parsed).orderBy("event_id")
    assert(ok.select("event_id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(ok.columns.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    val bad = JsonIngest.rejects(parsed).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(bad("not json at all") == "malformed_json")
    assert(bad.values.toSeq.count(_ == "missing_event_id") == 1)
    assert(bad.values.toSeq.count(_ == "unknown_event_type") == 1)
    assert(bad.values.toSeq.count(_ == "negative_value") == 1)
    assert(bad.size == 4)
  }

  test("csv parse: schema-typed read with corrupt-record reject channel") {
    import graft.sources.CsvIngest
    val dir = java.nio.file.Files.createTempDirectory("graft_csv")
    val f = dir.resolve("events.csv")
    java.nio.file.Files.writeString(f,
      Seq("1,2024-01-01T00:00:01,7,view,1.5,{}",
        "2,2024-01-01T00:00:02,8,purchase,9.99,{}",
        "not,a,valid,row,at,all,extra,cols",
        // extra trailing token: must be REJECTED, not silently truncated
        "4,2024-01-01T00:00:04,9,view,1.5,{},junk",
        "",
        "3,2024-01-01T00:00:03,9,teleport,1.0,{}").mkString("\n"))
    val parsed = CsvIngest.readCsv(spark, f.toString)
    val ok = CsvIngest.valid(parsed)
    assert(ok.count() == 2)
    assert(ok.schema("ts").dataType.typeName == "timestamp_ntz")
    val bad = CsvIngest.rejects(parsed).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    // every reject keeps the ORIGINAL line for dead-letter replay
    assert(bad.forall(_._1 != null), s"reject lost its raw line: $bad")
    assert(bad.map(_._2).sorted ==
      Seq("malformed_csv", "malformed_csv", "unknown_event_type"), s"got $bad")
    assert(bad.exists(r => r._1.startsWith("3,") && r._2 == "unknown_event_type"))
    assert(bad.exists(r => r._1.endsWith(",junk") && r._2 == "malformed_csv"),
      "extra-column line must be rejected, not truncated")
  }

  test("absent event_type is rejected, not waved through (tri-state isin trap)") {
    import spark.implicits._
    // JSON with the field missing entirely
    val j = JsonIngest.parse(Seq(
      """{"event_id": 9, "ts": "2024-01-01T00:00:09", "user_id": 1, "value": 1.0, "props": "{}"}""")
      .toDF("value"))
    assert(JsonIngest.rejects(j).collect().map(_.getString(1)).toSeq ==
      Seq("missing_event_type"))
    // CSV with an empty type token
    import graft.sources.CsvIngest
    val c = CsvIngest.parse(Seq("9,2024-01-01T00:00:09,1,,1.0,{}").toDF("value"))
    assert(CsvIngest.rejects(c).collect().map(_.getString(1)).toSeq ==
      Seq("missing_event_type"))
  }

  test("streaming parse: same validation through micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val q = JsonIngest.parse(input.toDF())
      .writeStream.format("memory").queryName("ingest").outputMode("append").start()
    try {
      input.addData(lines.take(3)); q.processAllAvailable()
      input.addData(lines.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("ingest")
    assert(out.count() == 6)
    assert(out.filter("reject_reason IS NULL").count() == 2)
    assert(out.filter("reject_reason = 'malformed_json'").count() == 1)
  }
}
