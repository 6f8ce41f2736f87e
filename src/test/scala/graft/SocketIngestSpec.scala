package graft

import graft.sources.JsonIngest
import java.io.PrintWriter
import java.net.ServerSocket
import org.apache.spark.sql.functions._

/** Network-boundary ingestion (SURVEY §1.1's [R] ingest loop, the last
  * capability the offline sandbox allows us to exercise): a real TCP
  * socket source feeding the shared parse/validate/dead-letter chain,
  * plus the rate source as the load-generator analog.
  *
  * The socket server runs in-process on an ephemeral port; the writer
  * thread pushes NDJSON (valid + malformed + invalid-type lines) and
  * holds the connection open until the query has drained — the socket
  * source treats peer close as end-of-data, not an error, but closing
  * early races the poll loop.
  */
class SocketIngestSpec extends SparkSpec {

  private def await(cond: => Boolean, timeoutMs: Long = 30000): Boolean = {
    val t0 = System.currentTimeMillis()
    while (!cond && System.currentTimeMillis() - t0 < timeoutMs) Thread.sleep(100)
    cond
  }

  test("socket NDJSON ingest: valid rows land, rejects carry reasons") {
    val lines = Seq(
      """{"event_id":1,"ts":"2024-01-01T00:05:00","user_id":7,"event_type":"view","value":1.5,"props":"{}"}""",
      """{"event_id":2,"ts":"2024-01-01T00:06:00","user_id":8,"event_type":"click","value":2.0,"props":"{}"}""",
      """not json at all""",
      """{"event_id":3,"ts":"2024-01-01T00:07:00","user_id":9,"event_type":"teleport","value":1.0,"props":"{}"}""",
      """{"event_id":4,"ts":"2024-01-01T00:08:00","user_id":10,"event_type":"purchase","value":-5.0,"props":"{}"}""",
      """{"event_id":5,"ts":"2024-01-01T00:09:00","user_id":11,"event_type":"signup","value":0.0,"props":"{}"}""")

    val server = new ServerSocket(0) // ephemeral port
    val port = server.getLocalPort
    @volatile var writerErr: Option[Throwable] = None
    @volatile var done = false
    val writer = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new PrintWriter(sock.getOutputStream, true)
        lines.foreach(out.println)
        out.flush()
        // hold the connection open until the reader has drained
        while (!done) Thread.sleep(50)
        sock.close()
      } catch { case t: Throwable => writerErr = Some(t) }
    })
    writer.setDaemon(true)
    writer.start()

    val parsed = JsonIngest.streamSocket(spark, "localhost", port)
    val q = parsed.writeStream.format("memory").queryName("sock_ingest")
      .outputMode("append").start()
    try {
      assert(await(spark.table("sock_ingest").count() == lines.size),
        s"ingested ${spark.table("sock_ingest").count()} of ${lines.size} lines in 30s" +
          writerErr.map(e => s"; writer error: $e").getOrElse(""))
      val got = spark.table("sock_ingest")
      val valid = JsonIngest.valid(got)
      assert(valid.count() == 3)
      assert(valid.select("event_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 5L))
      val rejects = JsonIngest.rejects(got).collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(rejects("not json at all") == "malformed_json")
      assert(rejects.values.toSet ==
        Set("malformed_json", "unknown_event_type", "negative_value"))
    } finally {
      done = true
      q.stop()
      server.close()
    }
  }

  test("rate source: throughput-limited synthetic ingest feeds the same chain") {
    // the load-generator analog of the reference's ingest benchmark: the
    // rate source emits (timestamp, value) rows at a bounded rows/sec —
    // map them onto the wire schema and run the SAME validation chain
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").load()
      .select(
        col("value").as("event_id"),
        col("timestamp").cast("timestamp_ntz").as("ts"),
        (col("value") % 100).as("user_id"),
        element_at(
          array(JsonIngest.validTypes.map(lit): _*),
          (col("value") % JsonIngest.validTypes.size).cast("int") + 1).as("event_type"),
        (col("value") % 10).cast("double").as("value"),
        lit("{}").as("props"))
      .withColumn("reject_reason",
        graft.sources.EventValidation.rejectReason((lit(false), "never")))
    val q = events.writeStream.format("memory").queryName("rate_ingest")
      .outputMode("append").start()
    try {
      assert(await(spark.table("rate_ingest").count() >= 100),
        "rate source produced <100 rows in 30s")
      // every synthetic row passes the shared validation chain
      assert(spark.table("rate_ingest").filter(col("reject_reason").isNotNull).count() == 0)
    } finally q.stop()
  }
}
