package graft.streaming

import graft.sources.MqBroker
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.StreamingQuery

/** Producer half of the `graft-mq` transport (the reference lifecycle's
  * step 2: validated ingress PUBLISHES to a message-queue exchange —
  * SURVEY §3.1 [R]): rows publish as JSON messages to an [[MqBroker]]
  * topic, per-partition connections, executor-side — the driver never
  * touches payload bytes, so a relay scales with the cluster, not the
  * driver.
  *
  * Delivery contract, honestly stated: '''at-least-once.''' A
  * foreachBatch replay after a crash re-publishes its uncommitted
  * batch, and a task retry re-publishes its partition — exactly the
  * producer-crash-republish behavior every graft queue consumer already
  * absorbs (content gates downstream: DedupStore / dedupById — the r14
  * division of labor). Offsets are assigned by the broker per PUB, so
  * relayed messages arrive under fresh dense offsets regardless of
  * publisher parallelism; cross-partition ORDER is not promised (it
  * never is on a fanned-out queue) — consumers that need order sort on
  * payload fields, not arrival.
  */
object MqSink {

  /** Publish every row of `df` (as `to_json` of all columns) to
    * `topic`; returns nothing a caller should trust beyond "the broker
    * acked every partition's batches" (the ack is the fsync point).
    * One connection + one PUB per `pubBatch` rows per partition.
    */
  def publishBatch(df: DataFrame, host: String, port: Int, topic: String,
                   pubBatch: Int = 1024): Unit =
    df.toJSON.rdd.foreachPartition { it =>
      it.grouped(pubBatch).foreach { g =>
        MqBroker.publishStrings(host, port, topic, g.toSeq)
      }
    }

  /** Streaming relay: consume any stream, publish each micro-batch to
    * `topic`. The checkpoint makes the RELAY exactly-once per batch ID
    * on the happy path; a crash between publish and commit replays the
    * batch (at-least-once on the wire, see class doc).
    */
  def relay(stream: DataFrame, host: String, port: Int, topic: String,
            checkpoint: String, pubBatch: Int = 1024): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        publishBatch(batch.toDF(), host, port, topic, pubBatch)
      }
      .start()
}
