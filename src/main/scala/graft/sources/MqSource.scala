package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-mq` — a DataSourceV2 connector for [[MqBroker]]'s replayable
  * log protocol: the network message-queue source the r16 verdict listed
  * as the capability-surface gap ("no Kafka/socket source exists") —
  * closed Spark-first, with the same division of labor as every graft
  * ingest path:
  *
  *  - '''The checkpoint is the consumer group.''' The broker tracks no
  *    consumers; Spark's offset log records each micro-batch's
  *    [start, end) range, and because `FETCH` re-serves any range
  *    verbatim, restart-replay re-reads EXACTLY the failed batch —
  *    file-source semantics (QueueIngest r14) over a socket. Two queries
  *    with two checkpoints are two consumer groups.
  *  - '''Offsets are dense record indices''', so admission control is
  *    integer arithmetic (`maxRowsPerTrigger` → `min(end, start + n)`),
  *    and a batch's row count is knowable before a byte moves.
  *  - '''Fan-out is range splitting''': a batch's [start, end) divides
  *    into `fetchPartitions` contiguous sub-ranges, one socket + one
  *    `PartitionReader` each, records streamed off the wire one at a
  *    time (never buffer the range). At cluster scale each executor
  *    fetches its own slice — the driver never touches payload bytes.
  *  - Logical redelivery stays VISIBLE downstream (at-least-once
  *    producers re-PUB under new offsets): content dedup belongs to the
  *    ingest gates (DedupStore / dedupById), not the transport — the
  *    r14 queue doctrine unchanged.
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft-mq")
  *   .option("port", broker.port).option("topic", "docs")
  *   .option("maxRowsPerTrigger", 1000)
  *   .load()                    // offset LONG, ts TIMESTAMP, value STRING
  * }}}
  * `spark.read.format("graft-mq")` batch-reads the whole log (snapshot
  * at planning). `value` is the raw payload decoded UTF-8 — the same
  * `value` column the spool source emits, so [[QueueIngest.parseDocs]] /
  * [[JsonIngest.parse]] consume either transport unchanged.
  */
class MqSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-mq"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MqSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MqTable(MqSource.Conf(new CaseInsensitiveStringMap(properties)))
}

object MqSource {
  /** offset: dense broker index; ts: broker arrival time (envelope
    * metadata — event time lives inside the payload, as on any queue);
    * value: payload decoded UTF-8.
    */
  val Schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("value", StringType, nullable = false)))

  final case class Conf(host: String, port: Int, topic: String,
                        startingOffsets: String, maxRowsPerTrigger: Long,
                        fetchPartitions: Int) {
    require(port > 0, "graft-mq: 'port' option is required")
    require(topic.nonEmpty, "graft-mq: 'topic' option is required")
    require(startingOffsets == "earliest" || startingOffsets == "latest",
      s"graft-mq: startingOffsets must be earliest|latest, got '$startingOffsets'")
    require(fetchPartitions >= 1, "graft-mq: fetchPartitions must be >= 1")
    def end(): Long = MqBroker.end(host, port, topic)
  }
  object Conf {
    def apply(o: CaseInsensitiveStringMap): Conf = Conf(
      host = o.getOrDefault("host", "127.0.0.1"),
      port = o.getOrDefault("port", "0").toInt,
      topic = o.getOrDefault("topic", ""),
      startingOffsets = o.getOrDefault("startingOffsets", "earliest"),
      maxRowsPerTrigger = o.getOrDefault("maxRowsPerTrigger", "0").toLong,
      fetchPartitions = o.getOrDefault("fetchPartitions", "4").toInt)
  }

  /** Split [from, until) into at most `n` contiguous sub-ranges. */
  def splitRange(from: Long, until: Long, n: Int): Array[MqInputPartition] = {
    val total = math.max(0L, until - from)
    val parts = math.min(n.toLong, math.max(1L, total)).toInt
    Array.tabulate(parts) { i =>
      val s = from + total * i / parts
      val e = from + total * (i + 1) / parts
      MqInputPartition(s, e)
    }.filter(p => p.until > p.from)
  }
}

final class MqTable(conf: MqSource.Conf) extends Table with SupportsRead {
  override def name(): String = s"graft-mq://${conf.host}:${conf.port}/${conf.topic}"
  override def schema(): StructType = MqSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new MqScan(conf)
    }
}

final class MqScan(conf: MqSource.Conf) extends Scan {
  override def readSchema(): StructType = MqSource.Schema
  override def toBatch: Batch = new MqBatch(conf)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MqMicroBatchStream(conf)
}

/** Batch read: whole log snapshot, end taken once at planning. */
final class MqBatch(conf: MqSource.Conf) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    MqSource.splitRange(0L, conf.end(), conf.fetchPartitions)
      .asInstanceOf[Array[InputPartition]]
  override def createReaderFactory(): PartitionReaderFactory =
    MqReaderFactory(conf.host, conf.port, conf.topic)
}

final case class MqOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** Micro-batch stream with row-count admission control. The broker is
  * consulted for exactly one number per trigger (END); all consumption
  * state lives in Spark's checkpoint.
  */
final class MqMicroBatchStream(conf: MqSource.Conf)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset =
    MqOffset(if (conf.startingOffsets == "latest") conf.end() else 0L)

  override def deserializeOffset(json: String): Offset = MqOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit =
    if (conf.maxRowsPerTrigger > 0) ReadLimit.maxRows(conf.maxRowsPerTrigger)
    else ReadLimit.allAvailable()

  override def latestOffset(): Offset = MqOffset(conf.end())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[MqOffset].v
    val end = conf.end()
    limit match {
      case m: ReadMaxRows => MqOffset(math.min(end, s + m.maxRows()))
      case _: ReadAllAvailable => MqOffset(end)
      case _ => MqOffset(end)
    }
  }

  override def reportLatestOffset(): Offset = MqOffset(conf.end())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    MqSource.splitRange(start.asInstanceOf[MqOffset].v,
      end.asInstanceOf[MqOffset].v, conf.fetchPartitions)
      .asInstanceOf[Array[InputPartition]]

  override def createReaderFactory(): PartitionReaderFactory =
    MqReaderFactory(conf.host, conf.port, conf.topic)

  override def commit(end: Offset): Unit = () // checkpoint is the ledger
  override def stop(): Unit = ()
}

final case class MqInputPartition(from: Long, until: Long) extends InputPartition

final case class MqReaderFactory(host: String, port: Int, topic: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MqInputPartition]
    new PartitionReader[InternalRow] {
      private val it = MqBroker.fetch(host, port, topic, p.from, p.until)
      private var row: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) {
          val r = it.next()
          row = new GenericInternalRow(Array[Any](
            r.offset, r.tsMillis * 1000L,
            UTF8String.fromBytes(r.value)))
          true
        } else false
      override def get(): InternalRow = row
      override def close(): Unit = it.close()
    }
  }
}
