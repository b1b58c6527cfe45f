package graft.streaming

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A micro-batch test double for the Kafka tick feed: a DataSourceV2
  * streaming source that emits rows in the EXACT wire shape of Spark's
  * Kafka source (key/value binary, topic, partition, offset, timestamp,
  * timestampType), carrying the reference's JSON tick messages
  * (reference src/feed/TickMessage.hpp:44-54) with a deterministic
  * malformed-record cadence.
  *
  * Purpose: the container has no Kafka broker or connector jar, so
  * `StreamingEtl.kafkaSource` cannot run here. Everything AFTER the
  * broker — wire cast, strict JSON decode, dead-letter split, stateful
  * aggregation — is broker-independent, and this source lets specs drive
  * that entire chain at runtime through `StreamingEtl.fromKafkaWire`, the
  * same function the real Kafka binding uses. It is also a §2.8
  * extensibility exhibit: a full custom MicroBatchStream (offset
  * tracking, partition planning, per-partition readers) against public
  * connector APIs.
  *
  * Options: `totalRows` (default 1000), `rowsPerBatch` (default 250),
  * `numPartitions` (default 4), `malformedEvery` (default 0 = none; N>0
  * corrupts every Nth record, 1-indexed).
  *
  * Determinism: record i's payload is a pure function of i (no RNG
  * state), so any (start, end) replan replays identical data —
  * offset-replay semantics match Kafka's.
  */
class TickWireProvider extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TickWireSource.wireSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TickWireTable(properties)
}

private class TickWireTable(props: util.Map[String, String])
    extends Table with SupportsRead {

  override def name(): String = "tick_wire"
  override def schema(): StructType = TickWireSource.wireSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = TickWireSource.wireSchema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new TickWireStream(
          totalRows = options.getLong("totalRows", 1000L),
          rowsPerBatch = options.getLong("rowsPerBatch", 250L),
          numPartitions = options.getInt("numPartitions", 4),
          malformedEvery = options.getInt("malformedEvery", 0))
      override def toBatch: Batch =
        throw new UnsupportedOperationException("streaming-only source")
    }
}

/** Offset = count of records emitted so far (Kafka's per-partition offsets
  * collapsed to one log position; records are striped round-robin onto
  * partitions at read time).
  */
private[graft] case class TickWireOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[graft] class TickWireStream(
    totalRows: Long, rowsPerBatch: Long, numPartitions: Int,
    malformedEvery: Int) extends MicroBatchStream {

  // Log position up to which batches have been PLANNED. latestOffset must
  // be idempotent — the engine may call it more than once per trigger
  // (behavior differs across Spark versions / Trigger.AvailableNow), and a
  // latestOffset that advances state as a side effect would skip
  // rowsPerBatch rows per extra call. State advances only in
  // planInputPartitions, i.e. only when a batch range is actually handed
  // to the engine — matching Kafka offset semantics.
  private var planned = 0L

  override def initialOffset(): Offset = TickWireOffset(0L)

  override def latestOffset(): Offset =
    TickWireOffset(math.min(planned + rowsPerBatch, totalRows))

  override def deserializeOffset(json: String): Offset =
    TickWireOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TickWireOffset].n
    val e = end.asInstanceOf[TickWireOffset].n
    // max: a recovery replan of an old range must not rewind the log head
    planned = math.max(planned, e)
    (0 until numPartitions).map(p =>
      TickWirePartition(s, e, p, numPartitions, malformedEvery)
        .asInstanceOf[InputPartition]).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    TickWireReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class TickWirePartition(
    start: Long, end: Long, partition: Int, numPartitions: Int,
    malformedEvery: Int) extends InputPartition

private object TickWireReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TickWirePartition]
    new PartitionReader[InternalRow] {
      // this partition reads record indices i in [start, end) with
      // i % numPartitions == partition (round-robin striping)
      private var i = {
        val first = p.start + ((p.partition - p.start % p.numPartitions
          + p.numPartitions) % p.numPartitions)
        first - p.numPartitions
      }
      override def next(): Boolean = { i += p.numPartitions; i < p.end }
      override def get(): InternalRow =
        TickWireSource.wireRow(i, p.partition, p.malformedEvery)
      override def close(): Unit = ()
    }
  }
}

object TickWireSource {

  /** Column-for-column the schema Spark's Kafka source presents. */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Deterministic JSON tick for record index i — same field set as the
    * reference's TickMessage wire format; `malformedEvery` > 0 corrupts
    * every Nth record (1-indexed) to exercise the dead-letter path.
    */
  def tickJson(i: Long, malformedEvery: Int): String = {
    if (malformedEvery > 0 && (i + 1) % malformedEvery == 0)
      s"""{"trade_id": $i, "broken"""
    else {
      val symbols = graft.sources.TradeGenerator.symbols.map(_._1)
      val sym = symbols((i % symbols.size).toInt)
      val price = 100.0 + (i * 37 % 1000) / 100.0
      val volume = 10 + i * 13 % 4990
      val side = if (i % 2 == 0) "B" else "S"
      s"""{"trade_id":${1000000 + i},"order_id":${500000 + i},""" +
        s""""timestamp":${1700000000000000000L + i * 1000000L},""" +
        s""""price":$price,"volume":$volume,"symbol":"$sym",""" +
        s""""exchange":"WSS","side":"$side","type":"M","is_pro":false}"""
    }
  }

  private[streaming] def wireRow(
      i: Long, partition: Int, malformedEvery: Int): InternalRow = {
    val value = tickJson(i, malformedEvery).getBytes("UTF-8")
    InternalRow(
      null, // key: the tick feed is unkeyed, like the reference's WSS
      value,
      UTF8String.fromString("ticks"),
      partition,
      i,
      1700000000000000L + i * 1000L, // micros
      0)
  }
}
