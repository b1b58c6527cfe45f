package graft

import graft.streaming.{StreamingEtl, TickWireProvider, TickWireSource}
import org.apache.spark.sql.functions._

/** Drives the Kafka-shaped pipeline end-to-end at runtime with the
  * TickWireSource micro-batch test double: wire rows -> fromKafkaWire ->
  * strict decode + dead-letter split -> stateful per-symbol counts. This is
  * the S2 chain minus only the broker socket (no Kafka in the container);
  * the decode path is byte-level identical to what the broker binding
  * feeds it.
  */
class TickWireSpec extends SparkSpec {

  private def wireStream(total: Long, malformedEvery: Int) =
    spark.readStream
      .format(classOf[TickWireProvider].getName)
      .option("totalRows", total.toString)
      .option("rowsPerBatch", "100")
      .option("numPartitions", "4")
      .option("malformedEvery", malformedEvery.toString)
      .load()

  test("wire schema matches the Kafka source column-for-column") {
    val df = wireStream(10, 0)
    assert(df.schema == TickWireSource.wireSchema)
    assert(df.isStreaming)
  }

  test("decode + dead-letter over the wire: counts are exact") {
    val total = 600L
    val every = 10
    val lines = StreamingEtl.fromKafkaWire(wireStream(total, every))
    val good = StreamingEtl.decode(lines)
      .writeStream.format("memory").queryName("tw_good").start()
    val bad = StreamingEtl.decodeFailures(lines)
      .writeStream.format("memory").queryName("tw_bad").start()
    try {
      good.processAllAvailable()
      bad.processAllAvailable()
      val nBad = spark.table("tw_bad").count()
      val nGood = spark.table("tw_good").count()
      assert(nBad == total / every, s"dead-letter $nBad")
      assert(nGood == total - total / every, s"decoded $nGood")
      // decoded rows carry real field values, not nulls
      val row = spark.table("tw_good").orderBy("trade_id").limit(1)
        .select("trade_id", "symbol", "price").collect()(0)
      assert(row.getLong(0) == 1000000L)
      assert(row.getString(1).nonEmpty)
      assert(row.getDouble(2) > 0)
    } finally { good.stop(); bad.stop() }
  }

  test("stateful per-symbol counts across micro-batches sum to the feed") {
    val total = 400L
    val counts = StreamingEtl.perSymbolCounts(
      StreamingEtl.sanityFilter(
        StreamingEtl.decode(
          StreamingEtl.fromKafkaWire(wireStream(total, 0)))))
      .writeStream.format("memory").queryName("tw_counts")
      .outputMode("complete").start()
    try {
      counts.processAllAvailable()
      val out = spark.table("tw_counts")
      val totalTicks = out.agg(sum("n_ticks")).collect()(0).getLong(0)
      assert(totalTicks == total)
      val nSyms = out.count()
      assert(nSyms == graft.sources.TradeGenerator.symbols.size,
        s"expected every symbol represented, got $nSyms")
    } finally { counts.stop() }
  }

  test("latestOffset is idempotent until a batch is planned") {
    // the engine may call latestOffset more than once per trigger
    // (Trigger.AvailableNow / version differences); repeated calls must
    // not skip rows — the log head advances only in planInputPartitions
    val s = new graft.streaming.TickWireStream(
      totalRows = 100L, rowsPerBatch = 25L, numPartitions = 2,
      malformedEvery = 0)
    val o1 = s.latestOffset()
    val o2 = s.latestOffset()
    assert(o1.json() == "25" && o2.json() == "25")
    s.planInputPartitions(s.initialOffset(), o2)
    assert(s.latestOffset().json() == "50")
    // a recovery replan of an already-planned range must not rewind
    s.planInputPartitions(s.initialOffset(), graft.streaming.TickWireOffset(25L))
    assert(s.latestOffset().json() == "50")
  }

  test("offset replay is deterministic: same index -> same bytes") {
    val a = TickWireSource.tickJson(123L, 10)
    val b = TickWireSource.tickJson(123L, 10)
    assert(a == b)
    // partition striping covers every index exactly once per batch window
    val seen = (0 until 4).flatMap { p =>
      (0L until 200L).filter(_ % 4 == p)
    }.sorted
    assert(seen == (0L until 200L).toList)
  }
}
