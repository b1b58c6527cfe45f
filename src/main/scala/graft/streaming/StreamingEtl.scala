package graft.streaming

import graft.model.Trade
import graft.operators.{TradeRules, Validation}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's 3-thread streaming dataflow (tick server -> WebSocket ->
  * SPSC queue -> consumer, reference src/tools/websocket_demo.cpp:11-39)
  * re-expressed as Structured Streaming transforms. The queue/thread/
  * memory-ordering machinery is the micro-batch engine's job and is
  * deliberately not ported (SURVEY.md §1.5).
  *
  * These are source-agnostic DataFrame -> DataFrame stages: bind them to
  * `spark.readStream.format("kafka"|"socket"|"rate")` in production or to a
  * MemoryStream in tests. Each stage works identically on batch frames —
  * the Structured Streaming unification the reference lacks.
  */
object StreamingEtl {

  /** Kafka tick source — the production binding of the reference's
    * WebSocket feed (SURVEY.md §2.1 S2): one topic of JSON tick payloads.
    * Requires the spark-sql-kafka connector on the runtime classpath (not
    * shipped in this build environment; the binding compiles because the
    * format is resolved at runtime). Pair with `decode(...)`.
    *
    * At-least-once by default; exactly-once end-to-end needs checkpointing
    * plus an idempotent sink — vs the reference's at-most-once delivery
    * (drops on parse error, no replay; SURVEY.md §2.7).
    */
  def kafkaSource(
      spark: org.apache.spark.sql.SparkSession,
      bootstrapServers: String,
      topic: String,
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
    maxOffsetsPerTrigger.foreach(m =>
      r.option("maxOffsetsPerTrigger", m.toString))
    fromKafkaWire(r.load())
  }

  /** Kafka wire shape -> JSON lines: the step shared by the real broker
    * binding above and the broker-free TickWireSource test double, so specs
    * exercise the exact post-broker chain (wire cast -> decode ->
    * dead-letter) the production source runs.
    */
  def fromKafkaWire(wire: DataFrame): DataFrame =
    wire.selectExpr("CAST(value AS STRING) AS value")

  /** Rate-source test feed approximating the reference tick server's
    * ~5K ticks/sec synthetic stream (reference src/feed/TickServer.hpp:
    * 200-242): deterministic symbols, jittered prices, ns timestamps.
    */
  def rateSource(
      spark: org.apache.spark.sql.SparkSession,
      rowsPerSecond: Int = 5000): DataFrame = {
    import org.apache.spark.sql.functions._
    val symbols = graft.sources.TradeGenerator.symbols.map(_._1)
    val symArr = array(symbols.map(lit): _*)
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
      .select(
        (col("value") + 1000000L).as("trade_id"),
        (col("value") + 500000L).as("order_id"),
        (unix_micros(col("timestamp")) * 1000L).as("timestamp"),
        (lit(100.0) + pmod(xxhash64(col("value")), lit(1000L)) / 100.0).as("price"),
        (pmod(xxhash64(col("value"), lit(1)), lit(4990L)) + 10).cast("int").as("volume"),
        element_at(symArr, (pmod(xxhash64(col("value"), lit(2)), lit(symbols.size.toLong)) + 1).cast("int")).as("symbol"),
        lit("WSS").as("exchange"),
        when(pmod(xxhash64(col("value"), lit(3)), lit(2L)) === 0, "B").otherwise("S").as("side"),
        lit("M").as("type"),
        lit(false).as("is_pro"))
  }

  /** JSON wire schema of a tick (reference src/feed/TickMessage.hpp:44-54):
    * same 9 fields as the CSV wire format plus `exchange`, with side/type as
    * 1-char strings.
    */
  val tickSchema = Trade.schema

  /** Decode a stream of JSON tick strings (column `value`) into trade rows.
    * Malformed JSON yields a null-fielded struct (PERMISSIVE from_json
    * semantics) — rows without a trade_id are the dead-letter side, exactly
    * the reference's strict decode that counts parse errors and drops the
    * tick (reference src/feed/TickClient.hpp:224-231, TickMessage.hpp:120-142
    * treats a missing field as failure).
    */
  def decode(jsonLines: DataFrame): DataFrame =
    jsonLines
      .withColumn("t", from_json(col("value"), tickSchema))
      .filter(col("t.trade_id").isNotNull)
      .select(col("t.*"))

  /** Rows that failed JSON decode (dead-letter side of `decode`):
    * unparseable JSON or a tick missing its trade_id.
    */
  def decodeFailures(jsonLines: DataFrame): DataFrame =
    jsonLines.filter(
      from_json(col("value"), tickSchema).getField("trade_id").isNull)

  /** Serialize trades back to the JSON wire format (reference
    * TickMessage.hpp:87-100) — for sinks that speak the tick protocol.
    */
  def encode(trades: DataFrame): DataFrame =
    trades.select(to_json(struct(trades.columns.map(col): _*)).as("value"))

  /** The consumer's hot-path sanity filter (price>0 && volume>0, reference
    * websocket_demo.cpp:108-120) — a subset of the full rule catalog; use
    * `validate` for the complete contract.
    */
  def sanityFilter(trades: DataFrame): DataFrame =
    trades.filter(col("price") > 0 && col("volume") > 0)

  /** Full ordered-rule validation on the stream (same catalog as batch). */
  def validate(trades: DataFrame): Validation.Split =
    Validation.split(trades, TradeRules.rules)

  /** Per-symbol running counts — the consumer's unbounded keyed state
    * (reference websocket_demo.cpp:73-125) as a streaming aggregation
    * (state store replaces the hash map; output mode complete/update).
    */
  def perSymbolCounts(trades: DataFrame): DataFrame =
    trades.groupBy(col("symbol")).agg(
      count(lit(1)).as("n_ticks"),
      sum(col("volume")).as("total_volume"))

  /** Streaming per-symbol indicators with CUSTOM KEYED STATE
    * (flatMapGroupsWithState): each symbol's state is the same bounded
    * buffer the batch single-pass Aggregator uses — running VWAP sums plus
    * the last (period+1) rows by (ts, trade_id) — updated per micro-batch
    * and emitting one refreshed indicator row per symbol per trigger.
    *
    * This is the exact semantics of the reference's stream consumer
    * (unbounded per-symbol hash map, reference
    * src/tools/websocket_demo.cpp:73-125) upgraded to indicator state with
    * bounded memory: state size is O(period) per symbol regardless of
    * stream length, checkpointable by the state store.
    */
  def statefulIndicators(
      trades: DataFrame,
      period: Int = 14): org.apache.spark.sql.Dataset[
        graft.operators.IndicatorAggregator.KeyedOut] = {
    import graft.operators.IndicatorAggregator.{Buf, KeyedOut, Point, mergePoint, finishBuf, emptyBuf}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = trades.sparkSession
    import spark.implicits._
    val pts = trades.select(
      col("symbol").as("key"),
      col("timestamp").cast("long").as("ts"),
      col("trade_id").cast("long").as("id"),
      col("price").cast("double").as("price"),
      col("volume").cast("double").as("volume")).as[Point]
    pts.groupByKey(_.key)
      .flatMapGroupsWithState[Buf, KeyedOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Point], state: GroupState[Buf]) =>
          var buf = state.getOption.getOrElse(emptyBuf)
          rows.foreach(p => buf = mergePoint(buf, p, period))
          state.update(buf)
          val o = finishBuf(buf, period)
          Iterator.single(KeyedOut(key, o.sma, o.rsi, o.vwap, o.period, o.n_rows))
      }
  }

  /** [[statefulIndicators]]' state machine re-expressed on Spark 4's
    * `transformWithState` (StatefulProcessor + typed ValueState) — the
    * successor API to flatMapGroupsWithState: state is named and typed
    * per variable (schema-evolvable), timers are first-class, and the
    * runtime REQUIRES the RocksDB state-store provider (callers set it;
    * the q154 gate wraps the conf). Semantics are identical by
    * construction — both paths fold the same
    * IndicatorAggregator.mergePoint/finishBuf algebra — and the q154
    * gate pins the output against q55's verbatim oracle, so the engine
    * carries the old and new state APIs with one proven semantics.
    */
  def statefulIndicatorsTws(
      trades: DataFrame,
      period: Int = 14): org.apache.spark.sql.Dataset[
        graft.operators.IndicatorAggregator.KeyedOut] = {
    import graft.operators.IndicatorAggregator.{KeyedOut, Point}
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = trades.sparkSession
    import spark.implicits._
    val pts = trades.select(
      col("symbol").as("key"),
      col("timestamp").cast("long").as("ts"),
      col("trade_id").cast("long").as("id"),
      col("price").cast("double").as("price"),
      col("volume").cast("double").as("volume")).as[Point]
    pts.groupByKey(_.key)
      .transformWithState(
        new IndicatorProcessor(period), TimeMode.None(), OutputMode.Update())
  }

  /** The [[statefulIndicatorsTws]] processor: one typed ValueState holds
    * the same bounded Buf the batch Aggregator and the
    * flatMapGroupsWithState path fold.
    */
  private class IndicatorProcessor(period: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String,
        graft.operators.IndicatorAggregator.Point,
        graft.operators.IndicatorAggregator.KeyedOut] {
    import graft.operators.IndicatorAggregator.{Buf, KeyedOut, Point, emptyBuf, finishBuf, mergePoint}
    @transient private var buf: org.apache.spark.sql.streaming.ValueState[Buf] = _
    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      buf = getHandle.getValueState[Buf](
        "buf",
        org.apache.spark.sql.Encoders.product[Buf],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(
        key: String,
        rows: Iterator[Point],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[KeyedOut] = {
      var b = if (buf.exists()) buf.get() else emptyBuf
      rows.foreach(p => b = mergePoint(b, p, period))
      buf.update(b)
      val o = finishBuf(b, period)
      Iterator.single(KeyedOut(key, o.sma, o.rsi, o.vwap, o.period, o.n_rows))
    }
  }

  /** Keyed streaming sessionization — the stateful form of
    * operators.Sessionize.stats, built on the ORDER-INVARIANT interval
    * algebra (Sessionize.SessionIntervals): each arriving timestamp
    * merges into the key's disjoint session intervals, and a late event
    * that lands between two intervals within `gap` of both MERGES them —
    * the correction a lag()-style running counter can never make, and
    * what lets q92 replay events in arbitrary batch order and still
    * match the batch oracle exactly. State is O(sessions) per key.
    */
  def statefulSessions(
      events: DataFrame,
      gap: Long): org.apache.spark.sql.Dataset[
        graft.operators.Sessionize.SessionSnapshot] = {
    import graft.operators.Sessionize.{mergeTs, SessionIntervals, SessionSnapshot}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val rows = events.select(
      col("user_id").cast("long").as("_1"),
      col("ts").cast("long").as("_2")).as[(Long, Long)]
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[SessionIntervals, SessionSnapshot](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[(Long, Long)],
            state: GroupState[SessionIntervals]) =>
          var s = state.getOption.getOrElse(
            SessionIntervals(Vector.empty, Vector.empty, 0L))
          it.foreach { case (_, ts) => s = mergeTs(s, ts, gap) }
          state.update(s)
          Iterator.single(
            SessionSnapshot(key, s.starts.length.toLong, s.nEvents))
      }
  }

  /** [[statefulSessions]] re-expressed on `transformWithState` — the
    * third semantics carried on the successor state API (q154
    * indicators, q157 TTL dedup): the SAME order-invariant interval
    * algebra (Sessionize.mergeTs), its state now a named typed
    * ValueState. The q160 gate replays it against q17's verbatim batch
    * oracle, RocksDB-pinned like every TWS gate.
    */
  def statefulSessionsTws(
      events: DataFrame,
      gap: Long): org.apache.spark.sql.Dataset[
        graft.operators.Sessionize.SessionSnapshot] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(
        col("user_id").cast("long").as("_1"),
        col("ts").cast("long").as("_2")).as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(
        new SessionProcessor(gap), TimeMode.None(), OutputMode.Update())
  }

  /** The [[statefulSessionsTws]] processor: one typed ValueState holds
    * the key's disjoint session intervals (the q92 state, renamed onto
    * the new API).
    */
  private class SessionProcessor(gap: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), graft.operators.Sessionize.SessionSnapshot] {
    import graft.operators.Sessionize.{mergeTs, SessionIntervals, SessionSnapshot}
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[SessionIntervals] = _
    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[SessionIntervals](
        "sessions",
        org.apache.spark.sql.Encoders.product[SessionIntervals],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SessionSnapshot] = {
      var s = if (state.exists()) state.get()
        else SessionIntervals(Vector.empty, Vector.empty, 0L)
      rows.foreach { case (_, ts) => s = mergeTs(s, ts, gap) }
      state.update(s)
      Iterator.single(SessionSnapshot(key, s.starts.length.toLong, s.nEvents))
    }
  }

  /** Streaming deduplication on business keys, state bounded by the
    * watermark: a duplicate arriving within `watermarkDelay` of the first
    * occurrence's event time is dropped; dedup state is evicted once the
    * watermark passes it, so state size tracks the horizon's key cardinality
    * instead of the stream's full history — the property that makes
    * streaming ingest dedup viable at 100 TB/day (an unbounded
    * dropDuplicates would OOM on state). The batch analogues for full-
    * history dedup are in operators.Dedup.
    *
    * `eventTimeCol` must be a timestamp column; pass the ns-long wire
    * `timestamp` through [[toEventTime]] first.
    */
  def dedupStream(
      df: DataFrame,
      eventTimeCol: String,
      watermarkDelay: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** ns-since-epoch long -> µs-precision event-time timestamp column.
    * Decimal arithmetic keeps the division exact where a double divide
    * would round: ns epochs (~1.7e18) exceed 2^53, so `/ 1000` through
    * DoubleType can land on the wrong microsecond.
    */
  def toEventTime(nsCol: Column): Column =
    timestamp_micros((nsCol.cast("decimal(38,0)") / lit(1000)).cast("long"))

  /** Event-time windowed counts under a watermark — the bounded-state
    * form of windowed aggregation on an unbounded stream: rows later than
    * `delay` behind the max observed event time are DROPPED (their
    * window's state is already finalized and evicted), rows within the
    * delay merge into still-open windows, and in append output mode each
    * window emits exactly once, when the watermark passes its end. That
    * drop/merge/evict contract is what keeps state O(open windows)
    * forever — without the watermark a 100 TB-scale stream accretes every
    * window it has ever seen.
    *
    * All aggregates are exact integers, so the q116 parity gate can check
    * the emitted relation against a batch oracle that applies the same
    * retention predicate (window end vs final watermark) in SQL.
    * `nsTsCol` is a ns-epoch long (the events wire format); event time is
    * µs-anchored via [[toEventTime]] (the F7 presentation bound).
    */
  def watermarkedWindowCounts(
      df: DataFrame,
      keyCol: String,
      nsTsCol: String,
      idCol: String,
      sumCol: String,
      delay: String = "2 hours",
      windowLen: String = "1 hour"): DataFrame =
    df.withColumn("event_time", toEventTime(col(nsTsCol)))
      .withWatermark("event_time", delay)
      .groupBy(col(keyCol), window(col("event_time"), windowLen))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(idCol)).as("id_sum"),
        sum(col(sumCol)).as("user_sum"))

  /** Watermark-BOUNDED streaming dedup — the production form of the
    * unbounded `dropDuplicates` the q111 gate drives. Plain
    * dropDuplicates keeps every key it has ever seen (state grows with
    * the stream — fine for a replay, fatal for an unbounded feed);
    * `dropDuplicatesWithinWatermark` evicts a key's state once the
    * watermark passes its event time plus `delay`, so state is bounded
    * by the delay window's key density. The semantic contract that
    * eviction buys: duplicates are suppressed when they arrive within
    * the watermark delay of the first copy, and rows BEHIND the
    * watermark (first copies included) are dropped as late — exactly
    * the at-least-once-redelivery window an upstream broker guarantees.
    * `nsTsCol` is the engine's ns-epoch long; event time is µs-anchored
    * via [[toEventTime]] (the F7 bound).
    */
  def dedupWithinWatermark(
      df: DataFrame,
      keyCols: Seq[String],
      nsTsCol: String,
      delay: String): DataFrame = {
    require(keyCols.nonEmpty, "dedup needs at least one key column")
    df.withColumn("event_time", toEventTime(col(nsTsCol)))
      .withWatermark("event_time", delay)
      .dropDuplicatesWithinWatermark(keyCols)
  }

  /** [[dedupWithinWatermark]] re-expressed on Spark 4's
    * `transformWithState` — the successor-API twin the way
    * [[statefulIndicatorsTws]] twins [[statefulIndicators]], now for an
    * EVICTION-bearing semantics: where the indicator state machine only
    * accretes, this one must also expire state, which TWS models with
    * first-class EVENT-TIME TIMERS instead of the fixed operator
    * built into `dropDuplicatesWithinWatermark`. The contract is
    * pinned identical (q157 runs against q153's verbatim oracle):
    *
    *   - a row behind the watermark drops as late (first copies
    *     included) — checked in the processor against the batch
    *     watermark, the same rule the built-in exec applies;
    *   - the first surviving copy of a key emits and registers a timer
    *     at its event time + `delay`;
    *   - further copies suppress while the key's state lives;
    *   - the timer fires once the watermark passes it and CLEARS the
    *     key's state — state is bounded by the delay window's key
    *     density, exactly the built-in's eviction bound (spec-measured,
    *     the q153 3->1 discipline).
    *
    * Runs on any key-column types (the group key is the key columns'
    * string rendering — null renders as "null", distinct from the
    * string "null" only if callers avoid that collision; the built-in
    * has the same physical-key flattening). RocksDB provider required
    * (the TWS contract; gates wrap the conf).
    */
  def dedupWithinWatermarkTws(
      df: DataFrame,
      keyCols: Seq[String],
      nsTsCol: String,
      delay: String): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import org.apache.spark.sql.{Encoders, Row}
    require(keyCols.nonEmpty, "dedup needs at least one key column")
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(delay))
    require(iv.months == 0,
      s"dedup delay must be a fixed duration, got '$delay' (months vary)")
    val delayMs = iv.days * 86400000L + iv.microseconds / 1000L
    val withTime = df.withColumn("event_time", toEventTime(col(nsTsCol)))
      .withWatermark("event_time", delay)
    val schema = withTime.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(schema)
    withTime.as(rowEnc)
      .groupByKey(r => keyIdx.map(i => String.valueOf(r.get(i)))
        .mkString("\u001f"))(Encoders.STRING)
      .transformWithState(
        new DedupTtlProcessor(schema.fieldIndex("event_time"), delayMs),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }

  /** The [[dedupWithinWatermarkTws]] processor: one Long ValueState per
    * key (the first copy's expiry instant) plus one event-time timer
    * that clears it. TTLConfig.NONE because TTL there is PROCESSING-
    * time — the event-time-faithful bound is the timer.
    */
  private class DedupTtlProcessor(eventTimeIdx: Int, delayMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, org.apache.spark.sql.Row, org.apache.spark.sql.Row] {
    @transient private var seen:
      org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      seen = getHandle.getValueState[Long](
        "seen",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(
        key: String,
        rows: Iterator[org.apache.spark.sql.Row],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[org.apache.spark.sql.Row] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      rows.filter { r =>
        val tMs = r.getAs[java.sql.Timestamp](eventTimeIdx).getTime
        if (tMs < wm) false // late: behind the watermark, first copy or not
        else if (seen.exists()) false // duplicate within the live window
        else {
          val expiry = tMs + delayMs
          seen.update(expiry)
          getHandle.registerTimer(expiry)
          true
        }
      }
    }
    override def handleExpiredTimer(
        key: String,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[org.apache.spark.sql.Row] = {
      seen.clear()
      Iterator.empty
    }
  }

  /** Stream-stream interval join: left row L matches right row R iff
    * R.eventTime ∈ [L.eventTime + lower, L.eventTime + upper) — the
    * streaming analogue of operators.RangeJoin (purchases joined to the
    * clicks that follow them, while both sides are still flowing).
    *
    * Both sides carry watermarks and the join condition ranges over the
    * event-time columns themselves; Spark derives from (watermark, interval
    * bound) exactly how long each side's rows must be retained in the join
    * state store and evicts behind the watermark — bounded state on an
    * unbounded join, which is what makes this viable at feed scale. Offsets
    * are microseconds (timestamp precision).
    *
    * Column names must be disjoint (same contract as RangeJoin).
    */
  /** @param joinType "inner" (default), "left_outer", or "full_outer".
    *   Left-outer: an unmatched left row emits with null right columns
    *   once the watermark evicts its join state — the eviction-driven
    *   half of the stream-stream contract. NOTE the bucketization
    *   explodes each left row to ≤ 2 bucket copies, so LEFT-outer output
    *   is exact only up to per-copy null rows: a copy unmatched in ITS
    *   bucket emits a null row even when the twin copy matched.
    *   Aggregations that count/min the RIGHT side ignore null rows, so
    *   every grouped consumer (q118's shape) sees exactly the logical
    *   left-outer relation; consumers needing raw outer rows must
    *   post-group by the left key (keep nulls only for keys with no
    *   match anywhere). Full-outer adds the RIGHT-null rows — and those
    *   are EXACT without grouping: the right side carries a single
    *   bucket per row (no explosion), so a right row emits its null row
    *   iff it truly matched nothing (the q148 gate checks both arms).
    */
  def streamIntervalJoin(
      left: DataFrame,
      leftTsCol: String,
      right: DataFrame,
      rightTsCol: String,
      lowerMicros: Long,
      upperMicros: Long,
      watermarkDelay: String,
      joinType: String = "inner"): DataFrame = {
    require(upperMicros > lowerMicros, "empty window")
    require(
      joinType == "inner" || joinType == "left_outer" ||
        joinType == "full_outer",
      s"unsupported join type $joinType")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left/right column names must be disjoint (rename before joining)")
    // Spark rejects stream-stream joins without an equality predicate (the
    // state store is keyed by it) — same bucketization as the batch
    // RangeJoin: quantize event time into window-width buckets, explode the
    // left row to the <= 2 buckets its window overlaps, join on bucket
    // equality plus the exact interval condition over the event-time
    // columns (which is also what lets Spark compute state eviction bounds
    // from the watermark).
    val width = upperMicros - lowerMicros
    def bucketOf(us: Column) =
      ((us - pmod(us, lit(width))).cast("decimal(38,0)") / lit(width))
        .cast("bigint")
    val l = left.withWatermark(leftTsCol, watermarkDelay)
      .withColumn("__b0", bucketOf(unix_micros(col(leftTsCol)) + lowerMicros))
      .withColumn("__b1", bucketOf(unix_micros(col(leftTsCol)) + upperMicros - 1))
      .withColumn("__lb", explode(array_distinct(array(col("__b0"), col("__b1")))))
      .drop("__b0", "__b1")
    val r = right.withWatermark(rightTsCol, watermarkDelay)
      .withColumn("__rb", bucketOf(unix_micros(col(rightTsCol))))
    l.join(r, expr(
      s"__lb = __rb AND " +
        s"$rightTsCol >= $leftTsCol + INTERVAL $lowerMicros MICROSECOND AND " +
        s"$rightTsCol < $leftTsCol + INTERVAL $upperMicros MICROSECOND"),
      joinType)
      .drop("__lb", "__rb")
  }

  /** Event-time windowed per-symbol OHLC + VWAP with a watermark — the
    * north-star streaming indicator surface (SURVEY.md §2.7): the reference
    * has no event-time reasoning; Spark gives it natively. `timestamp` is ns
    * since epoch -> converted to µs-precision event time for the window.
    */
  def windowedStats(
      trades: DataFrame,
      windowDur: String = "1 minute",
      watermarkDelay: String = "30 seconds"): DataFrame =
    trades
      .withColumn("event_time", toEventTime(col("timestamp")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowDur), col("symbol"))
      .agg(
        min_by(col("price"), col("timestamp")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("timestamp")).as("close"),
        (sum(col("price") * col("volume")) / sum(col("volume"))).as("vwap"),
        sum(col("volume")).as("volume"),
        count(lit(1)).as("n_ticks"))

  /** One tick routed to its (symbol, event-time window) candle — the
    * [[statefulOhlcTws]] input row. `tsNs` keeps the RAW ns timestamp:
    * open/close selection orders by (tsNs, id), exactly the tuple the
    * native [[graft.functions.OhlcAggExpr]] orders by in
    * [[windowedOhlc]] and the batch [[graft.operators.Ohlc.bars]].
    */
  final case class OhlcPoint(
      symbol: String, tsNs: Long, id: Long, price: Double, volume: Long,
      winStart: Long)

  /** The candle buffer persisted per (symbol, window) key: the nine
    * primitives of [[graft.functions.OhlcAggExpr.Buf]] plus the volume
    * sum — the same 72-byte state the native aggregate ships between
    * map and reduce, here living in the state store across batches.
    */
  final case class OhlcTwsState(
      n: Long, oo1: Long, oo2: Long, open: Double,
      co1: Long, co2: Long, close: Double, high: Double, low: Double,
      volume: Long)

  final case class OhlcTwsSnapshot(
      symbol: String, window_start_us: Long,
      open: Double, high: Double, low: Double, close: Double,
      volume: Long, n_ticks: Long)

  /** [[windowedOhlc]]'s candle algebra as CUSTOM KEYED STATE on Spark
    * 4's `transformWithState` — the FOURTH semantics carried on the
    * successor state API (q154 indicators, q157 TTL dedup, q160
    * sessions, now OHLC): the key is (symbol, window start), the state
    * is literally [[graft.functions.OhlcAggExpr.Buf]] reconstructed
    * per batch — batch aggregation, built-in streaming aggregation,
    * and TWS all fold ONE candle algebra, so a divergence anywhere is
    * a bug by definition (the q164 gate pins this replay against q80's
    * verbatim batch oracle, RocksDB-pinned like every TWS gate).
    * Open/close order by the unique (ts, trade_id) tuple; prices are
    * raw row values; volume sums longs — every output exact.
    *
    * Window start is µs-anchored (the [[toEventTime]] F7 bound):
    * floor(ts/1000 / windowUs) · windowUs, identical to
    * `window(event_time, dur)` on the µs event time. No watermark by
    * default (the replay contract — late rows must not drop); bound
    * production state by composing a watermark upstream and a timer
    * eviction, or use [[windowedOhlc]] where the built-in operator's
    * eviction suffices.
    */
  def statefulOhlcTws(
      trades: DataFrame,
      windowUs: Long = 3600000000L): org.apache.spark.sql.Dataset[OhlcTwsSnapshot] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    require(windowUs > 0, s"window must be positive, got $windowUs µs")
    val spark = trades.sparkSession
    import spark.implicits._
    val us = (col("timestamp").cast("decimal(38,0)") / lit(1000)).cast("long")
    trades.select(
        col("symbol"),
        col("timestamp").cast("long").as("tsNs"),
        col("trade_id").cast("long").as("id"),
        col("price").cast("double").as("price"),
        col("volume").cast("long").as("volume"),
        (us - pmod(us, lit(windowUs))).as("winStart")).as[OhlcPoint]
      .groupByKey(p => (p.symbol, p.winStart))
      .transformWithState(
        new OhlcProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** The [[statefulOhlcTws]] processor: one typed ValueState holds the
    * candle buffer; each batch folds through the SAME Buf.observe the
    * native aggregate runs.
    */
  private class OhlcProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        (String, Long), OhlcPoint, OhlcTwsSnapshot] {
    @transient private var bar:
      org.apache.spark.sql.streaming.ValueState[OhlcTwsState] = _
    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      bar = getHandle.getValueState[OhlcTwsState](
        "bar",
        org.apache.spark.sql.Encoders.product[OhlcTwsState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(
        key: (String, Long),
        rows: Iterator[OhlcPoint],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[OhlcTwsSnapshot] = {
      val b = new graft.functions.OhlcAggExpr.Buf()
      var vol = 0L
      if (bar.exists()) {
        val st = bar.get()
        b.n = st.n
        b.openOrd1 = st.oo1; b.openOrd2 = st.oo2; b.open = st.open
        b.closeOrd1 = st.co1; b.closeOrd2 = st.co2; b.close = st.close
        b.high = st.high; b.low = st.low
        vol = st.volume
      }
      rows.foreach { p => b.observe(p.tsNs, p.id, p.price); vol += p.volume }
      bar.update(OhlcTwsState(
        b.n, b.openOrd1, b.openOrd2, b.open,
        b.closeOrd1, b.closeOrd2, b.close, b.high, b.low, vol))
      Iterator.single(OhlcTwsSnapshot(
        key._1, key._2, b.open, b.high, b.low, b.close, vol, b.n))
    }
  }

  /** [[statefulOhlcTws]]'s input row carrying the WATERMARKED event-time
    * column (the watermark must survive into the typed stream, so the
    * projection keeps it — the q157 Row-retention rule).
    */
  final case class OhlcWmPoint(
      symbol: String, tsNs: Long, id: Long, price: Double, volume: Long,
      winStart: Long, event_time: java.sql.Timestamp)

  /** PRODUCTION-BOUNDED candles on `transformWithState`: the
    * [[statefulOhlcTws]] algebra under a WATERMARK, with first-class
    * EVENT-TIME TIMERS doing what the built-in windowed aggregation's
    * eviction does in [[windowedOhlc]] — each (symbol, window) candle
    * emits EXACTLY ONCE, when the watermark passes its window end, and
    * its state clears (append output mode). This is the second
    * timer-driven eviction semantics on the successor API (q157's TTL
    * dedup evicts per KEY; this finalizes per WINDOW) and the bounded
    * form the [[statefulOhlcTws]] scaladoc defers to:
    *
    *   - a row behind the current watermark drops as late (the
    *     built-in exec's rule, checked per batch) — in particular a
    *     row for an already-finalized window can never reopen it
    *     (its window end is <= the watermark by construction);
    *   - the first row of a (symbol, window) key creates the candle
    *     buffer and registers ONE timer at the window end (ms-floored
    *     — timers are ms-granular; a sub-ms window boundary row can
    *     fire a timer up to 1 ms early, irrelevant at any real window
    *     size);
    *   - the timer fires once the watermark passes it: the candle
    *     emits and the key's state clears — state is O(open windows),
    *     the [[watermarkedWindowCounts]] bound, carried by explicit
    *     timers instead of the built-in operator.
    *
    * The q165 gate drives it with q116's sentinel phase design (late
    * drops, accepted late duplicates, watermark-advancing sentinels)
    * against a batch oracle applying the same retention in SQL.
    * RocksDB provider required (the TWS contract; gates wrap it).
    */
  def statefulOhlcTwsFinalize(
      trades: DataFrame,
      windowUs: Long = 3600000000L,
      watermarkDelay: String = "2 hours"): org.apache.spark.sql.Dataset[OhlcTwsSnapshot] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    require(windowUs > 0, s"window must be positive, got $windowUs µs")
    val spark = trades.sparkSession
    import spark.implicits._
    val us = (col("timestamp").cast("decimal(38,0)") / lit(1000)).cast("long")
    trades
      .withColumn("event_time", toEventTime(col("timestamp")))
      .withWatermark("event_time", watermarkDelay)
      .select(
        col("symbol"),
        col("timestamp").cast("long").as("tsNs"),
        col("trade_id").cast("long").as("id"),
        col("price").cast("double").as("price"),
        col("volume").cast("long").as("volume"),
        (us - pmod(us, lit(windowUs))).as("winStart"),
        col("event_time")).as[OhlcWmPoint]
      .groupByKey(p => (p.symbol, p.winStart))
      .transformWithState(
        new OhlcFinalizeProcessor(windowUs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The [[statefulOhlcTwsFinalize]] processor: candle buffer in a
    * typed ValueState, one event-time timer per open window; emission
    * happens ONLY in the timer handler (append semantics).
    */
  private class OhlcFinalizeProcessor(windowUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        (String, Long), OhlcWmPoint, OhlcTwsSnapshot] {
    @transient private var bar:
      org.apache.spark.sql.streaming.ValueState[OhlcTwsState] = _
    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      bar = getHandle.getValueState[OhlcTwsState](
        "bar",
        org.apache.spark.sql.Encoders.product[OhlcTwsState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(
        key: (String, Long),
        rows: Iterator[OhlcWmPoint],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[OhlcTwsSnapshot] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val live = rows.filter(_.event_time.getTime >= wm) // late rows drop
      if (live.isEmpty) return Iterator.empty
      val b = new graft.functions.OhlcAggExpr.Buf()
      var vol = 0L
      val existed = bar.exists()
      if (existed) {
        val st = bar.get()
        b.n = st.n
        b.openOrd1 = st.oo1; b.openOrd2 = st.oo2; b.open = st.open
        b.closeOrd1 = st.co1; b.closeOrd2 = st.co2; b.close = st.close
        b.high = st.high; b.low = st.low
        vol = st.volume
      }
      live.foreach { p => b.observe(p.tsNs, p.id, p.price); vol += p.volume }
      bar.update(OhlcTwsState(
        b.n, b.openOrd1, b.openOrd2, b.open,
        b.closeOrd1, b.closeOrd2, b.close, b.high, b.low, vol))
      // first life of this window's state: arm its finalize timer at the
      // window end — µs -> ms CEILING, never floor: a floored timer on a
      // non-ms-multiple window fires before the window truly ends, and a
      // row in the last sub-ms sliver (event_time_ms == watermark) would
      // pass the late filter after the state cleared, recreating the key
      // and emitting a SECOND candle for the same window in append mode
      if (!existed)
        getHandle.registerTimer((key._2 + windowUs + 999L) / 1000L)
      Iterator.empty
    }
    override def handleExpiredTimer(
        key: (String, Long),
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[OhlcTwsSnapshot] = {
      if (!bar.exists()) return Iterator.empty
      val st = bar.get()
      bar.clear()
      Iterator.single(OhlcTwsSnapshot(
        key._1, key._2, st.open, st.high, st.low, st.close,
        st.volume, st.n))
    }
  }

  /** Deterministic event-time candle bars — the streaming form of
    * [[graft.operators.Ohlc.bars]], sharing the SAME native aggregate
    * ([[graft.functions.OhlcAggExpr]]) so batch and stream run one candle
    * algebra: open/close selected by the unique (timestamp, trade_id)
    * tuple (windowedStats' min_by/max_by on timestamp alone is
    * tie-ambiguous), state is the 72-byte buffer in the state store, and
    * every output is a raw row value or a long sum — which is what lets
    * q86 gate the final stream snapshot against the batch oracle
    * hash-exact. No watermark by default: a replay gate must not drop
    * late rows; production callers pass one to bound state.
    */
  def windowedOhlc(
      trades: DataFrame,
      windowDur: String = "1 hour",
      watermarkDelay: Option[String] = None): DataFrame = {
    val et = trades.withColumn("event_time", toEventTime(col("timestamp")))
    val wm = watermarkDelay.fold(et)(et.withWatermark("event_time", _))
    wm.groupBy(window(col("event_time"), windowDur), col("symbol"))
      .agg(
        graft.functions.OhlcAggExpr.ohlcBar(
          col("timestamp"), col("trade_id"), col("price")).as("__bar"),
        sum(col("volume")).as("volume"),
        count(lit(1)).as("n_ticks"))
      .select(
        col("window"), col("symbol"),
        col("__bar.open").as("open"),
        col("__bar.high").as("high"),
        col("__bar.low").as("low"),
        col("__bar.close").as("close"),
        col("volume"), col("n_ticks"))
  }
}
