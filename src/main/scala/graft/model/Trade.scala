package graft.model

import org.apache.spark.sql.types._

/** The engine's single domain record — a trade execution (reference
  * src/model/Trade.hpp:16-38).
  *
  * Types follow SURVEY.md §1.1: timestamps are kept as raw nanoseconds since
  * epoch (LongType) end-to-end because Spark's TimestampType is µs-precision;
  * conversion to calendar time happens only at presentation (the reference's
  * own SQL does the same, reference README.md:242).
  *
  * `exchange` is optional lineage metadata: the reference never parses it
  * from CSV nor persists it (reference src/parser/CsvParser.cpp:169-249,
  * src/output/ParquetWriter.cpp:128-136); only the live tick feed stamps it.
  *
  * Intended total order is (timestamp, trade_id) — the reference's declared
  * comparator accidentally sorts trade_id first but documents
  * timestamp-major order (reference src/model/Trade.hpp:36-37); we adopt the
  * documented semantics (SURVEY.md §1.1).
  */
final case class Trade(
    trade_id: Long,
    order_id: Long,
    timestamp: Long, // ns since epoch (UTC)
    price: Double,
    volume: Int,
    symbol: String,
    exchange: String, // lineage metadata; "" when unknown
    side: String, // "B" | "S" | "N"
    `type`: String, // "M" | "L" | "I"
    is_pro: Boolean)

object Trade {

  /** CSV wire order (reference src/parser/CsvParser.cpp:167):
    * trade_id,order_id,timestamp,symbol,price,volume,side,type,is_pro —
    * note `exchange` is absent from the wire format.
    *
    * `is_pro` is a STRING at the wire level, not a boolean: the reference
    * writes it as 0/1 (reference src/tools/DataGenerator.hpp:207) and
    * parses it with an integer from_chars, while our own older CSVs spell
    * true/false. Spark's CSV boolean parser only accepts true/false, so a
    * BooleanType field would silently null out the reference's `1` and the
    * defaulting pass would coalesce it to false — losing every
    * institutional flag. We read the raw token and map it in
    * [[graft.sources.TradeCsv.defaulted]] instead.
    */
  val csvSchema: StructType = StructType(Seq(
    StructField("trade_id", LongType, nullable = true),
    StructField("order_id", LongType, nullable = true),
    StructField("timestamp", LongType, nullable = true),
    StructField("symbol", StringType, nullable = true),
    StructField("price", DoubleType, nullable = true),
    StructField("volume", IntegerType, nullable = true),
    StructField("side", StringType, nullable = true),
    StructField("type", StringType, nullable = true),
    StructField("is_pro", StringType, nullable = true)))

  /** Full in-engine schema (csv columns + exchange). */
  val schema: StructType = StructType(Seq(
    StructField("trade_id", LongType, nullable = false),
    StructField("order_id", LongType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("price", DoubleType, nullable = false),
    StructField("volume", IntegerType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("exchange", StringType, nullable = false),
    StructField("side", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("is_pro", BooleanType, nullable = false)))
}

/** Per-symbol indicator output row (reference
  * src/indicators/TechnicalIndicators.hpp:49-56); `computed_at` is stamped
  * once per batch, not per row (reference src/database/DatabaseLoader.cpp:
  * 314-316).
  */
final case class IndicatorResult(
    symbol: String,
    sma: Double,
    rsi: Double,
    vwap: Double,
    period: Int,
    computed_at: Long)
