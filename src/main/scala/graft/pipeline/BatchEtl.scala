package graft.pipeline

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import graft.operators.{IndicatorAggregator, Indicators, TradeRules, Validation}
import graft.sinks.Sinks
import graft.sources.TradeCsv
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's 6-stage batch ETL re-expressed as one lazy Spark plan
  * plus two concurrent sink actions (reference src/main.cpp:13-145,
  * SURVEY.md §3.1):
  *
  *   extract (CSV scan, silent defaults) -> validate (first-failure split)
  *   -> indicators (per-symbol SMA/RSI/VWAP) -> [trades parquet ∥
  *   indicators parquet] concurrently.
  *
  * The reference's thread-pool/COPY machinery is Spark's scheduler; its
  * concurrent two-table write (~1.87x, reference
  * src/threading/PipelineExecutor.hpp:80-184) is two driver Futures — the
  * jobs interleave on the same executors.
  *
  * Scale: one shuffle on symbol for the indicator stage; the validated
  * trades write is shuffle-free (narrow from the scan). `cache()` is NOT
  * used — at 100 TB the valid set doesn't fit; instead the scan is read
  * twice and Parquet/CSV pushdown keeps each pass cheap.
  */
object BatchEtl {

  final case class Result(
      validCount: Long,
      rejectedByReason: Map[String, Long],
      indicatorRows: Long,
      tradesPath: String,
      indicatorsPath: String)

  def run(
      spark: SparkSession,
      csvPath: String,
      outDir: String,
      period: Int = 5,
      nowMs: Long = System.currentTimeMillis()): Result = {

    // Stage 1-2: extract + validate (one codegen'd projection + filter).
    // Dead-letter counts ride the trades-write job as observed metrics
    // (the reference logs each reject + totals, reference
    // src/validator/TradeValidator.hpp:198-237): no separate counting scan —
    // one pass reads, flags, counts, and writes.
    val rules = TradeRules.rules
    val trades = TradeCsv.read(spark, csvPath)
    val obs = Observation("validation")
    val flagged = Validation.withReason(trades, rules).observe(
      obs,
      count(lit(1)).as("n_total"),
      rules.map(r =>
        count(when(col("reason") === r.reason, 1)).as(r.reason)): _*)
    val valid = flagged.filter(col("reason").isNull).drop("reason")

    // Stage 3: indicators at batch stamp (single stamp per run, NOT
    // per-row current_timestamp — reference DatabaseLoader.cpp:314-316).
    // Single-pass bounded-state aggregation: each map task ships one
    // ~period-sized buffer per symbol, no window sort (see
    // IndicatorAggregator scaladoc; the window/tail forms remain available
    // when per-row indicator columns are needed).
    val indicators = IndicatorAggregator.summary(
        valid,
        groupCol = "symbol",
        priceCol = "price",
        volumeCol = Some("volume"),
        tsCol = "timestamp",
        idCol = "trade_id",
        period = period)
      .withColumn("computed_at", lit(nowMs * 1000000L))

    // Stage 5-6: concurrent independent sinks.
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fTrades = Future(
      Sinks.writeParquet(valid, outDir, "trades", nowMs))
    val fInd = Future(
      Sinks.writeParquet(indicators, outDir, "indicators", nowMs))
    val tradesPath = Await.result(fTrades, Duration.Inf)
    val indicatorsPath = Await.result(fInd, Duration.Inf)

    // metrics materialized by the sink jobs above (either write triggers
    // them; get blocks on the first completed action over `flagged`)
    val metrics = obs.get
    val rejects = rules.map(_.reason)
      .map(r => r -> metrics(r).asInstanceOf[Long])
      .filter(_._2 > 0)
      .toMap

    val validCount = spark.read.parquet(tradesPath).count()
    val indicatorRows = spark.read.parquet(indicatorsPath).count()
    Result(validCount, rejects, indicatorRows, tradesPath, indicatorsPath)
  }

  /** The four README analytics queries over a written trades/indicators
    * parquet pair (reference README.md:227-252) — the reference delegates
    * these to PostgreSQL; here they run in Spark SQL with parquet
    * column/row-group pruning standing in for the B-tree indexes.
    */
  def analytics(trades: DataFrame, indicators: DataFrame): Map[String, DataFrame] = Map(
    "count" -> trades.agg(count(lit(1)).as("total_trades")),
    "by_symbol" -> trades.groupBy(col("symbol"))
      .agg(count(lit(1)).as("trades"), sum(col("volume")).as("total_volume"))
      .orderBy(col("trades").desc),
    "latest_indicators" -> indicators
      .withColumn("signal", Indicators.signal(col("rsi")))
      .orderBy(col("computed_at").desc, col("symbol"))
      .limit(20),
    "symbol_history" -> trades
      .filter(col("symbol") === "RELIANCE")
      .orderBy(col("timestamp"), col("trade_id")))
}
