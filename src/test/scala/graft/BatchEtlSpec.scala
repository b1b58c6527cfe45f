package graft

import graft.pipeline.BatchEtl
import graft.sources.TradeGenerator

/** Golden end-to-end batch pipeline (reference src/main.cpp:13-145 shape)
  * and generator determinism (reference src/tools/DataGenerator.hpp:46-52).
  */
class BatchEtlSpec extends SparkSpec {
  import spark.implicits._

  test("golden fixture end-to-end: validate -> indicators -> dual parquet") {
    val path = getClass.getResource("/sample_trades.csv").getPath
    val out = java.nio.file.Files.createTempDirectory("graft-etl").toString
    val res = BatchEtl.run(spark, path, out, period = 5, nowMs = 1700000000123L)
    assert(res.validCount === 10)
    assert(res.rejectedByReason === Map(
      "invalid_symbol" -> 1L, "invalid_price" -> 1L, "invalid_volume" -> 1L))
    assert(res.indicatorRows === 5) // RELIANCE TCS INFY HDFCBANK SBIN

    val ind = spark.read.parquet(res.indicatorsPath)
    assert(ind.columns.toSet === Set(
      "symbol", "sma", "rsi", "vwap", "period", "n_rows", "computed_at"))
    // single batch stamp, ns precision (reference DatabaseLoader.cpp:314-316)
    val stamps = ind.select("computed_at").as[Long].collect().toSet
    assert(stamps === Set(1700000000123L * 1000000L))

    val analytics = BatchEtl.analytics(
      spark.read.parquet(res.tradesPath), ind)
    assert(analytics("count").as[Long].head() === 10L)
    val bySym = analytics("by_symbol")
      .select("symbol", "trades").as[(String, Long)].collect().toMap
    assert(bySym("RELIANCE") === 3L)
    assert(analytics("latest_indicators").count() === 5)
    assert(analytics("symbol_history").count() === 3)
  }

  test("generator: same seed same data, monotonic ns timestamps, clamps") {
    // collect order follows the symbol-window shuffle, so compare sorted by
    // the unique trade_id
    def rows(seed: Long) =
      TradeGenerator.generate(spark, 2000, seed).collect()
        .sortBy(_.getAs[Long]("trade_id"))
    val a = rows(42)
    assert(a.toSeq === rows(42).toSeq)
    assert(a.toSeq !== rows(7).toSeq)

    val ts = a.map(_.getAs[Long]("timestamp"))
    assert(ts.sorted.toSeq === ts.toSeq) // ids in order -> strictly increasing
    assert(ts.distinct.length === ts.length)
    val prices = a.map(_.getAs[Double]("price"))
    assert(prices.forall(p => p >= 50.0 && p <= 99999.0))
    val syms = a.map(_.getAs[String]("symbol")).toSet
    assert(syms.subsetOf(TradeGenerator.symbols.map(_._1).toSet))
    assert(syms.size >= 8) // weighted mix actually hits most symbols
  }

  test("generated trades all pass validation") {
    val g = TradeGenerator.generate(spark, 1000)
    val split = graft.operators.Validation.split(
      g, graft.operators.TradeRules.rules)
    assert(split.rejected.count() === 0)
  }
}
