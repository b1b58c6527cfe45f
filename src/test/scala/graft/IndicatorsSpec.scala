package graft

import graft.operators.Indicators
import org.apache.spark.sql.functions._

/** Indicator numerics against hand-computed values, including the
  * reference's documented worked example and its RSI edge cases
  * (reference src/indicators/TechnicalIndicators.hpp:204-330).
  */
class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  private def series(prices: Seq[Double], volumes: Seq[Int] = Nil) = {
    val vols = if (volumes.isEmpty) prices.map(_ => 1) else volumes
    prices.zip(vols).zipWithIndex.map { case ((p, v), i) =>
      ("SYM", i.toLong, p, v)
    }.toDF("symbol", "ts", "price", "volume")
  }

  private def summaryOf(prices: Seq[Double], volumes: Seq[Int] = Nil,
      period: Int = 5) =
    Indicators.summary(
      series(prices, volumes), Seq("symbol"), "price", Some("volume"),
      Seq("ts"), period)
      .select("sma", "rsi", "vwap", "period", "n_rows")
      .as[(Double, Double, Double, Int, Long)].head()

  test("reference worked example: 100,102,101,103,105") {
    // diffs: +2,-1,+2,+2 -> gains 6/4, losses 1/4 -> RS 6 -> RSI 100-100/7
    val (sma, rsi, vwap, period, n) = summaryOf(Seq(100, 102, 101, 103, 105))
    assert(math.abs(sma - 102.2) < 1e-9)
    assert(math.abs(rsi - (100.0 - 100.0 / 7.0)) < 1e-9) // 85.7142857...
    assert(math.abs(vwap - 102.2) < 1e-9) // unit volumes -> mean
    assert(period === 5)
    assert(n === 5)
  }

  test("rsi window uses last period+1 prices when series is longer") {
    // 10 prices; period 5 -> diffs from the last 5 transitions only.
    val prices = Seq[Double](500, 400, 300, 200, 100, 102, 101, 103, 105, 104)
    // last 5 diffs: 100->102 (+2), 102->101 (-1), 101->103 (+2),
    // 103->105 (+2), 105->104 (-1): gains 6/5, losses 2/5 -> RS 3 -> 75.0
    val (_, rsi, _, _, _) = summaryOf(prices)
    assert(math.abs(rsi - 75.0) < 1e-9)
  }

  test("rsi edge: fewer than 2 prices -> 50.0") {
    val (_, rsi, _, period, _) = summaryOf(Seq(42.0))
    assert(rsi === 50.0)
    assert(period === 1) // clamped to group size
  }

  test("rsi edge: zero total loss -> 100.0") {
    val (_, rsi, _, _, _) = summaryOf(Seq(1.0, 2.0, 3.0, 4.0))
    assert(rsi === 100.0)
  }

  test("rsi edge: zero total gain -> 0.0") {
    val (_, rsi, _, _, _) = summaryOf(Seq(4.0, 3.0, 2.0, 1.0))
    assert(rsi === 0.0)
  }

  test("vwap is all-history, not windowed") {
    // SMA sees the last 2 prices only; VWAP weighs the whole series
    // (intentional reference asymmetry, TechnicalIndicators.hpp:310-330).
    val (sma, _, vwap, _, _) =
      summaryOf(Seq(10.0, 20.0, 30.0), volumes = Seq(100, 10, 1), period = 2)
    assert(math.abs(sma - 25.0) < 1e-9)
    val expected = (10.0 * 100 + 20.0 * 10 + 30.0 * 1) / 111.0
    assert(math.abs(vwap - expected) < 1e-9)
  }

  test("input row order does not matter; orderBy defines the series") {
    val shuffled = Seq(
      ("SYM", 4L, 105.0, 1), ("SYM", 0L, 100.0, 1), ("SYM", 2L, 101.0, 1),
      ("SYM", 1L, 102.0, 1), ("SYM", 3L, 103.0, 1))
      .toDF("symbol", "ts", "price", "volume").repartition(4)
    val (sma, rsi, _, _, _) = Indicators.summary(
      shuffled, Seq("symbol"), "price", Some("volume"), Seq("ts"), 5)
      .select("sma", "rsi", "vwap", "period", "n_rows")
      .as[(Double, Double, Double, Int, Long)].head()
    assert(math.abs(sma - 102.2) < 1e-9)
    assert(math.abs(rsi - (100.0 - 100.0 / 7.0)) < 1e-9)
  }

  test("multiple symbols produce one row each, independently") {
    val df = Seq(
      ("A", 0L, 1.0, 1), ("A", 1L, 2.0, 1),
      ("B", 0L, 9.0, 2), ("B", 1L, 8.0, 2), ("B", 2L, 7.0, 2))
      .toDF("symbol", "ts", "price", "volume")
    val out = Indicators.summary(
      df, Seq("symbol"), "price", Some("volume"), Seq("ts"), 5)
    val bySym = out.select("symbol", "rsi", "n_rows")
      .as[(String, Double, Long)].collect().toMap2
    assert(bySym("A") === ((100.0, 2L))) // all gains
    assert(bySym("B") === ((0.0, 3L))) // all losses
  }

  test("rsi stays in [0, 100] and sma within price bounds (property sweep)") {
    val rng = new scala.util.Random(7)
    val prices = Seq.fill(200)(50 + rng.nextDouble() * 100)
    val (sma, rsi, vwap, _, _) = summaryOf(prices, period = 14)
    assert(rsi >= 0.0 && rsi <= 100.0)
    assert(sma >= prices.min - 1e-9 && sma <= prices.max + 1e-9)
    assert(vwap >= prices.min - 1e-9 && vwap <= prices.max + 1e-9)
  }

  test("signal classification thresholds") {
    val df = Seq(70.0, 69.9, 30.0, 30.1, 50.0).toDF("rsi")
      .withColumn("signal", Indicators.signal(col("rsi")))
    assert(df.select("signal").as[String].collect().toSeq ===
      Seq("OVERBOUGHT", "NEUTRAL", "OVERSOLD", "NEUTRAL", "NEUTRAL"))
  }

  implicit private class Tup3Ops(val s: Array[(String, Double, Long)]) {
    def toMap2: Map[String, (Double, Long)] =
      s.map { case (k, a, b) => k -> ((a, b)) }.toMap
  }
}
