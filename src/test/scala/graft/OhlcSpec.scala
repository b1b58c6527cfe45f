package graft

import graft.operators.Ohlc
import org.apache.spark.sql.functions._

/** Batch OHLC bars: hand-computed candles, tie-breaking determinism, and
  * the no-sort plan shape (hash agg only — the 100 TB contract).
  */
class OhlcSpec extends SparkSpec {
  import spark.implicits._

  // (symbol, bucket, ts, id, price, volume)
  private val ticks = Seq(
    ("A", "h1", 10L, 1L, 5.0, 2L),
    ("A", "h1", 30L, 2L, 9.0, 1L),
    ("A", "h1", 20L, 3L, 1.0, 3L),
    ("A", "h2", 40L, 4L, 7.0, 4L),
    ("B", "h1", 10L, 5L, 2.0, 5L)
  ).toDF("symbol", "bucket", "ts", "id", "price", "volume")

  private def barsOf(df: org.apache.spark.sql.DataFrame) =
    Ohlc.bars(df, Seq("symbol"), "bucket", "price", "volume",
        Seq("ts", "id"))
      .orderBy("symbol", "bucket")
      .as[(String, String, Double, Double, Double, Double, Long, Long)]
      .collect().toSeq

  test("hand-computed candles: open=first by ts, close=last by ts") {
    assert(barsOf(ticks) == Seq(
      // A/h1: by ts order (10,20,30) -> prices (5,1,9)
      ("A", "h1", 5.0, 9.0, 1.0, 9.0, 6L, 3L),
      ("A", "h2", 7.0, 7.0, 7.0, 7.0, 4L, 1L),
      ("B", "h1", 2.0, 2.0, 2.0, 2.0, 5L, 1L)))
  }

  test("equal-ts ties broken by the second orderBy column") {
    val tied = Seq(
      ("A", "h1", 10L, 2L, 3.0, 1L),
      ("A", "h1", 10L, 1L, 8.0, 1L), // same ts, lower id -> the open
      ("A", "h1", 10L, 3L, 4.0, 1L)  // same ts, highest id -> the close
    ).toDF("symbol", "bucket", "ts", "id", "price", "volume")
    val Seq((_, _, open, _, _, close, _, _)) = barsOf(tied)
    assert(open == 8.0 && close == 4.0)
  }

  test("result is invariant to input partition layout") {
    assert(barsOf(ticks.repartition(7)) == barsOf(ticks.coalesce(1)))
  }

  test("plan is one ObjectHashAggregate: no Window, no Sort anywhere") {
    val plan = Ohlc.bars(ticks, Seq("symbol"), "bucket", "price",
      "volume", Seq("ts", "id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("SortAggregate") && !plan.contains("+- Sort "),
      plan)
  }

  test("partial buffers merge across map tasks identically to one task") {
    // 1,000 rows over 3 buckets, shuffled input order, 8 input splits:
    // merge() must reproduce the single-partition answer exactly
    val rows = (0 until 1000).map { i =>
      ("S", s"b${i % 3}", (1000 - i).toLong, i.toLong,
        ((i * 7919) % 997).toDouble, 1L)
    }
    val df = rows.toDF("symbol", "bucket", "ts", "id", "price", "volume")
    assert(barsOf(df.repartition(8)) == barsOf(df.coalesce(1)))
  }

  test("single orderBy column form works") {
    val one = Seq(
      ("A", "h1", 2L, 0L, 4.0, 1L),
      ("A", "h1", 1L, 0L, 6.0, 1L)
    ).toDF("symbol", "bucket", "ts", "id", "price", "volume")
    val bars = Ohlc.bars(one, Seq("symbol"), "bucket", "price", "volume",
        Seq("ts"))
      .as[(String, String, Double, Double, Double, Double, Long, Long)]
      .collect().toSeq
    assert(bars == Seq(("A", "h1", 6.0, 6.0, 4.0, 4.0, 2L, 2L)))
  }
}
