package graft.operators

import graft.functions.OhlcAggExpr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch OHLC candle bars — the batch counterpart of
  * streaming.StreamingEtl.windowedStats (same output algebra, same
  * deterministic open/close selection) over an already-bucketed frame.
  * The reference delegates bar-style analytics to PostgreSQL SQL
  * (reference README.md:227-252); this is the engine-native form.
  *
  * Scale shape: ONE ObjectHashAggregate, map-side combined — candle
  * state is the native [[graft.functions.OhlcAggExpr]] (72-byte buffer),
  * so no per-group sort and no window exchange ever happens. The naive
  * alternatives both sort: a row_number window shuffles AND sorts every
  * row, and `min_by(price, struct(ts, id))` falls back to SortAggregate
  * because a struct extremum ordering is not a mutable-buffer type.
  * The orderBy tuple must be unique per row within a group (e.g.
  * (ts, trade_id)) or open/close are not well-defined; with a unique key
  * the result is bit-deterministic because no arithmetic is performed on
  * prices — open/high/low/close are raw row values.
  */
object Ohlc {

  /** One OHLC bar per (`keyCols`..., `bucketCol`). `orderBy` (one or two
    * LONG columns, lexicographic) breaks ties for open (first by the
    * tuple) and close (last by the tuple).
    */
  def bars(
      df: DataFrame,
      keyCols: Seq[String],
      bucketCol: String,
      priceCol: String,
      volumeCol: String,
      orderBy: Seq[String]): DataFrame = {
    val (o1, o2): (Column, Column) = orderBy match {
      case Seq(a) => (col(a), lit(0L))
      case Seq(a, b) => (col(a), col(b))
      case _ => throw new IllegalArgumentException(
        s"orderBy must be 1 or 2 unique-per-row LONG columns, got $orderBy")
    }
    val groupCols = (keyCols :+ bucketCol).map(col)
    df.groupBy(groupCols: _*)
      .agg(
        OhlcAggExpr.ohlcBar(o1, o2, col(priceCol)).as("__bar"),
        sum(col(volumeCol)).as("volume"),
        count(lit(1)).as("n_ticks"))
      .select(groupCols ++ Seq(
        col("__bar.open").as("open"),
        col("__bar.high").as("high"),
        col("__bar.low").as("low"),
        col("__bar.close").as("close"),
        col("volume"), col("n_ticks")): _*)
  }
}
