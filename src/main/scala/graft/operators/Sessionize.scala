package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event log — the batch analogue of the
  * reference's per-key streaming state (reference
  * src/tools/websocket_demo.cpp:73-125 keeps unbounded per-symbol state; a
  * training-data pipeline needs the same keyed-gap semantics over history).
  *
  * A new session starts when the time since the previous event of the same
  * key exceeds `gap` (same unit as `tsCol`, here ns).
  *
  * Scale: single shuffle on the key; the lag/cumsum windows and the final
  * aggregation all reuse that partitioning. No driver-side state.
  */
object Sessionize {

  /** Adds `session_id` (1-based per key, in time order). */
  def withSessionId(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      orderBy: Seq[String],
      gap: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderBy.map(col): _*)
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull || col(tsCol) - prev > gap, 1).otherwise(0)
    df.withColumn(
      "session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-key session stats: n_sessions, n_events. */
  def stats(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      orderBy: Seq[String],
      gap: Long): DataFrame =
    withSessionId(df, keyCol, tsCol, orderBy, gap)
      .groupBy(col(keyCol))
      .agg(
        max(col("session_id")).as("n_sessions"),
        count(lit(1)).as("n_events"))

  /** Inter-arrival gap statistics per key — the feed-health /
    * microstructure profile (is a symbol's tick stream bursty, stalled,
    * or steady; which users go quiet). Gaps are raw ns-epoch differences
    * of CONSECUTIVE events in (orderBy) order, so every statistic here is
    * exact integer arithmetic — min/max/sum replicate in any engine, and
    * the mean is one IEEE double division of two exact int64s, which is
    * bit-identical wherever computed (same operands, same operation).
    * One window shuffle on the key, then a hash agg.
    */
  def gapStats(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      orderBy: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderBy.map(col): _*)
    df.withColumn("__gap", col(tsCol) - lag(col(tsCol), 1).over(w))
      .filter(col("__gap").isNotNull)
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_gaps"),
        min(col("__gap")).as("min_gap"),
        max(col("__gap")).as("max_gap"),
        sum(col("__gap")).as("total_gap"),
        round(sum(col("__gap")).cast("double") /
          count(lit(1)).cast("double"), 2).as("avg_gap"))
  }
}
