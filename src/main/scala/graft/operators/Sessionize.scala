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

  /** Order-invariant session state: the sorted, disjoint closed
    * intervals the key's events span so far, any two separated by more
    * than `gap` — so n_sessions is simply the interval count. Late or
    * out-of-order events are EXACT under this algebra: a timestamp
    * landing within `gap` of two intervals merges them (the
    * two-sessions-were-really-one correction no running-counter
    * formulation can make). State is O(sessions), not O(events).
    */
  case class SessionIntervals(
      starts: Vector[Long], ends: Vector[Long], nEvents: Long)

  /** One timestamp into the interval set. Same-session iff distance <=
    * gap, matching the batch rule "new session iff ts - prev > gap".
    */
  def mergeTs(s: SessionIntervals, ts: Long, gap: Long): SessionIntervals = {
    val iv = s.starts.zip(s.ends)
    val (before, rest) = iv.partition(_._2 < ts - gap)
    val (touching, after) = rest.partition(_._1 <= ts + gap)
    val merged =
      (math.min(ts, touching.headOption.map(_._1).getOrElse(ts)),
        math.max(ts, touching.lastOption.map(_._2).getOrElse(ts)))
    val out = before ++ Vector(merged) ++ after
    SessionIntervals(out.map(_._1), out.map(_._2), s.nEvents + 1L)
  }

  /** Streaming output row: the per-key session stats snapshot. */
  case class SessionSnapshot(user_id: Long, n_sessions: Long, n_events: Long)

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
