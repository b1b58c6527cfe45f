package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered rule validation with first-failure reasons and a dead-letter
  * split — the reference's validator contract (reference
  * src/validator/TradeValidator.hpp:98-237): rules evaluate in declaration
  * order, the first failing rule's reason labels the row, valid rows flow on
  * and rejects form a side output with counts.
  *
  * Implemented as a single `when(...).otherwise()` chain -> one codegen'd
  * projection, no UDF, no extra pass over the data. The split is two filters
  * over the same cached/optimized child plan.
  */
object Validation {

  /** A rule: rows where `holds` is false (or null) fail with `reason`. */
  final case class Rule(reason: String, holds: Column)

  /** First-failure reason column: null means valid. */
  def reasonColumn(rules: Seq[Rule]): Column =
    rules.foldRight(lit(null).cast("string")) { (r, rest) =>
      // null predicate result counts as failure, as the reference's
      // zero-default parse + downstream validation does
      // (reference src/parser/CsvParser.cpp:171, TradeValidator.hpp:138-141).
      when(!coalesce(r.holds, lit(false)), lit(r.reason)).otherwise(rest)
    }

  final case class Split(valid: DataFrame, rejected: DataFrame)

  /** Adds a `reason` column. */
  def withReason(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.withColumn("reason", reasonColumn(rules))

  /** Valid / dead-letter split (reference TradeValidator.hpp:198-237). */
  def split(df: DataFrame, rules: Seq[Rule]): Split = {
    val flagged = withReason(df, rules)
    Split(
      valid = flagged.filter(col("reason").isNull).drop("reason"),
      rejected = flagged.filter(col("reason").isNotNull))
  }

  /** Per-reason counts including the valid bucket — the validator's
    * valid/rejected report as a DataFrame.
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame =
    withReason(df, rules)
      .groupBy(coalesce(col("reason"), lit("valid")).as("outcome"))
      .agg(count(lit(1)).as("n"))

  /** Attach observed metrics (`n_total`, `n_valid`, `n_rejected`) to the
    * frame — the reference's live valid/rejected counters (reference
    * src/tools/websocket_demo.cpp:108-125) as zero-cost piggyback metrics:
    * no extra pass, values surface per action (batch:
    * qe.observedMetrics) / per micro-batch (StreamingQueryListener).
    */
  def observed(df: DataFrame, rules: Seq[Rule], name: String = "validation"): DataFrame = {
    val reason = reasonColumn(rules)
    df.observe(
      name,
      count(lit(1)).as("n_total"),
      count(when(reason.isNull, 1)).as("n_valid"),
      count(when(reason.isNotNull, 1)).as("n_rejected"))
  }
}
