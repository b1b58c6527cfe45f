package graft.operators

import org.apache.spark.sql.functions._

/** The reference validator's 6 ordered rules with first-failure semantics
  * (reference src/validator/TradeValidator.hpp:98-182). Order matters: the
  * first failing rule's reason labels the row.
  *
  * Reasons are stable machine-readable slugs; the rule predicates are the
  * same CHECK constraints the reference's DB schema enforces (reference
  * src/database/DatabaseLoader.cpp:100-112) — intentionally one catalog.
  *
  * Note the anchored regex: the reference uses CTRE full-match while Spark's
  * rlike is substring-match, so ^...$ is required (SURVEY.md §2.2 P1).
  */
object TradeRules {

  val rules: Seq[Validation.Rule] = Seq(
    Validation.Rule("invalid_symbol", col("symbol").rlike("^[A-Z]{1,10}$")),
    Validation.Rule("invalid_price", col("price") > 0 && col("price") < 1000000),
    Validation.Rule("invalid_volume", col("volume") > 0),
    Validation.Rule("invalid_side", col("side").isin("B", "S", "N")),
    Validation.Rule("invalid_type", col("type").isin("M", "L", "I")),
    Validation.Rule("invalid_timestamp", col("timestamp") > 0))
}
