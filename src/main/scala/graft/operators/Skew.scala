package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting — for the cases AQE's runtime skew handling
  * does not cover: skewed aggregation state (one giant group hot-spots a
  * single reducer) and broadcast-ineligible joins against a replicable
  * side.
  *
  * Both transforms are semantics-preserving; specs assert equivalence with
  * the unsalted plans on skewed data.
  */
object Skew {

  /** Two-phase salted aggregation for algebraic aggregates: rows of each
    * key scatter over `saltBuckets` sub-groups aggregated map-side, then
    * the per-salt partials combine in a second, tiny aggregation. The
    * shuffle carries `saltBuckets` rows per hot key instead of every row.
    *
    * `partials`: aggregations for phase 1; `finals`: how to combine the
    * phase-1 columns in phase 2 (keyed by output column name).
    *
    * Example — count + sum:
    *   saltedAggregate(df, Seq("k"), 32,
    *     Map("c" -> count(lit(1)), "s" -> sum(col("v"))),
    *     Map("c" -> sum(col("c")), "s" -> sum(col("s"))))
    */
  def saltedAggregate(
      df: DataFrame,
      keyCols: Seq[String],
      saltBuckets: Int,
      partials: Map[String, Column],
      finals: Map[String, Column]): DataFrame = {
    require(partials.keySet == finals.keySet, "partials/finals must align")
    val salted = df.withColumn(
      "__salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets.toLong)))
    val phase1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(
        partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(
        finals.head._2.as(finals.head._1),
        finals.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
  }

  /** Salted join for a skewed LEFT side against a replicable RIGHT side:
    * each left row gets a random-ish salt in [0, saltBuckets); the right
    * side is replicated once per salt value, and the join key becomes
    * (key, salt) — a hot key's rows now spread over `saltBuckets` tasks
    * instead of one. Right-side cost: |right| * saltBuckets rows, so use
    * only when right is small-ish but above the broadcast threshold, or
    * when AQE skew splitting is unavailable (e.g. inside a co-partitioned
    * stage you want to preserve).
    *
    * Only inner and left joins are semantics-preserving: the right side is
    * exploded once per salt value, so a right/full outer join would emit an
    * unmatched right row `saltBuckets` times. Left-semi/anti are also safe
    * (right multiplicity is irrelevant to them).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "").replace(" ", "")
    require(
      Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")(jt),
      s"saltedJoin preserves semantics only for inner/left/semi/anti joins; " +
        s"a right or full outer join would duplicate unmatched right rows " +
        s"once per salt bucket (got '$joinType')")
    val l = left.withColumn(
      "__salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets.toLong)))
    val r = right.withColumn(
      "__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    l.join(r, keyCols :+ "__salt", joinType).drop("__salt")
  }
}
