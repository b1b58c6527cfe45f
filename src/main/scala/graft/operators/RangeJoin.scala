package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-range (interval) join without an equality key: left row L matches
  * right row R iff R.ts ∈ [L.ts + lower, L.ts + upper).
  *
  * Spark's built-in planner turns a bare inequality join into a
  * broadcast-nested-loop / cartesian — quadratic at scale. The classic fix
  * is bucketization: quantize time into buckets of width = upper - lower,
  * give every right row its bucket, and explode every left row to the
  * (at most two) buckets its window overlaps. The range condition then
  * rides on a plain hash-partitioned equi-join on the bucket key, with the
  * exact interval predicate applied after the join. Output is IDENTICAL to
  * the naive inequality join (oracle-checked by q44 against DuckDB's IEJoin)
  * — only the candidate generation is bounded.
  *
  * Scale: shuffle carries each right row once and each left row ≤ 2×, both
  * hash-distributed by bucket; skew only arises if wall-clock hotspots put
  * many rows in one window-width, in which case compose with
  * Skew.saltedJoin on the bucket key.
  */
object RangeJoin {

  /** @param lower window start offset (inclusive), in the ts columns' unit
    * @param upper window end offset (exclusive), > lower, same unit
    *
    * Ts columns may be TIMESTAMP (compared in epoch microseconds — offsets
    * are then µs) or any integral epoch column in a fixed unit (e.g. the
    * events table's raw ns longs — offsets are then that unit).
    */
  def timeRangeJoin(
      left: DataFrame,
      leftTsCol: String,
      right: DataFrame,
      rightTsCol: String,
      lower: Long,
      upper: Long): DataFrame = {
    require(upper > lower, "empty window")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left/right column names must be disjoint (rename before joining)")
    val width = upper - lower
    def epoch(df: DataFrame, name: String) = df.schema(name).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(name))
      // NTZ wall-clock read as UTC (Tables.configure pins the session zone);
      // offsets are then µs, same as TimestampType
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(name).cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType => col(name)
      case other => throw new IllegalArgumentException(
        s"$name must be timestamp or integral epoch, got $other")
    }
    val lts = epoch(left, leftTsCol)
    val rts = epoch(right, rightTsCol)
    // floor division on BIGINT epochs, negative-safe and EXACT: the
    // numerator is made divisible by w (pmod >= 0), then divided in
    // decimal — long `/` routes through DoubleType, whose 2^53 mantissa
    // misrounds ns-scale epochs (~1.7e18, ulp 256) into the wrong bucket
    // for narrow windows, silently dropping matching pairs. The decimal
    // quotient is exactly integral, so the bigint cast is lossless.
    def bucketOf(us: org.apache.spark.sql.Column) =
      ((us - pmod(us, lit(width))).cast("decimal(38,0)") / lit(width))
        .cast("bigint")

    val r = right.withColumn("__bucket", bucketOf(rts))
    // the window [lts+lower, lts+upper) spans buckets b0 .. b1 where
    // b1 - b0 <= 1 because the window width equals the bucket width
    val l = left
      .withColumn("__b0", bucketOf(lts + lower))
      .withColumn("__b1", bucketOf(lts + upper - 1))
      .withColumn("__bucket", explode(array_distinct(array(col("__b0"), col("__b1")))))
      .drop("__b0", "__b1")

    l.join(r, Seq("__bucket"))
      .filter(rts >= lts + lower && rts < lts + upper)
      .drop("__bucket")
  }
}
