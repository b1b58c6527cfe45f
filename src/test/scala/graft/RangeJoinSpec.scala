package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(7)

  private def sides(n: Int, span: Long) = {
    val l = (0 until n).map(i => (i.toLong, rng.nextLong(span))).toDF("l_id", "l_ts")
    val r = (0 until n).map(i => (i.toLong, rng.nextLong(span))).toDF("r_id", "r_ts")
    (l, r)
  }

  private def naive(
      l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
      lower: Long, upper: Long) =
    l.crossJoin(r)
      .filter($"r_ts" >= $"l_ts" + lower && $"r_ts" < $"l_ts" + upper)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet

  test("bucketized range join is identical to the naive inequality join") {
    val (l, r) = sides(500, 10000L)
    val got = RangeJoin.timeRangeJoin(l, "l_ts", r, "r_ts", 0L, 100L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val want = naive(l, r, 0L, 100L)
    assert(got == want)
    assert(want.nonEmpty, "degenerate test: no pairs matched")
  }

  test("asymmetric window (negative lower bound) matches naive") {
    val (l, r) = sides(400, 5000L)
    val got = RangeJoin.timeRangeJoin(l, "l_ts", r, "r_ts", -50L, 150L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(got == naive(l, r, -50L, 150L))
  }

  test("window boundaries: inclusive lower, exclusive upper") {
    val l = Seq((1L, 100L)).toDF("l_id", "l_ts")
    val r = Seq((10L, 99L), (11L, 100L), (12L, 149L), (13L, 150L))
      .toDF("r_id", "r_ts")
    val got = RangeJoin.timeRangeJoin(l, "l_ts", r, "r_ts", 0L, 50L)
      .select("r_id").as[Long].collect().toSet
    assert(got == Set(11L, 12L))
  }

  test("timestamp-typed columns join in epoch microseconds") {
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("l_id", "l_ts")
    val r = Seq(
      (10L, java.sql.Timestamp.valueOf("2024-01-01 00:04:59.999999")),
      (11L, java.sql.Timestamp.valueOf("2024-01-01 00:05:00")))
      .toDF("r_id", "r_ts")
    val got = RangeJoin.timeRangeJoin(
        l, "l_ts", r, "r_ts", 0L, 5L * 60 * 1000000)
      .select("r_id").as[Long].collect().toSet
    assert(got == Set(10L))
  }

  test("ns-scale epochs bucket exactly (no double-rounding pair loss)") {
    // epochs ~1.7e18 have ulp 256 as doubles; with a 1-minute ns window
    // (6e10) a double-divided bucket can land one off and silently drop
    // matches. Place right rows at bucket boundaries around each left row.
    val base = 1700000000000000000L
    val width = 60L * 1000000000L
    val l = (0 until 200).map(i => (i.toLong, base + i * 7919L * 1000000L))
      .toDF("l_id", "l_ts")
    val r = (0 until 200).flatMap { i =>
      val t = base + i * 7919L * 1000000L
      Seq((i * 4L, t), (i * 4 + 1L, t + width - 1), // in-window edges
        (i * 4 + 2L, t + width), (i * 4 + 3L, t - 1)) // out-window edges
    }.toDF("r_id", "r_ts")
    val got = RangeJoin.timeRangeJoin(l, "l_ts", r, "r_ts", 0L, width)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    // left rows are spaced < width apart, so windows overlap and the truth
    // must come from the naive join, not hand enumeration
    val want = naive(l, r, 0L, width)
    assert(got == want,
      s"missing ${want.diff(got).size}, extra ${got.diff(want).size}")
    // the boundary construction guarantees every left row matches its own
    // at-t and at-t+width-1 rows
    assert((0 until 200).forall(i =>
      want((i.toLong, i * 4L)) && want((i.toLong, i * 4 + 1L))))
  }

  test("plan has no cartesian product or nested loop join") {
    val (l, r) = sides(100, 1000L)
    val plan = RangeJoin.timeRangeJoin(l, "l_ts", r, "r_ts", 0L, 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("overlapping column names are rejected") {
    val (l, _) = sides(10, 100L)
    intercept[IllegalArgumentException] {
      RangeJoin.timeRangeJoin(l, "l_ts", l, "l_ts", 0L, 10L)
    }
  }
}
