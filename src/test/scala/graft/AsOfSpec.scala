package graft

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of join picks latest right row at or before left ts") {
    val trades = Seq(
      ("A", 100L, 1), ("A", 200L, 2), ("A", 50L, 3), ("B", 100L, 4))
      .toDF("sym", "ts", "tid")
    val quotes = Seq(
      ("A", 90L, 1.0), ("A", 100L, 2.0), ("A", 150L, 3.0), ("B", 500L, 9.0))
      .toDF("sym", "qts", "px")
    val out = AsOf.joinBackward(
      trades, quotes, Seq("sym"), "ts", "qts", Map("px" -> "px"))
      .select("tid", "px").as[(Int, Option[Double])].collect().toMap
    assert(out(1) === Some(2.0)) // equal ts included (<=)
    assert(out(2) === Some(3.0)) // latest at-or-before 200 is 150
    assert(out(3) === None) // nothing at-or-before 50
    assert(out(4) === None) // B's only quote is later
  }

  test("payload keeps its type (long ns timestamps lose nothing)") {
    val l = Seq((1L, 1700000000000000100L)).toDF("k", "ts")
    val r = Seq((1L, 1700000000000000099L)).toDF("k", "rts")
    val out = AsOf.joinBackward(
      l, r, Seq("k"), "ts", "rts", Map("rts" -> "prev_ts"))
      .select("prev_ts").as[Long].head()
    assert(out === 1700000000000000099L) // exact, no double rounding
  }
}
