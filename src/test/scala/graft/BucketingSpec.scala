package graft

import graft.sinks.Sinks
import org.apache.spark.sql.functions._

/** Bucketed tables must join without a shuffle — the write-once/join-many
  * scale pattern. The spec asserts the physical plan of a bucketed-bucketed
  * join contains NO Exchange on the join path.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two co-bucketed tables plans without an exchange") {
    val trades = graft.sources.TradeGenerator.generate(spark, 5000)
    val stats = trades.groupBy("symbol")
      .agg(avg("price").as("avg_price"))

    Sinks.writeBucketed(trades, "bt_trades", Seq("symbol"), 4,
      sortCols = Seq("symbol"))
    Sinks.writeBucketed(stats, "bt_stats", Seq("symbol"), 4,
      sortCols = Seq("symbol"))

    val joined = spark.table("bt_trades")
      .join(spark.table("bt_stats"), "symbol")
      .filter(col("price") > col("avg_price"))
    // disable broadcast so the join strategy actually uses bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggregation on bucket key needs no exchange") {
    val agg = spark.table("bt_trades").groupBy("symbol").count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed aggregation should not shuffle:\n$plan")
    assert(agg.count() === 10)
  }
}
