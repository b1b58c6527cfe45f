package graft

import org.apache.spark.sql.functions._

/** At-rest format coverage beyond parquet: ORC round-trip with predicate
  * pushdown. (spark-avro's DataSource jar is not in this environment —
  * parquet/ORC/CSV/JSON are the supported interchange formats.)
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  test("orc round-trips trades and pushes filters to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val trades = graft.sources.TradeGenerator.generate(spark, 5000)
    trades.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === 5000)
    assert(back.agg(sum("volume")).as[Long].head() ===
      trades.agg(sum("volume")).as[Long].head())
    val q = back.filter(col("symbol") === "TCS").select("symbol", "price")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("TCS"), scan)
    // column pruning reaches the ORC reader too
    assert(scan.contains("ReadSchema") && !scan.contains("is_pro"), scan)
  }
}
