package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planted-hot-key skew evidence (SURVEY §8): one join key owns 50% of a
  * 20M-row fact side, joined against a dimension too large to broadcast.
  * Three measured variants isolate who handles the skew:
  *
  *   1. aqe_skew_on  — sort-merge join with AQE's OptimizeSkewedJoin
  *      splitting the hot partition at runtime; the final plan is pinned
  *      to contain the `skew=true` marker (hard assertion).
  *   2. aqe_skew_off — the same join with skew splitting disabled: one
  *      task sorts/joins the hot key's 10M rows alone, the straggler
  *      pattern a 1000-executor cluster cannot hide.
  *   3. salted_join  — graft.operators.Skew.saltedJoin with skew
  *      splitting disabled: the manual mitigation for plans where AQE
  *      can't help (e.g. preserving an existing co-partitioning, or a
  *      join inside a cached stage). Row counts of all three variants
  *      are asserted identical.
  *
  * The AQE skew thresholds are lowered for the local corpus (the hot
  * partition here is ~150 MB; production defaults fire at 256 MB — at
  * cluster scale the default config triggers on the same shape without
  * tuning). Skew.saltedAggregate's algebraic-aggregate form is spec-level
  * (SkewAndPartitionSpec): Spark's map-side partial aggregation already
  * neutralizes hot-key skew for algebraic aggregates, so a wall-time race
  * there measures nothing — the join is where skew actually bites.
  *
  * Run: sbt "runMain graft.tools.SkewBench [factRows]"
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val factRows = if (args.nonEmpty) args(0).toLong else 20000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    // fact: 50% of rows carry key 0 (the hot key), the rest spread
    // uniformly over 200k keys; dimension: all 200k keys with payload,
    // ~10 MB serialized — above a disabled broadcast threshold by fiat
    val nKeys = 200000L
    val fact = spark.range(factRows).select(
      when(col("id") % 2 === 0, 0L)
        .otherwise(pmod(xxhash64(col("id")), lit(nKeys - 1)) + 1L).as("k"),
      col("id").as("v"))
    val dim = spark.range(nKeys).select(
      col("id").as("k"),
      concat(lit("payload_"), col("id")).as("p"))

    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = body
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    def withConf[A](pairs: (String, String)*)(body: => A): A = {
      val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val common = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // local-corpus thresholds: the hot partition is ~150 MB here;
      // production defaults (256 MB) fire on the same shape at real scale
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16m")

    // 1. AQE skew split ON (default) — and pin the mechanism in the plan
    val (tOn, nOn) = withConf(common: _*) {
      val joined = fact.join(dim, Seq("k"))
      val r = timed(joined.count())
      val plan = joined.queryExecution.executedPlan.toString
      require(plan.contains("skew=true"),
        "AQE did not mark the skewed join — plan:\n" + plan.take(4000))
      r
    }
    println(f"[skew] aqe_skew_on   ${tOn}%8.2f s  rows=$nOn%d  (plan pinned: skew=true)")

    // 2. AQE skew split OFF — the straggler baseline
    val (tOff, nOff) = withConf(
      common :+ ("spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      timed(fact.join(dim, Seq("k")).count())
    }
    println(f"[skew] aqe_skew_off  ${tOff}%8.2f s  rows=$nOff%d")

    // 3. manual salted join, skew split OFF — same result, spread load
    val (tSalt, nSalt) = withConf(
      common :+ ("spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      timed(graft.operators.Skew.saltedJoin(
        fact, dim, Seq("k"), saltBuckets = cpus.toInt).count())
    }
    println(f"[skew] salted_join   ${tSalt}%8.2f s  rows=$nSalt%d  " +
      f"(saltBuckets=$cpus)")

    require(nOn == nOff && nOff == nSalt,
      s"row counts diverged: $nOn / $nOff / $nSalt")
    println(f"[skew] hot-key share=50%% factRows=$factRows%d: " +
      f"aqe_on=${tOn}%.2f s, aqe_off=${tOff}%.2f s, salted=${tSalt}%.2f s")
    spark.stop()
  }
}
