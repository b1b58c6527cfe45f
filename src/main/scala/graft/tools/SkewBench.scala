package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planted-hot-key skew evidence (SURVEY §8): one join key owns 80% of a
  * 20M-row fact side, joined against a dimension too large to broadcast.
  * Three measured variants isolate who handles the skew:
  *
  *   1. aqe_skew_on  — sort-merge join with AQE's OptimizeSkewedJoin
  *      splitting the hot partition at runtime; the final plan is pinned
  *      to contain the `skew=true` marker (hard assertion).
  *   2. aqe_skew_off — the same join with skew splitting disabled: one
  *      task sorts/joins the hot key's 16M rows alone, the straggler
  *      pattern a 1000-executor cluster cannot hide.
  *   3. salted_join  — graft.operators.Skew.saltedJoin with skew
  *      splitting disabled: the manual mitigation for plans where AQE
  *      can't help (e.g. preserving an existing co-partitioning, or a
  *      join inside a cached stage). Row counts of all three variants
  *      are asserted identical.
  *
  * Measured (local[32], 2026-08-14): aqe_on 3.8 s (skew=true pinned),
  * aqe_off 23.9 s (6.3x straggler penalty), salted 6.2 s (3.9x recovered
  * without AQE).
  *
  * The AQE skew thresholds are lowered for the local corpus (production
  * defaults fire at 256 MB — at cluster scale the default config
  * triggers on the same shape without
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

    // fact: 80% of rows carry key 0 (the hot key), so the straggler task
    // joins 16M of 20M rows alone; the rest spread uniformly over 200k
    // keys. dimension: all 200k keys with payload, above the (disabled)
    // broadcast threshold by fiat. v/w are xxhash64 noise: the hot
    // partition must be INCOMPRESSIBLE — rows of a constant key lz4 to
    // almost nothing, and AQE's skew detector reads compressed sizes.
    val nKeys = 200000L
    val fact = spark.range(factRows).select(
      when(col("id") % 5 =!= 0, 0L)
        .otherwise(pmod(xxhash64(col("id")), lit(nKeys - 1)) + 1L).as("k"),
      xxhash64(col("id"), lit(7)).as("v"),
      xxhash64(col("id"), lit(11)).as("w"))
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

    // 1. AQE skew split ON (default) — and pin the mechanism in the plan.
    // The count rides INSIDE the same Dataset whose queryExecution we
    // inspect: a separate .count() would execute a different plan and
    // leave this one's AQE un-finalized (isFinalPlan=false).
    // the aggregate touches v, w and p so column pruning cannot shrink the
    // shuffled rows on either side
    // pmod keeps the SHUFFLED columns raw (incompressible) while the
    // aggregate stays inside long range under ANSI mode
    def probe(j: org.apache.spark.sql.DataFrame) =
      j.agg(count(lit(1)).as("n"), sum(pmod(col("v"), lit(1000000L))).as("sv"),
        sum(pmod(col("w"), lit(1000000L))).as("sw"),
        sum(length(col("p"))).as("sp"))

    val (tOn, nOn) = withConf(common: _*) {
      val joined = probe(fact.join(dim, Seq("k")))
      val r = timed(joined.collect()(0).getLong(0))
      val plan = joined.queryExecution.executedPlan.toString
      require(plan.contains("skew=true"),
        "AQE did not mark the skewed join — plan:\n" + plan.take(4000))
      r
    }
    println(f"[skew] aqe_skew_on   ${tOn}%8.2f s  rows=$nOn%d  (plan pinned: skew=true)")

    // 2. AQE skew split OFF — the straggler baseline
    val (tOff, nOff) = withConf(
      common :+ ("spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      timed(probe(fact.join(dim, Seq("k"))).collect()(0).getLong(0))
    }
    println(f"[skew] aqe_skew_off  ${tOff}%8.2f s  rows=$nOff%d")

    // 3. manual salted join, skew split OFF — same result, spread load
    val (tSalt, nSalt) = withConf(
      common :+ ("spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      // 8 buckets: enough spread to kill the straggler without paying an
      // 8x-larger dim replication than needed
      timed(probe(graft.operators.Skew.saltedJoin(
        fact, dim, Seq("k"), saltBuckets = 8)).collect()(0).getLong(0))
    }
    println(f"[skew] salted_join   ${tSalt}%8.2f s  rows=$nSalt%d  " +
      "(saltBuckets=8)")

    require(nOn == nOff && nOff == nSalt,
      s"row counts diverged: $nOn / $nOff / $nSalt")
    println(f"[skew] hot-key share=80%% factRows=$factRows%d: " +
      f"aqe_on=${tOn}%.2f s, aqe_off=${tOff}%.2f s, salted=${tSalt}%.2f s")
    spark.stop()
  }
}
