package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (repo TESTDATA.md) and the
  * session configuration every entry point shares.
  *
  * Scale notes (designed for a multi-executor cluster, tested on local[N]):
  *   - `spark.sql.legacy.parquet.nanosAsLong=true`: the `events` table stores
  *     TIMESTAMP(NANOS) which Spark cannot represent natively (µs precision).
  *     Reading nanos as raw Long matches the reference engine's own data model
  *     (ns-since-epoch longs, reference src/model/Trade.hpp:16-38) — we keep ns
  *     end-to-end and convert only at presentation, exactly as its SQL does
  *     (reference README.md:242).
  *   - AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  *     are what make a fixed `shuffle.partitions` safe at 1000× the data.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Shared session settings; call before any read. Idempotent. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    GraftExtensions.register(spark)
    spark
  }

  /** Session for tests / ad-hoc mains. Entry points run by the driver
    * (Verify/Bench) build their own session with the same settings.
    */
  def localSession(appName: String, cpus: Int = 32): SparkSession =
    configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(appName)
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        // fresh warehouse per JVM: a stale ./spark-warehouse from an
        // earlier run breaks saveAsTable (LOCATION_ALREADY_EXISTS) because
        // the in-memory catalog starts empty while the directory persists
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft-wh").toString)
        .getOrCreate())
}
