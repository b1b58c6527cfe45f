package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (repo TESTDATA.md) and the
  * session configuration every entry point shares.
  *
  * Scale notes (designed for a multi-executor cluster, tested on local[N]):
  *   - The engine's time contract is the reference's: `events.ts` is an
  *     ns-since-epoch Long end-to-end, converted only at presentation
  *     (reference src/model/Trade.hpp:16-38, README.md:242). Upstream
  *     producers are NOT pinned to one parquet physical type — this corpus
  *     has shipped both TIMESTAMP(NANOS) and TIMESTAMP(MICROS, NTZ) across
  *     regenerations — so [[load]] adapts whatever arrives to the ns-long
  *     contract instead of hard-coding one physical encoding (see
  *     [[normalizeNsTs]]). A 100 TB ingest that hard-fails (or silently
  *     flips semantics) on a producer-side type migration is broken.
  *   - `spark.sql.legacy.parquet.nanosAsLong=true`: TIMESTAMP(NANOS) has no
  *     native Spark type (µs precision); with the flag it arrives as a raw
  *     ns Long — already the contract, passed through unchanged.
  *   - AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  *     are what make a fixed `shuffle.partitions` safe at 1000× the data.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = configure(spark).read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeNsTs(df, "ts") else df
  }

  /** Adapt a time column to the engine's ns-epoch Long contract, whatever
    * physical type the producer wrote:
    *   - LongType: already ns-since-epoch (raw longs, or TIMESTAMP(NANOS)
    *     parquet read under `nanosAsLong`) — passed through, zero cost.
    *   - TIMESTAMP / TIMESTAMP_NTZ (µs precision, e.g. parquet
    *     TIMESTAMP(MICROS)): `unix_micros * 1000` — exact integer math,
    *     codegen'd, one narrow projection. NTZ wall-clock is interpreted
    *     as UTC ([[configure]] pins the session zone), matching the
    *     producer's `isAdjustedToUTC=false` µs epochs byte-for-byte.
    *   - anything else: FAIL LOUDLY. A silent flex here is how a µs/ns
    *     confusion ships a 10^3-wrong answer that still "passes rows".
    *
    * Scale note: the projection sits above the scan, so a filter phrased on
    * the normalized column no longer pushes into parquet. Queries that scan-
    * prune on raw event time should filter on the source column before
    * normalization (none of the engine's do — ts predicates are all
    * post-aggregation or validation-time).
    */
  def normalizeNsTs(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType => df
      case TimestampType | TimestampNTZType =>
        df.withColumn(tsCol,
          (unix_micros(col(tsCol).cast(TimestampType)) * lit(1000L)).as(tsCol))
      case other => throw new IllegalArgumentException(
        s"$tsCol: expected ns-epoch LONG or TIMESTAMP[_NTZ], got $other — " +
          "refusing to guess an epoch unit")
    }

  /** Assert columns already satisfy the ns-long contract — for operators
    * whose arithmetic would silently change meaning under a timestamp type
    * (long−long = ns; timestamp−timestamp = INTERVAL, 10^9 off after a
    * naive /1e9). Call at query entry so type drift fails at analysis, not
    * in the answers.
    */
  def requireNsLong(df: DataFrame, cols: String*): DataFrame = {
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt == LongType,
        s"$c must be an ns-epoch LONG (engine time contract), got $dt")
    }
    df
  }

  /** Shared session settings; call before any read. Idempotent. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // driver-side partition discovery for up to 128 partition dirs: the
    // bucket-partitioned index layouts (postings/terms at 64 buckets)
    // cross the default 32-path threshold, so every index read paid a
    // distributed LISTING job — several per probe, a real slice of the
    // persisted-index gates' job storms. Listing 128 dirs on the driver
    // is trivial at any corpus size (cost scales with dir count, not
    // data); genuinely huge partition counts still go distributed.
    spark.conf.set(
      "spark.sql.sources.parallelPartitionDiscovery.threshold", "128")
    // Coalesce post-shuffle partitions by SIZE, not by available
    // parallelism (optimization guide §2.2 "fewer, larger reduce
    // partitions"): with the default parallelismFirst=true, AQE splits
    // even a few-KB shuffle across max-parallelism partitions, so every
    // metadata-sized exchange in the index/estate operators schedules
    // `cpus` near-empty tasks — pure scheduler overhead repeated dozens
    // of times per ingest apply or probe. Size-first coalescing folds
    // those to 1 task while real data stages still split at the
    // advisory size; both knobs are scale-adaptive (bytes-derived), not
    // local-core-count constants. 64 MB advisory (not the 256 MB guide
    // example) keeps sf0.1-class stages parallel enough on 32 cores
    // while the same setting yields 100 MB+ partitions at cluster scale.
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    spark.conf.set(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
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
        .config("spark.sql.extensions", "graft.GraftExtensions")
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
