package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic synthetic trade generator — the Spark-native equivalent of
  * the reference's seeded single-threaded generator (reference
  * src/tools/DataGenerator.hpp:49-228): per-symbol random-walk price
  * clamped to [50, 99999], weighted symbol choice, uniform volume 10–5000,
  * 50/50 side, 30/60/10 M/L/I type mix, 20% is_pro, monotonic ns timestamps
  * with uniform jittered gaps.
  *
  * Same seed => same data (the reference's reproducibility contract,
  * DataGenerator.hpp:46-52). Unlike `rand(seed)` — whose values depend on
  * partition layout and row position, so they change with parallelism and
  * plan shape — every pseudo-random draw here is a pure hash of (id, salt,
  * seed): bit-identical on any cluster layout, any number of executors, and
  * across re-evaluations of the plan.
  *
  * Scale: `spark.range(n)` parallelizes across executors; the only wide op
  * is the per-symbol window for the random-walk cumulative sum — one
  * shuffle on symbol. For extreme row counts generate independent
  * time-sliced batches and union them.
  */
object TradeGenerator {

  val symbols: Seq[(String, Double, Double)] = Seq(
    // (symbol, weight, startPrice) — 10 distinct symbols, skewed weights
    ("RELIANCE", 3, 2850.0), ("TCS", 2, 3900.0), ("HDFCBANK", 2, 1650.0),
    ("INFY", 2, 1500.0), ("ICICIBANK", 1, 1100.0), ("SBIN", 1, 780.0),
    ("BHARTIARTL", 1, 1200.0), ("ITC", 1, 440.0), ("LT", 1, 3600.0),
    ("WIPRO", 1, 520.0))

  /** Uniform (0,1) draw as a pure function of (id, salt, seed). */
  private def u(salt: Int, seed: Long): Column =
    (pmod(xxhash64(col("id"), lit(salt), lit(seed)), lit(1000000007L))
      .cast("double") + 0.5) / 1000000007.0

  /** Standard normal via Box–Muller over two hash draws. */
  private def gauss(salt: Int, seed: Long): Column =
    sqrt(lit(-2.0) * log(u(salt, seed))) *
      cos(lit(2.0 * math.Pi) * u(salt + 1000, seed))

  def generate(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val totalW = symbols.map(_._2).sum
    val cum = symbols.scanLeft(0.0) { case (acc, (_, w, _)) => acc + w }.tail
    val symPick = {
      val draw = u(0, seed) * totalW
      symbols.zip(cum).foldRight(lit(symbols.last._1)) {
        case (((sym, _, _), c), rest) => when(draw < c, lit(sym)).otherwise(rest)
      }
    }
    val startPrice = symbols.foldRight(lit(100.0)) {
      case ((sym, _, p), rest) => when(col("symbol") === sym, lit(p)).otherwise(rest)
    }

    val base = spark.range(0, n)
      .withColumn("symbol", symPick)
      .withColumn("step", gauss(1, seed) * 0.5)

    val bySym = Window.partitionBy(col("symbol")).orderBy(col("id"))

    base
      // random-walk price: start + cumulative steps, clamped
      .withColumn(
        "price",
        greatest(lit(50.0), least(lit(99999.0),
          startPrice + sum(col("step")).over(
            bySym.rowsBetween(Window.unboundedPreceding, 0)))))
      // Monotonic ns timestamps WITHOUT a global window (a single-partition
      // cumulative sum would serialize the whole dataset): each row owns the
      // slot [id*50µs, id*50µs+45µs), so jittered times never cross rows and
      // stay strictly increasing in id. Gaps are 5–95µs, same regime as the
      // reference's 5–50µs.
      .withColumn(
        "timestamp",
        lit(1700000000000000000L) + col("id") * 50000L +
          (u(2, seed) * 45000).cast("long"))
      .select(
        (col("id") + 1000000L).as("trade_id"),
        (col("id") + 500000L).as("order_id"),
        col("timestamp"),
        round(col("price"), 2).as("price"),
        (u(3, seed) * 4990 + 10).cast("int").as("volume"),
        col("symbol"),
        lit("GEN").as("exchange"),
        when(u(4, seed) < 0.5, "B").otherwise("S").as("side"),
        when(u(5, seed) < 0.3, "M")
          .when(u(5, seed) < 0.9, "L").otherwise("I").as("type"),
        (u(6, seed) < 0.2).as("is_pro"))
  }
}
