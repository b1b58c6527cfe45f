package graft.sources

import graft.model.Trade
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV trade scan with the reference parser's contract: the parser never
  * fails a row — malformed numeric fields silently become zero-defaults and
  * the *validator* rejects them downstream (reference
  * src/parser/CsvParser.cpp:57-249, src/validator/TradeValidator.hpp:138-141).
  *
  * Spark mapping (SURVEY.md §2.1 S1): explicit schema (never inferSchema),
  * PERMISSIVE mode turns malformed fields into nulls, then `coalesce`
  * replicates the zero/char defaults:
  *   - numeric null -> 0 (from_chars leaves zero-initialized fields)
  *   - side null/empty -> "N", type null/empty -> "M"
  *     (reference CsvParser.cpp:231,237)
  *   - is_pro null -> false
  *
  * Scale: the scan is schema-pruned and parallel per file split; the
  * defaulting projection is codegen'd. Nothing here touches the driver.
  */
object TradeCsv {

  /** Positional column order of the CSV wire format (no `exchange`). */
  val wireColumns: Seq[String] = Trade.csvSchema.fieldNames.toSeq

  /** Write trades in the wire format (for interchange with the reference's
    * own CSV tooling). `is_pro` goes out as 0/1, the reference's spelling
    * (reference src/tools/DataGenerator.hpp:207): its integer from_chars
    * would read a literal "true" as 0, dropping the flag.
    */
  def write(trades: DataFrame, path: String): Unit =
    trades.select(wireColumns.map {
      case "is_pro" => when(col("is_pro"), lit(1)).otherwise(lit(0)).as("is_pro")
      case c        => col(c)
    }: _*)
      .write.mode("overwrite").option("header", "true").csv(path)

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .schema(Trade.csvSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)
    defaulted(raw)
  }

  /** Apply the reference's silent-default semantics to a raw (nullable)
    * trade frame in csv wire order.
    */
  def defaulted(raw: DataFrame): DataFrame = {
    def charDefault(c: String, d: String) =
      when(col(c).isNull || length(trim(col(c))) === 0, lit(d))
        .otherwise(trim(col(c)))
    raw.select(
      coalesce(col("trade_id"), lit(0L)).as("trade_id"),
      coalesce(col("order_id"), lit(0L)).as("order_id"),
      coalesce(col("timestamp"), lit(0L)).as("timestamp"),
      coalesce(col("price"), lit(0.0)).as("price"),
      coalesce(col("volume"), lit(0)).as("volume"),
      coalesce(trim(col("symbol")), lit("")).as("symbol"),
      lit("").as("exchange"),
      charDefault("side", "N").as("side"),
      charDefault("type", "M").as("type"),
      // wire token -> boolean: the reference writes 0/1; legacy engine CSVs
      // wrote true/false. Accept both spellings of truth; everything else
      // (null, "0", "false", malformed) is the zero-default, false.
      coalesce(lower(trim(col("is_pro"))).isin("1", "true"), lit(false))
        .as("is_pro"))
  }
}
