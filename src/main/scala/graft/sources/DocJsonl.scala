package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL (one JSON document per line) corpus ingestion — the de-facto
  * interchange format for LLM training corpora — with the same
  * strict-schema + dead-letter discipline as the CSV/tick paths
  * (reference src/ingest/CsvParser.hpp:52-88's silent-default philosophy
  * deliberately inverted: nothing is silently coerced; a line either
  * parses against the declared schema or lands in the dead letter with
  * its raw bytes for replay).
  *
  * Scale: spark.read.json with an explicit schema is a streaming
  * line-splitter — no schema inference pass (inference would read the
  * whole 100 TB corpus twice), predicate/column pruning reach the scan,
  * and the file listing parallelizes. PERMISSIVE mode routes unparseable
  * lines into the corrupt-record column instead of failing the job at
  * hour ten.
  */
object DocJsonl {

  val corruptCol = "_corrupt"

  /** Reads `path` as JSONL against `schema`. Returns the frame with
    * `_corrupt` appended: null for clean rows, the raw line for
    * unparseable ones (all data fields null there). Split with
    * [[valid]]/[[deadLetter]].
    *
    * Deliberately a text scan + `from_json`, not `spark.read.json`: the
    * native JSON scan refuses plans that reference ONLY its internal
    * corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    * RECORD_COLUMN — exactly what a dead-letter count does); the text
    * formulation has no such restriction. `from_json` honors
    * columnNameOfCorruptRecord when that column is in its schema, so
    * unparseable lines surface with the raw line in `_corrupt` and all
    * data fields null. A PARSEABLE line with mismatched field types
    * yields null fields without a corrupt mark (PERMISSIVE semantics) —
    * that is a data-quality question for the validation layer, not a
    * parse failure.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val full = StructType(schema.fields :+
      StructField(corruptCol, StringType, nullable = true))
    val parsed = spark.read.text(path)
      .select(col("value"), from_json(col("value"), full, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> corruptCol)).as("__r"))
    // a line holding literal `null` (valid JSON!) parses to a null STRUCT
    // — without the explicit check it would surface as an all-null
    // phantom "valid" row instead of a dead letter
    parsed.select(schema.fieldNames.map(f => col(s"__r.$f").as(f)).toSeq :+
      when(col("__r").isNull, col("value"))
        .otherwise(col(s"__r.$corruptCol")).as(corruptCol): _*)
  }

  /** Rows that parsed cleanly, corrupt column dropped. */
  def valid(df: DataFrame): DataFrame =
    df.filter(col(corruptCol).isNull).drop(corruptCol)

  /** Unparseable lines, raw bytes only — the replayable dead letter. */
  def deadLetter(df: DataFrame): DataFrame =
    df.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))

  /** Writes a frame as JSONL (one `to_json(struct(*))` line per row) —
    * the export side of the round trip; loss-free for string/long/double
    * columns, which is what corpus schemas are made of.
    */
  def write(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .write.mode("overwrite").text(path)
}
