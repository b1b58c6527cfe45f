package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the versioning primitive of an iterated
  * training-data pipeline (what changed between crawl N and crawl N+1,
  * which shards need re-dedup/re-tokenization). The reference engine's
  * analogue is re-running the whole batch ETL (reference
  * src/main.cpp:13-145); the diff makes incremental refresh possible.
  *
  * Scale shape: each side is projected to (id, digest) BEFORE the join,
  * so only two 8+32-byte columns cross the full-outer exchange — document
  * text never moves. One shuffle per side on id; at 100 TB both sides
  * would be bucketed by id and the exchange disappears entirely.
  * Content equality is digest equality (md5 here, same contract as
  * [[Dedup]]'s exact pass): a collision would need 2^64 docs per corpus.
  */
object SnapshotDiff {

  /** Per-id status between two snapshots: `added` (only in `cur`),
    * `removed` (only in `old`), `changed` (both, digest differs),
    * `unchanged` (both, digest equal).
    */
  def diff(
      old: DataFrame, cur: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // presence is a marker column, NOT digest nullness: md5(null text) is
    // null, so a null-text doc present on one side would otherwise be
    // misclassified (e.g. 'added' for a row that was removed). Digests
    // compare null-safely (<=>) so null text == null text is 'unchanged'.
    val o = old.select(col(idCol).as("id"), md5(col(textCol)).as("__od"),
      lit(true).as("__inOld"))
    val c = cur.select(col(idCol).as("id"), md5(col(textCol)).as("__cd"),
      lit(true).as("__inCur"))
    o.join(c, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__inOld").isNull, "added")
          .when(col("__inCur").isNull, "removed")
          .when(!(col("__od") <=> col("__cd")), "changed")
          .otherwise("unchanged"))
      .select(col("id"), col("status"))
  }

  /** Aggregate diff report: one row per status with counts. */
  def report(
      old: DataFrame, cur: DataFrame,
      idCol: String, textCol: String): DataFrame =
    diff(old, cur, idCol, textCol)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"))
}
