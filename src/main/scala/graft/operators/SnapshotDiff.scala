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

  /** Vocabulary drift between two snapshots — the distribution-shift
    * monitor of an iterated crawl: which tokens appeared, vanished, or
    * changed frequency class between corpus versions. A silent scraper
    * regression (markup leaking into text, a language gate flipping)
    * shows up here as a burst of `added`/`grown` tokens long before it
    * shows up in model metrics.
    *
    * Per token (lowercased, `\s+`-split, empties dropped): occurrence
    * counts on each side, classified `added` (old side absent),
    * `removed` (new side absent), `grown` (new ≥ 2·old), `shrunk`
    * (2·new ≤ old), else `stable`. All-integer comparisons — the 2×
    * frequency-class thresholds multiply rather than divide, so there is
    * no rounding to diverge an oracle. `minCount` drops tokens whose
    * larger-side count is below the floor (hapax noise dominates raw
    * vocabularies; the default keeps everything).
    *
    * Scale: two map-side-combined hash aggregates over exploded tokens
    * (token-count frames are vocabulary-sized, ≪ corpus-sized, same
    * regime as tf-idf q46), then one full-outer equi-join of the two
    * vocabulary frames. Document text never crosses an exchange — only
    * (token, count) rows do.
    */
  def vocabDrift(
      old: DataFrame, cur: DataFrame, textCol: String,
      minCount: Long = 1L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    def counts(df: DataFrame, side: String): DataFrame =
      df.select(explode(filter(split(lower(col(textCol)), "\\s+"),
          t => t =!= "")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as(side))
    counts(old, "old_n").join(counts(cur, "new_n"), Seq("token"), "full_outer")
      .withColumn("status",
        when(col("old_n").isNull, "added")
          .when(col("new_n").isNull, "removed")
          .when(col("new_n") >= lit(2L) * col("old_n"), "grown")
          .when(lit(2L) * col("new_n") <= col("old_n"), "shrunk")
          .otherwise("stable"))
      .withColumn("old_n", coalesce(col("old_n"), lit(0L)))
      .withColumn("new_n", coalesce(col("new_n"), lit(0L)))
      .filter(greatest(col("old_n"), col("new_n")) >= minCount)
      .select(col("token"), col("old_n"), col("new_n"), col("status"))
  }
}
