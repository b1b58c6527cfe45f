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

  /** Apply a keyed changeset to a corpus snapshot — the MERGE step that
    * completes the incremental-refresh loop [[diff]] opens (diff says
    * WHAT changed; this applies it without re-running the whole batch).
    * `changes` carries every corpus column plus `opCol` ∈
    * {"upsert", "delete"}: delete drops the corpus row with that id,
    * upsert replaces it (or inserts when absent). The changeset must be
    * KEYED — at most one change per id; duplicate ids or unknown ops
    * fail loudly (a silent last-wins would need an ordering column the
    * CDC contract doesn't carry).
    *
    * Scale shape: result = corpus LEFT ANTI changeset-ids ∪ upsert
    * payloads — ONE equi-join on id against a changeset that is tiny
    * relative to the corpus (broadcastable), plus a union. The corpus
    * is touched exactly once and never rewritten where no change
    * landed; pair with [[graft.sinks.Sinks.backfillPartitions]] to
    * confine the physical rewrite to the partitions the changeset hits.
    * The validation aggregate is one bounded action over the
    * changeset-sized frame (the [[TextAnalysis.nbQualityScores]]
    * precedent for fail-fast over silent NaN/dup corruption).
    */
  def applyChangeset(
      corpus: DataFrame,
      changes: DataFrame,
      idCol: String,
      opCol: String = "op"): DataFrame = {
    val dataCols = corpus.columns.toSeq
    require(changes.columns.contains(opCol),
      s"changeset must carry the op column '$opCol'")
    require(dataCols.forall(changes.columns.contains),
      s"changeset must carry every corpus column; missing " +
        dataCols.filterNot(changes.columns.contains).mkString(", "))
    val keyed = changes.transform(graft.CacheScope.persisted)
    val checkRow = keyed
      .agg(
        sum(when(!col(opCol).isin("upsert", "delete"), 1L).otherwise(0L))
          .as("bad_ops"),
        (count(lit(1)) - countDistinct(col(idCol))).as("dup_ids"))
      .collect()(0)
    require(checkRow.getLong(0) == 0,
      s"changeset has ${checkRow.getLong(0)} rows with ops outside {upsert, delete}")
    require(checkRow.getLong(1) == 0,
      s"changeset has duplicate ids (${checkRow.getLong(1)} extra rows); " +
        "at most one change per id")
    corpus
      .join(keyed.select(col(idCol)), Seq(idCol), "left_anti")
      .unionByName(
        keyed.filter(col(opCol) === "upsert").select(dataCols.map(col): _*))
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
