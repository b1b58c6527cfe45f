package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing for training pipelines: assign documents
  * to fixed-token-budget packs (the concat-and-chunk step that turns a
  * curated corpus into training sequences).
  *
  * Semantics: within a shard, documents are taken in ascending id order
  * and packed greedily and contiguously — document d goes to pack
  * `floor(cum_tokens_before_d / budget)`. A document longer than the
  * budget overflows its pack (it is not split); the NEXT pack starts
  * where the running sum crosses the next budget boundary. Everything is
  * integer arithmetic over a deterministic order, so the assignment is
  * reproducible across runs, partitionings, and engines.
  *
  * Scale: packing is inherently sequential, so the corpus is first
  * sharded by `id % numShards` (engine-portable, no hash dependency) and
  * packed independently within each shard — one shuffle to co-locate
  * shards, one in-shard sort (Spark's window machinery: external sort,
  * spills fine), no driver involvement. At 100 TB pick numShards ≈ a few
  * × executor count; each shard's window is embarrassingly parallel with
  * the others. Pack ids are (shard, pack_in_shard) pairs — globally
  * unique without cross-shard coordination.
  */
object Packing {

  /** Adds (shard, pack) columns to (idCol, tokenCol) rows. */
  def packSequences(
      df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, numShards: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(numShards > 0, "numShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Fail fast on null ids/token counts: sum().over(w) would SKIP a null
    // token while `cum_after - tokenCol` yields a null pack for that row —
    // the document would be silently misplaced into its own null-pack group
    // instead of erroring. Token counts come from upstream tokenStats; a
    // null here is malformed input, not a value to guess at.
    val checked = df.withColumn(tokenCol,
      when(col(idCol).isNull || col(tokenCol).isNull,
        raise_error(lit(s"packSequences: null $idCol/$tokenCol row")))
        .otherwise(col(tokenCol)))
    checked.withColumn("shard", pmod(col(idCol), lit(numShards.toLong)))
      .withColumn("cum_after", sum(col(tokenCol)).over(w))
      // integral division, not floor(double /): a double quotient is
      // correctly rounded but not exact, and near a budget boundary the
      // rounding can land on the next integer once cum exceeds ~2^44
      .withColumn("pack",
        call_function("div", col("cum_after") - col(tokenCol), lit(budget))
          .cast("long"))
      .drop("cum_after")
  }

  /** Per-pack profile: document count, token total, and the budget-excess
    * of the pack (0 for packs that fit; positive when a long document
    * overflowed). All integers.
    */
  def packProfile(
      df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, numShards: Int): DataFrame =
    packSequences(df, idCol, tokenCol, budget, numShards)
      .groupBy(col("shard"), col("pack"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("pack_tokens"),
        greatest(sum(col(tokenCol)) - budget, lit(0L)).as("overflow_tokens"))
}
