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

  /** Split documents into fixed-token-budget context-window chunks — the
    * counterpart of [[packSequences]] for documents LONGER than the
    * budget: packing concatenates short documents up to the budget,
    * chunking cuts long ones down to it. Emits one row per (document,
    * chunk): `chunk` 0..ceil(n/budget)-1 and `chunk_tokens` = budget for
    * every chunk but possibly the last (the remainder; a document shorter
    * than the budget is one chunk of its own length). Token counts are
    * conserved: sum(chunk_tokens) == sum(tokenCol). Pure integer
    * arithmetic over a generated sequence — deterministic across runs,
    * partitionings, and engines, no shuffle at all (chunking is per-row;
    * the explode multiplies rows in place).
    */
  def chunkDocuments(
      df: DataFrame, idCol: String, tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val checked = df.withColumn(tokenCol,
      when(col(idCol).isNull || col(tokenCol).isNull || col(tokenCol) <= 0,
        raise_error(lit(s"chunkDocuments: null/non-positive $idCol/$tokenCol row")))
        .otherwise(col(tokenCol)))
    // integral ceil-division (`div`, not `/` — true division yields DOUBLE
    // and misrounds past ~2^44; same rule as packSequences)
    val nChunks = call_function("div",
      col(tokenCol) + lit(budget - 1), lit(budget)).cast("long")
    checked
      .withColumn("chunk", explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("chunk_tokens",
        least(lit(budget), col(tokenCol) - col("chunk") * budget))
  }

  /** [[chunkTexts]] with OVERLAP: a sliding window of `window` tokens
    * advancing by `stride` (< window ⇒ consecutive chunks share
    * window − stride tokens) — the retrieval-indexing chunker: a passage
    * that straddles one chunk's boundary is fully contained in a
    * neighbor, so boundary placement cannot hide it from search.
    * stride = window degenerates to [[chunkTexts]]' disjoint layout.
    * Chunk c starts at token c·stride; the last chunk is the first one
    * whose window reaches the end (all integral arithmetic, same `div`
    * ceil-division rule as [[chunkDocuments]]). Zero-token documents
    * drop. Adds (chunk, chunk_start, chunk_text, chunk_tokens).
    *
    * Scale: identical map-side shape to [[chunkTexts]] — per-row explode
    * of codegen'd builtins, no exchange; the data-volume multiplier is
    * window/stride by construction, chosen by the caller.
    */
  def slidingChunks(
      df: DataFrame, textCol: String, window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    df.withColumn("__toks", toks)
      .withColumn("__nt", size(col("__toks")).cast("long"))
      .filter(col("__nt") > 0)
      .withColumn("chunk", explode(sequence(lit(0L),
        when(col("__nt") <= window, lit(0L))
          .otherwise(call_function("div",
            col("__nt") - window + (stride - 1), lit(stride.toLong))))))
      .withColumn("chunk_start", col("chunk") * stride)
      .withColumn("chunk_text", array_join(
        slice(col("__toks"), (col("chunk_start") + 1).cast("int"),
          lit(window)), " "))
      .withColumn("chunk_tokens",
        least(lit(window.toLong), col("__nt") - col("chunk_start")))
      .drop("__toks", "__nt")
  }

  /** [[chunkDocuments]] with the chunk's actual text: the token array is
    * sliced into budget-sized runs and re-joined, so each output row is a
    * trainable sequence, not just a coordinate. Adds (chunk, chunk_text,
    * chunk_tokens) to every input column; documents with zero tokens are
    * dropped (they have no chunks). Concatenating a document's chunk
    * texts in chunk order reconstructs its single-spaced token stream
    * exactly (spec-pinned) — chunking loses nothing but inter-token
    * whitespace.
    *
    * Scale: tokenize + slice + join are all per-row codegen'd built-ins —
    * the explode multiplies rows map-side, no exchange. Downstream
    * consumers that shuffle (e.g. chunk-level dedup) should project
    * md5(chunk_text) first and ship the hash, not the text.
    */
  def chunkTexts(df: DataFrame, textCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    df.withColumn("__toks", toks)
      .withColumn("__nt", size(col("__toks")).cast("long"))
      .filter(col("__nt") > 0)
      .withColumn("chunk", explode(sequence(lit(0L),
        call_function("div", col("__nt") + (budget - 1), lit(budget.toLong)) - 1)))
      .withColumn("chunk_text", array_join(
        slice(col("__toks"), (col("chunk") * budget + 1).cast("int"),
          lit(budget)), " "))
      .withColumn("chunk_tokens",
        least(lit(budget.toLong), col("__nt") - col("chunk") * budget))
      .drop("__toks", "__nt")
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

  /** Materialize the actual training sequences: concatenate each pack's
    * documents in ascending id order (the SAME order [[packSequences]]
    * assigned by, so the text layout is exactly the assignment's walk),
    * separated by a single separator string. This is the last step of
    * the corpus→sequences pipeline — packSequences decides the layout,
    * this produces it. Emits one row per (shard, pack) with `pack_text`,
    * `n_docs`, and `pack_tokens`.
    *
    * Scale: the pack assignment's one shuffle is reused — the
    * concatenation itself is the same in-shard window walk expressed as
    * a hash aggregate over (shard, pack) with an order-anchored
    * array_agg (sort_array of (id, text) structs — deterministic
    * regardless of arrival order). A pack's text is budget-bounded by
    * construction (one overflowing doc at most), so rows stay
    * executor-sized at any corpus scale.
    */
  def materializePacks(
      df: DataFrame, idCol: String, textCol: String, tokenCol: String,
      budget: Long, numShards: Int, sep: String = " "): DataFrame =
    packSequences(df, idCol, tokenCol, budget, numShards)
      .groupBy(col("shard"), col("pack"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("pack_tokens"),
        array_join(
          transform(
            sort_array(collect_list(struct(col(idCol), col(textCol)))),
            s => s.getField(textCol)),
          sep).as("pack_text"))

  /** Length-bucket padding profile — the batching-efficiency planner for
    * bucketed (non-packed) training: each document lands in the smallest
    * bucket boundary that holds it, documents longer than the largest
    * boundary are clipped there, and the profile reports what that
    * bucketing scheme costs in padded and truncated tokens. The
    * complement of [[packSequences]]: packing eliminates padding by
    * concatenation, bucketing keeps document boundaries and PAYS padding
    * — this operator prices that choice so the boundaries can be chosen
    * from corpus evidence rather than convention.
    *
    * Per bucket (boundary value, ascending): `n_docs`, `token_total`
    * (pre-clip), `padded_tokens` = Σ(boundary − min(tokens, boundary)),
    * `truncated_tokens` = Σ max(tokens − boundary, 0) (nonzero only in
    * the top bucket), and `utilization_pct` = (Σ min(tokens, boundary) ·
    * 100) div (n_docs · boundary) — integral division, so every output
    * column is an exact integer and an oracle's CASE ladder reproduces
    * the profile bit-for-bit.
    *
    * Scale: the bucket assignment is one codegen'd CASE projection (no
    * join against a boundary table) and the profile is one map-side-
    * combined hash aggregate over ≤|boundaries| groups. Null/non-positive
    * token counts fail fast — same malformed-input contract as
    * [[packSequences]].
    */
  def lengthBucketStats(
      df: DataFrame, idCol: String, tokenCol: String,
      boundaries: Seq[Int]): DataFrame = {
    require(boundaries.nonEmpty, "boundaries must be non-empty")
    require(boundaries.forall(_ > 0), s"boundaries must be positive: $boundaries")
    require(boundaries == boundaries.sorted && boundaries.distinct == boundaries,
      s"boundaries must be strictly increasing: $boundaries")
    val checked = df.withColumn("__nt",
      when(col(idCol).isNull || col(tokenCol).isNull || col(tokenCol) <= 0,
        raise_error(lit(s"lengthBucketStats: null/non-positive $idCol/$tokenCol row")))
        .otherwise(col(tokenCol).cast("long")))
    val top = boundaries.last.toLong
    // smallest boundary >= nt; the ladder tests ascending so the first
    // hit wins, and the over-top case clips to the largest boundary
    val bucket = boundaries.init.foldRight(lit(top)) { (b, rest) =>
      when(col("__nt") <= b, lit(b.toLong)).otherwise(rest)
    }
    checked.withColumn("bucket", bucket)
      .withColumn("__kept", least(col("__nt"), col("bucket")))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("token_total"),
        sum(col("bucket") - col("__kept")).as("padded_tokens"),
        sum(col("__nt") - col("__kept")).as("truncated_tokens"),
        call_function("div",
          sum(col("__kept")) * 100L,
          count(lit(1)) * col("bucket")).as("utilization_pct"))
  }

  /** Content-defined chunking: chunk boundaries chosen by CONTENT (a
    * rolling-window fingerprint hitting a mask), not by fixed offsets —
    * the property that makes chunk-level dedup survive edits. Insert one
    * token into a fixed-size-chunked document and every downstream chunk
    * shifts (all digests change); with content-defined cuts only the
    * chunks touching the edit change, so a near-identical re-crawl
    * re-uses almost all of its chunk digests (the rolling-hash chunking
    * of LBFS/rsync, word-level).
    *
    * Cut rule: a boundary BEFORE token position i (0-based, i >= 1)
    * whenever the k-token gram starting at i has
    * md5-prefix-hash(gram) % mask == 0 — the engine-portable md5 integer
    * rule the sampling family standardizes on, so an oracle replicates
    * cuts exactly. Expected chunk length ≈ mask tokens. Documents
    * shorter than k+1 tokens (no interior gram) are one chunk.
    *
    * Output: one row per chunk — (id, chunk_idx, n_tokens, chunk_text,
    * chunk_digest). Entirely MAP-SIDE (sequence/filter/zip_with array
    * lambdas + one explode): no shuffle, no UDF; dedup aggregations
    * downstream group by digest, never by text.
    */
  def cdcChunks(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, mask: Int = 16): DataFrame = {
    require(k >= 2, s"gram size must be >= 2, got $k")
    require(mask >= 2, s"mask must be >= 2, got $mask")
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    def gramHash(i: Column) = conv(
      substring(md5(array_join(slice(col("__toks"), i + 1, lit(k)), " ")), 1, 8),
      16, 10).cast("long")
    // interior gram starts: 1..n-k (0-based); n <= k has none. The
    // n >= k+1 guard keeps sequence() from generating a DESCENDING
    // range when n - k < 1. TWO structural defenses keep the md5 cut
    // scan at exactly one evaluation per document: (a) the cut list is
    // wrapped in a ONE-ELEMENT-array transform instead of being a
    // separate column — written as a plain __cuts column referenced by
    // starts AND ends, projection collapse inlines it five times;
    // (b) the (id, __chunks) frame is PERSISTED before the explode —
    // otherwise InferFiltersFromGenerate pushes `size(__chunks) > 0`
    // beneath the Generate with the whole expression inlined, where
    // __toks inlines too and every gram hash re-splits the document
    // text: O(n²) re-tokenization, measured 10 s -> 0.9 s at sf0.1.
    df.select(col(idCol).as("id"), toks.as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .withColumn("__chunks",
        flatten(transform(
          array(
            when(col("__n") >= k + 1,
              filter(sequence(lit(1), col("__n") - k),
                i => gramHash(i) % mask === 0))
              .otherwise(array().cast("array<int>"))),
          cuts => zip_with(
            concat(array(lit(0)), cuts),
            concat(cuts, array(col("__n"))),
            (s, e) => array_join(slice(col("__toks"), s + 1, e - s), " ")))))
      .select(col("id"), col("__chunks"))
      .transform(graft.CacheScope.persisted(_))
      .select(col("id"),
        posexplode(col("__chunks")).as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_tokens",
        size(filter(split(col("chunk_text"), "\\s+"), t => t =!= "")))
      .withColumn("chunk_digest", md5(col("chunk_text")))
  }
}
