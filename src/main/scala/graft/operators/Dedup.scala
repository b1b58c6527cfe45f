package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines: exact
  * (content-hash), MinHash+LSH near-dup, SimHash, and n-gram Jaccard
  * verification.
  *
  * Scale design (the point of these ops is the 100 TB case):
  *   - Exact dedup is a hash-aggregate on a 128-bit digest — shuffles the
  *     digest + id only, never the text.
  *   - MinHash LSH is the classic shingle -> k-minhash -> band-bucket ->
  *     within-bucket candidate join. The only wide ops are (a) one shuffle
  *     of (band_key, id, signature) rows — O(bands) per doc, text NOT
  *     shuffled — and (b) the candidate-pair verification join, whose size
  *     LSH bounds. No cross join anywhere.
  *   - All per-doc computation is built-in higher-order functions
  *     (transform/aggregate/array_*) -> codegen, no UDFs, no driver loops.
  */
object Dedup {

  /** Word-level shingles (n-grams joined by a space), distinct, empty
    * tokens skipped. n=1 gives the token set itself. Custom expression —
    * the transform/slice/concat_ws formulation is interpreted per position.
    */
  def shingles(textCol: Column, n: Int): Column =
    graft.functions.HashExprs.wordShingles(split(textCol, "\\s+"), n)

  // ---- shared PPJoin core (jaccardPairs + jaccardJoin) -------------------
  // One copy of the machinery both entry points run, so a fix to the ceil
  // guard, the filter math, or the verification path lands in both.

  /** (block..., id, hs) — the hashed-sorted-set form of each doc's shingle
    * set, persisted (feeds the token explosion and the verification
    * joins). See jaccardPairs' scaladoc for the hash-collision bound.
    */
  private def hashedSetBase(
      df: DataFrame, idCol: String, textCol: String,
      bcols: Seq[Column], shingleSize: Int): DataFrame =
    df.select(
        (bcols :+
          col(idCol).as("id") :+
          shingles(col(textCol), shingleSize).as("sh")): _*)
      .filter(size(col("sh")) > 0)
      .withColumn("hs", graft.functions.HashExprs.hashedSortedSet(col("sh")))
      .drop("sh")
      .transform(graft.CacheScope.persisted)

  /** (block..., id, n, tk) — one row per (doc, hashed token). */
  private def explodedToks(base: DataFrame, bcols: Seq[Column]): DataFrame =
    base.select(
      (bcols :+ col("id") :+ size(col("hs")).as("n") :+
        explode(col("hs")).as("tk")): _*)

  /** PPJoin prefix: rank each doc's tokens under the (df, tk) global
    * order and keep rank <= n - ceil(n*c) + 1. The 1e-9 guard stops ceil
    * over a double product from rounding an exact integer up, which
    * would shorten the prefix and lose recall.
    */
  private def ppjoinPrefix(
      toks: DataFrame, dfreq: DataFrame,
      bcols: Seq[Column], blockCols: Seq[String], c: Double): DataFrame = {
    val byDoc = Window
      .partitionBy((bcols :+ col("id")): _*)
      .orderBy(col("df"), col("tk"))
    toks.join(dfreq, blockCols :+ "tk")
      .withColumn("rn", row_number().over(byDoc))
      .filter(col("rn") <=
        col("n") - ceil(col("n") * c - 1e-9) + 1)
  }

  /** PPJoin length + positional filters over a prefix-token equi-join —
    * see jaccardPairs' scaladoc for the proofs. `pairPred` adds the
    * entry point's pair constraint (id_a < id_b for the self-join, none
    * for the bipartite join).
    */
  private def ppjoinCandidates(
      prefixA: DataFrame, prefixB: DataFrame,
      bcols: Seq[Column], blockCols: Seq[String],
      threshold: Double, c: Double,
      pairPred: Column): DataFrame =
    prefixA.toDF((blockCols :+ "id_a" :+ "n_a" :+ "rn_a" :+ "tk"): _*)
      .join(prefixB.toDF((blockCols :+ "id_b" :+ "n_b" :+ "rn_b" :+ "tk"): _*),
        blockCols :+ "tk")
      .filter(pairPred &&
        least(col("n_a"), col("n_b")).cast("double") >=
          greatest(col("n_a"), col("n_b")) * threshold - 1e-9 &&
        (lit(1) + least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")))
          .cast("double") >= (col("n_a") + col("n_b")) * c - 1e-9)
      .select((bcols :+ col("id_a") :+ col("id_b")): _*)
      .dropDuplicates(blockCols :+ "id_a" :+ "id_b")

  /** Exact verification: one allocation-free merge pass per candidate,
    * |A∪B| = |A| + |B| - |A∩B|, emit pairs clearing the threshold.
    */
  private def verifyJaccard(
      candidates: DataFrame, baseA: DataFrame, baseB: DataFrame,
      bcols: Seq[Column], blockCols: Seq[String],
      threshold: Double): DataFrame = {
    val inter = graft.functions.HashExprs.sortedIntersectSize(
      col("hs_a"), col("hs_b"))
    candidates
      .join(
        baseA.select((bcols :+ col("id").as("id_a") :+ col("hs").as("hs_a")): _*),
        blockCols :+ "id_a")
      .join(
        baseB.select((bcols :+ col("id").as("id_b") :+ col("hs").as("hs_b")): _*),
        blockCols :+ "id_b")
      .withColumn("inter", inter)
      .withColumn(
        "jaccard",
        col("inter").cast("double") /
          (size(col("hs_a")) + size(col("hs_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(
        (bcols :+ col("id_a") :+ col("id_b") :+
          round(col("jaccard"), 4).as("jaccard")): _*)
  }

  /** Exact duplicate groups: md5 digest of normalized content. Returns
    * (digest, n_copies, ids) for groups with more than one member, where
    * `ids` is the `maxIds` SMALLEST member ids (sorted) — a deterministic
    * sample, not the full roster. Web corpora have pathologically viral
    * duplicates (millions of copies of one boilerplate page); an unbounded
    * collect_list would build that whole group as a single array row in
    * the agg buffer. The bound is enforced BEFORE aggregation (row_number
    * over the digest partition — external sort, spills fine), so no
    * operator ever holds more than `maxIds` ids per group; n_copies still
    * counts the full group. The groupBy reuses the window's
    * hashpartitioning(digest) — one shuffle total.
    */
  def exactDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      maxIds: Int = 1000): DataFrame = {
    require(maxIds > 0, "maxIds must be positive")
    val byDigest = Window.partitionBy(col("digest"))
    df.select(col(idCol).as("id"), md5(col(textCol)).as("digest"))
      .withColumn("n_copies", count(lit(1)).over(byDigest))
      .filter(col("n_copies") > 1)
      .withColumn("__rn", row_number().over(byDigest.orderBy(col("id"))))
      .filter(col("__rn") <= maxIds)
      .groupBy(col("digest"))
      .agg(
        first(col("n_copies")).as("n_copies"),
        sort_array(collect_list(col("id"))).as("ids"))
  }

  /** Keep one row per distinct digest (first by idCol) — the "dedup" action
    * itself. Equivalent to dropDuplicates on the digest but with a
    * deterministic survivor.
    */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** [[dedupExact]] on the NORMALIZED text (TextAnalysis.normalizeText:
    * lowercase, punctuation folded, whitespace collapsed): removes the
    * trivially-reformatted copies byte-exact dedup misses, at the same
    * cost — one digest window, (digest, id) through the exchange. The
    * q63 oracle partitions by the raw normalized STRING where this
    * partitions by its md5; agreement doubles as the collision check.
    */
  def dedupExactNormalized(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window
      .partitionBy(md5(TextAnalysis.normalizeText(col(textCol))))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Sequence-level exact dedup: context-window chunking
    * (Packing.chunkTexts) followed by GLOBAL chunk dedup — the "dedup the
    * training sequences, not just the documents" stage: a boilerplate
    * passage repeated across thousands of documents collapses to one
    * trainable chunk even when every containing document is unique.
    * Returns every chunk coordinate (idCol, chunk, chunk_tokens, plus
    * carryCols) with `keep` = true on the survivor — the first
    * (id, chunk) per chunk-text digest; filter on `keep` for the
    * pipeline stage, aggregate the flag for audit counts.
    *
    * Scale: md5(chunk_text) is projected BEFORE the survivor window, so
    * the exchange carries (digest, id, chunk, ints) — chunk text never
    * shuffles. One exchange on the digest; survivor choice is
    * deterministic, so re-runs keep identical chunks.
    */
  def chunkDedup(
      df: DataFrame, idCol: String, textCol: String, budget: Int,
      carryCols: Seq[String] = Nil): DataFrame = {
    val projected = Packing.chunkTexts(df, textCol, budget).select(
      md5(col("chunk_text")).as("__h") +: col(idCol) +: col("chunk") +:
        col("chunk_tokens") +: carryCols.map(col): _*)
    val w = Window.partitionBy(col("__h")).orderBy(col(idCol), col("chunk"))
    projected.withColumn("keep", row_number().over(w) === 1)
      .drop("__h")
  }

  /** C4-style LINE-level corpus dedup (Raffel et al. 2020 §2.2 — the
    * reference pipeline dedups whole rows; a web corpus also needs the
    * line-granular pass): a line occurring more than `maxOccurrences`
    * times ACROSS THE CORPUS (navigation chrome, cookie banners, footer
    * boilerplate) is removed from every document, and the documents are
    * reassembled from their surviving lines in order. Returns the input
    * rows plus `clean_text`, `n_lines`, `n_lines_removed`.
    *
    * Scale (the 100 TB shape): line TEXT never crosses an exchange —
    * (1) the frequency pass aggregates md5 digests only; (2) the
    * positions-to-drop pass joins (id, pos, digest) triples against the
    * frequent-digest frame, which is heavy-hitter-sized (lines repeated
    * > maxOccurrences corpus-wide) and broadcasts; (3) the rewrite is a
    * map-side indexed-lambda filter over the original text after one
    * id-equi-join against the drop-position lists (ints, affected docs
    * only — the small side again). No collect, no unbounded state; a
    * pathologically viral line costs one digest row, not an array of its
    * occurrences.
    */
  def lineDedup(
      df: DataFrame, idCol: String, textCol: String,
      maxOccurrences: Long = 1): DataFrame = {
    require(maxOccurrences >= 1, s"maxOccurrences must be >= 1, got $maxOccurrences")
    val freq = df
      .select(explode(split(col(textCol), "\n")).as("__line"))
      .select(md5(col("__line")).as("__h"))
      .groupBy(col("__h")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > maxOccurrences)
      .select(col("__h"))
    val dropPos = df
      .select(
        col(idCol).as("__lid"),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__l")))
      .select(col("__lid"), col("__pos"), md5(col("__l")).as("__h"))
      .join(freq, Seq("__h"))
      .groupBy(col("__lid"))
      .agg(collect_set(col("__pos")).as("__drop"))
    df.join(dropPos, col(idCol) === col("__lid"), "left")
      .withColumn("__kept", filter(
        split(col(textCol), "\n"),
        (l, i) => !coalesce(array_contains(col("__drop"), i), lit(false))))
      .withColumn("clean_text", array_join(col("__kept"), "\n"))
      .withColumn("n_lines", size(split(col(textCol), "\n")).cast("long"))
      .withColumn("n_lines_removed",
        (col("n_lines") - size(col("__kept"))).cast("long"))
      .drop("__lid", "__drop", "__kept")
  }

  /** Substring-span dedup (the ExactSubstr analogue of Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better", at token
    * k-gram granularity): any k-token window whose text occurs more than
    * `maxOccurrences` times ACROSS THE CORPUS marks its k positions as
    * duplicated; overlapping/adjacent marks merge into spans. Returns the
    * input rows plus `n_tokens`, `n_dup_tokens` (positions covered by at
    * least one frequent k-gram), `n_spans` (merged duplicated intervals),
    * and `clean_text` (the surviving tokens, space-joined — the operator
    * is defined over the whitespace-normalized token stream, so untouched
    * documents come back whitespace-collapsed, not byte-identical).
    * Documents shorter than k tokens have no windows and pass through.
    *
    * This catches what document- and line-level dedup cannot: a verbatim
    * boilerplate PASSAGE pasted mid-paragraph into otherwise-unique
    * documents (license blocks, quoted headers) — no full line and no
    * whole document repeats, but every k-gram inside the passage does.
    *
    * Scale (same shape as [[lineDedup]], one granularity down): gram TEXT
    * never crosses an exchange — the frequency pass aggregates md5
    * digests of the k-gram strings; the frequent-digest frame is
    * heavy-hitter-sized (windows repeated > maxOccurrences corpus-wide)
    * and broadcasts into the (id, pos, digest) probe; covered-index
    * expansion, span counting, and the rewrite are map-side array lambdas
    * over affected docs only. Gram construction is map-side O(n·k) chars
    * per doc — the md5-of-string form is what a SQL oracle can replicate
    * verbatim (the raw-string oracle doubles as the collision check); a
    * production 100 TB run swaps in the O(n) rolling polynomial hash
    * already built for winnowing ([[graft.functions.HashExprs]]) without
    * touching any other part of the plan.
    */
  def spanDedup(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, maxOccurrences: Long = 1): DataFrame =
    spanDedupFrom(df, idCol, textCol, k, maxOccurrences) { d =>
      // one row per k-token window: (id, 0-based pos, md5 of gram text).
      // Guard BEFORE building windows: sequence(0, n-k) with n < k would
      // descend through negative positions (and slice(_, 0, _) is an
      // ANSI error), so short docs must never reach the transform.
      d.filter(size(col("__tk")) >= k)
        .withColumn("__g", explode(transform(
          sequence(lit(0), size(col("__tk")) - k),
          i => struct(
            i.as("pos"),
            md5(concat_ws(" ", slice(col("__tk"), i + 1, lit(k)))).as("h")))))
        .select(col("__gid"), col("__g.pos").as("__pos"), col("__g.h").as("__h"))
    }

  /** [[spanDedup]] with the O(n) rolling-hash gram pass
    * ([[graft.functions.HashExprs.PositionalGramHashes]]: xxhash64 token
    * hashes folded under a 2^64 polynomial, one multiply-subtract +
    * multiply-add per step) instead of the O(n·k) md5-of-string build —
    * the production form at 100 TB, where gram construction dominates
    * the map side. Decisions are identical unless two DIFFERENT k-grams
    * collide in the 64-bit codomain (~n²/2^65 expected corpus-wide);
    * q100 runs this path against q98's raw-string oracle, so the gate
    * itself is the collision check.
    */
  def spanDedupFast(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, maxOccurrences: Long = 1): DataFrame =
    spanDedupFrom(df, idCol, textCol, k, maxOccurrences) { d =>
      d.select(col("__gid"),
          posexplode(graft.functions.HashExprs.positionalGramHashes(
            col("__tk"), k)).as(Seq("__pos", "__h")))
    }

  /** Shared frequency -> probe -> rewrite chain for the span-dedup pair;
    * `gramRows` maps (__gid, __tk) to one (__gid, __pos, __h) row per
    * k-token window (any hash type).
    */
  private def spanDedupFrom(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, maxOccurrences: Long)(
      gramRows: DataFrame => DataFrame): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxOccurrences >= 1, s"maxOccurrences must be >= 1, got $maxOccurrences")
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    def grams = gramRows(df.select(col(idCol).as("__gid"), toks.as("__tk")))
    val freq = grams
      .groupBy(col("__h")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > maxOccurrences)
      .select(col("__h"))
    val dupPos = grams
      .join(freq, Seq("__h"))
      .groupBy(col("__gid"))
      .agg(sort_array(collect_set(col("__pos"))).as("__ps"))
    df.join(dupPos, col(idCol) === col("__gid"), "left")
      .withColumn("__tk", toks)
      .withColumn("__cov", when(col("__ps").isNull, array().cast("array<int>"))
        .otherwise(array_distinct(flatten(
          transform(col("__ps"), p => sequence(p, p + k - 1))))))
      .withColumn("n_tokens", size(col("__tk")).cast("long"))
      .withColumn("n_dup_tokens", size(col("__cov")).cast("long"))
      // sorted starts each cover k tokens: a new span begins where the
      // gap to the previous start exceeds k (> k leaves an uncovered
      // token between the two windows; == k is adjacent and merges)
      .withColumn("n_spans", when(col("__ps").isNull, lit(0L)).otherwise(
        (lit(1) + size(filter(
          zip_with(
            slice(col("__ps"), lit(2), greatest(size(col("__ps")) - 1, lit(0))),
            slice(col("__ps"), lit(1), greatest(size(col("__ps")) - 1, lit(0))),
            (a, b) => a - b),
          d => d > k))).cast("long")))
      .withColumn("clean_text", array_join(
        filter(col("__tk"), (t, i) => !array_contains(col("__cov"), i)), " "))
      .drop("__gid", "__ps", "__tk", "__cov")
  }

  /** MinHash signature as an array<long> of length `numHashes`.
    *
    * h_i(s) = (a_i * xxhash64(s) + b_i) mod p over the shingle set; the
    * signature element i is the minimum. (a_i, b_i) derive deterministically
    * from i — no RNG state, so executors compute identical functions.
    *
    * Implemented as a custom Catalyst expression
    * (graft.functions.HashExprs.MinHashSig): the higher-order-function
    * formulation re-hashes every shingle `numHashes` times in interpreted
    * eval — ~60x slower at sf0.1. p = 2^31 - 1 keeps products below 2^62
    * (exact in 64-bit, ANSI-safe).
    */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    graft.functions.HashExprs.minhashSig(shingleSet, numHashes)

  /** (id, shingle-set) frame, persisted: it feeds the band explode AND the
    * verification joins, and the banded frame joins with itself — without
    * materialization Spark recomputes the scan+shingle+signature subplan up
    * to four times (measured ~2x on the whole query). Sketch-sized (ids +
    * small arrays), never the raw text.
    */
  private def shingleDocs(
      df: DataFrame, idCol: String, textCol: String, shingleSize: Int) =
    df.select(
      col(idCol).as("id"),
      shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .transform(graft.CacheScope.persisted)

  /** (id, band, bucket) LSH keys: band key = hash of the band's slice of
    * the minhash signature. ONLY ids + band keys shuffle — shingle arrays
    * would otherwise travel bands-times through the exchange. Shared by the
    * self-join and incremental forms, whose agreement depends on computing
    * byte-identical keys.
    */
  private[graft] def bandedKeys(docs: DataFrame, numHashes: Int, bands: Int) = {
    val rowsPerBand = numHashes / bands
    docs
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .select(
        col("id"),
        posexplode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            b => hash(lit(42), b, concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
          .as(Seq("band", "bucket")))
  }

  /** Exact shingle-set Jaccard for candidate id pairs (left/right id column
    * names given), verified against `threshold`. One join per side.
    */
  private def verifyJaccard(
      candidates: DataFrame,
      leftDocs: DataFrame,
      rightDocs: DataFrame,
      leftId: String,
      rightId: String,
      threshold: Double) =
    candidates
      .join(leftDocs.select(col("id").as(leftId), col("sh").as("sh_a")), leftId)
      .join(rightDocs.select(col("id").as(rightId), col("sh").as("sh_b")), rightId)
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col(leftId), col(rightId), round(col("jaccard"), 4).as("jaccard"))

  /** Candidate near-duplicate pairs via banded LSH over MinHash signatures,
    * verified with exact shingle-set Jaccard.
    *
    * Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold,
    * one row per pair (deduped across bands).
    */
  def minhashNearDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val docs = shingleDocs(df, idCol, textCol, shingleSize)
    val banded = bandedKeys(docs, numHashes, bands)
      .transform(graft.CacheScope.persisted)

    val candidates = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    verifyJaccard(candidates, docs, docs, "id_a", "id_b", threshold)
  }

  /** Incremental near-dup check: which documents of a NEW batch duplicate
    * the EXISTING corpus — the daily-crawl shape, where self-joining the
    * whole (batch ∪ corpus) would re-verify corpus-internal pairs that were
    * already adjudicated. Both sides are banded exactly as in
    * [[minhashNearDuplicates]]; the candidate join is batch-banded ×
    * corpus-banded on (band, bucket), so its size scales with the batch,
    * not the corpus. Output: (new_id, corpus_id, jaccard >= threshold).
    *
    * At 100 TB the corpus side's banded sketch table is the thing to
    * precompute and store (it is id + bands longs per doc); this function
    * accepts the raw corpus and re-derives it, callers with a persisted
    * sketch can join against that directly.
    */
  def minhashNearDuplicatesAgainst(
      newBatch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val nw = shingleDocs(newBatch, idCol, textCol, shingleSize)
    val cp = shingleDocs(corpus, idCol, textCol, shingleSize)
    val candidates = bandedKeys(nw, numHashes, bands)
      .select(col("band"), col("bucket"), col("id").as("new_id"))
      .join(bandedKeys(cp, numHashes, bands)
          .select(col("band"), col("bucket"), col("id").as("corpus_id")),
        Seq("band", "bucket"))
      .select(col("new_id"), col("corpus_id"))
      .dropDuplicates("new_id", "corpus_id")

    verifyJaccard(candidates, nw, cp, "new_id", "corpus_id", threshold)
  }

  /** 64-bit SimHash over the token multiset. For each bit j:
    * vote = Σ_tokens (bit_j(xxhash64(t)) ? +1 : -1); bit j of the
    * fingerprint is set iff vote > 0. Custom expression for the same reason
    * as minhashSignature (single hash per token, primitive bit loop).
    */
  def simhash64(textCol: Column): Column =
    graft.functions.HashExprs.simhash64(split(textCol, "\\s+"))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate candidates via chunk blocking, verified with
    * exact Hamming distance. The fingerprint is split into `maxHamming + 1`
    * contiguous bit chunks: two fingerprints within Hamming distance
    * maxHamming differ in at most maxHamming chunks, so they AGREE on at
    * least one (pigeonhole) — blocking on chunk equality has exact recall
    * for the requested radius, whatever it is. The default radius 3 gives
    * the classic 4 x 16-bit layout.
    *
    * Scale note: recall is exact for any maxHamming <= 63, but each extra
    * chunk is narrower — at maxHamming = 15 the chunks are 4-bit and a
    * random pair collides in some chunk with high probability, so candidate
    * generation degenerates toward all-pairs. Radii above ~6 (9+ bit chunks)
    * trade blocking power for radius; prefer MinHash/Jaccard for loose
    * similarity.
    */
  def simhashNearDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame =
    hammingNearDuplicates(
      df.select(col(idCol), simhash64(col(textCol)).as("__fp64")),
      idCol, "__fp64", maxHamming)

  /** The chunk-blocked Hamming pair search over any PRECOMPUTED 64-bit
    * fingerprint column — the [[simhashNearDuplicates]] core factored
    * out so every 64-bit perceptual hash rides the same machinery
    * (text SimHash, image pHash/dHash
    * [[graft.functions.ImageExprs.imagePHash]]). Same pigeonhole
    * blocking, same exact-recall guarantee, same scale shape: the
    * shuffle carries (chunk, key, id, fp) longs, never the payloads.
    * Null fingerprints (undecodable payloads) drop out — a corrupt
    * blob can't pair.
    */
  def hammingNearDuplicates(
      df: DataFrame,
      idCol: String,
      fpCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 63,
      s"maxHamming must be in [0, 63], got $maxHamming")
    val nChunks = maxHamming + 1
    val widths = Array.tabulate(nChunks)(i => 64 / nChunks + (if (i < 64 % nChunks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _).init
    val chunkKeys = array(offsets.zip(widths).map { case (off, w) =>
      val masked =
        if (w >= 64) col("fp")
        else shiftright(col("fp"), off).bitwiseAND(lit((1L << w) - 1))
      masked
    }: _*)
    val docs = df
      .select(col(idCol).as("id"), col(fpCol).as("fp"))
      .filter(col("fp").isNotNull)
    val chunked = docs.select(
      col("id"), col("fp"),
      posexplode(chunkKeys).as(Seq("chunk", "ckey")))
    val a = chunked.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = chunked.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming64(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Passage-level duplicate candidates via winnowed fingerprints
    * (TextAnalysis.winnowedFingerprints): two documents match iff they
    * share >= `minShared` winnowed k-gram hash minima — by the winnowing
    * guarantee, any common token run of length >= k + window - 1 yields a
    * shared fingerprint, so contiguous copied passages are caught even
    * when whole-document similarity (Jaccard, SimHash) stays low. The
    * complement of the set-level dedup family: jaccardPairs measures bag
    * overlap, this measures CONTIGUOUS overlap.
    *
    * `maxDf` drops stop-fingerprints (a boilerplate passage shared by
    * thousands of documents would otherwise make its bucket quadratic) —
    * same role as the PPJoin hapax/prefix bound and the LSH band cap.
    *
    * Scale: shuffles carry (block, fp, id) longs — fingerprints are
    * ~2/(window+1) of the gram count per doc, text never moves; the pair
    * aggregation is a hash agg on id pairs. The standard inverted-index
    * match shape, same as the decontamination join.
    */
  /** (block..., id, fp) — one row per distinct winnowed fingerprint per
    * doc; shared by the self-join and cross-corpus passage matchers.
    */
  private def winnowFps(
      df: DataFrame, idCol: String, textCol: String,
      bcols: Seq[Column], k: Int, window: Int): DataFrame =
    df.select(
      (bcols :+ col(idCol).as("id") :+
        explode(TextAnalysis.winnowedFingerprints(col(textCol), k, window))
          .as("fp")): _*)

  def winnowedPassageMatches(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String] = Nil,
      k: Int = 3,
      window: Int = 4,
      minShared: Int = 2,
      maxDf: Int = 1000): DataFrame = {
    val bcols = blockCols.map(col)
    // persisted: feeds the frequency count and both join sides
    val fps = winnowFps(df, idCol, textCol, bcols, k, window)
      .transform(graft.CacheScope.persisted)
    val rare = fps.groupBy((bcols :+ col("fp")): _*)
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select((bcols :+ col("fp")): _*)
    val keyed = fps.join(rare, blockCols :+ "fp")
    keyed.select((bcols :+ col("fp") :+ col("id").as("id_a")): _*)
      .join(
        keyed.select((bcols :+ col("fp") :+ col("id").as("id_b")): _*),
        blockCols :+ "fp")
      .filter(col("id_a") < col("id_b"))
      .groupBy((bcols :+ col("id_a") :+ col("id_b")): _*)
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Cross-corpus passage matching: corpus docs sharing >= `minShared`
    * winnowed fingerprints with a REFERENCE document — the contiguous-
    * overlap decontamination member ([[jaccardJoin]] thresholds bag
    * overlap; this catches a verbatim-ish benchmark PASSAGE pasted into
    * a long training document, where whole-document similarity stays
    * low). By the winnowing guarantee, any shared token run of length
    * >= k + window - 1 yields a shared fingerprint.
    *
    * The stop-fingerprint cap applies to the CORPUS side only: that is
    * where boilerplate lives (a fingerprint shared by thousands of
    * corpus docs says "template", not "leak"), and the reference set is
    * small and curated. Shuffles carry (block, fp, id) longs; the pair
    * aggregation is a hash agg — the inverted-index probe shape, with
    * the reference fingerprint table small enough to broadcast at any
    * corpus scale.
    */
  def winnowedPassageMatchesAgainst(
      corpus: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String] = Nil,
      k: Int = 3,
      window: Int = 4,
      minShared: Int = 2,
      maxDf: Int = 1000): DataFrame = {
    val bcols = blockCols.map(col)
    // persisted: the reference fingerprints feed the pre-filter AND the
    // probe join (reference sets are small — this is the broadcast table)
    val refFps = winnowFps(reference, idCol, textCol, bcols, k, window)
      .transform(graft.CacheScope.persisted)
    // semi-join the corpus fingerprints to the reference set BEFORE the
    // frequency count: only fingerprints present in the reference can
    // reach the output, and per-fp corpus df is unchanged for survivors
    // (the semi-join drops whole fp groups, never rows within one), so
    // the cap decision is identical — while the df aggregation input
    // shrinks from the full corpus fingerprint set to the tiny slice
    // that can actually match. Persisted: feeds the cap and the probe.
    val corpusFps = winnowFps(corpus, idCol, textCol, bcols, k, window)
      .join(refFps.select((bcols :+ col("fp")): _*).distinct(),
        blockCols :+ "fp", "left_semi")
      .transform(graft.CacheScope.persisted)
    val rare = corpusFps.groupBy((bcols :+ col("fp")): _*)
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select((bcols :+ col("fp")): _*)
    corpusFps.join(rare, blockCols :+ "fp")
      .select((bcols :+ col("fp") :+ col("id").as("id_a")): _*)
      .join(
        refFps.select((bcols :+ col("fp") :+ col("id").as("id_b")): _*),
        blockCols :+ "fp")
      .groupBy((bcols :+ col("id_a") :+ col("id_b")): _*)
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Exact pairwise n-gram Jaccard >= threshold within a blocking key, via
    * prefix-filtered set-similarity join (the PPJoin family): instead of the
    * quadratic block-wise cross join, a pair is a candidate only if the two
    * docs share a token inside their rare-token prefixes, then candidates
    * are verified with exact intersect/union. Output is IDENTICAL to the
    * brute-force form; only the candidate generation is smarter.
    *
    * Correctness of the prefix length l_X = |X| - ceil(c*|X|) + 1 with
    * c = t/(1+t): J(A,B) >= t implies the overlap o satisfies
    * o >= ceil(c(|A|+|B|)) >= ceil(c|A|) + ceil(c|B|) - 1, and two sorted
    * sets whose prefixes are disjoint have o <= (|A|-l_A) + (|B|-l_B)
    * = ceil(c|A|) + ceil(c|B|) - 2 — contradiction, so the prefixes of any
    * qualifying pair intersect. Tokens are ordered rarest-first (document
    * frequency within the block), which keeps prefix collisions — and hence
    * candidates and shuffle volume — small.
    *
    * Scale: shuffles carry (block, token, id) triples and candidate id
    * pairs, never full texts; the expensive exact verification runs only on
    * candidates. This is the 100 TB path for all-pairs similarity.
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      shingleSize: Int,
      threshold: Double): DataFrame = {
    // t <= 0 would promise the full cross product (J = 0 pairs qualify),
    // which no shared-token join can generate — reject the degenerate
    // contract instead of silently under-delivering
    require(threshold > 0 && threshold <= 1,
      s"jaccard threshold must be in (0, 1], got $threshold")
    val bcols = blockCols.map(col)
    // base is persisted (hashedSetBase): it feeds tokenization and both
    // verification joins, and the prefix self-joins with itself (see
    // minhashNearDuplicates note). `hs` is the hashed-sorted-set form of
    // the shingle set: pairwise intersection sizes then cost one
    // allocation-free merge pass over long arrays instead of
    // array_intersect+array_union over strings (measured ~2x on the whole
    // query at sf0.1). A 61-bit hash collision would perturb a count with
    // probability ~(n_tokens^2 / 2^61) per pair — negligible against the
    // corpus (~10^-9 end to end).
    val base = hashedSetBase(df, idCol, textCol, bcols, shingleSize)

    // hashed token -> per-block document frequency (rare-first global
    // order); prefix shuffles carry longs, never strings
    val toks = explodedToks(base, bcols)
    val dfreq = toks.groupBy((bcols :+ col("tk")): _*)
      .agg(count(lit(1)).as("df"))

    val c = threshold / (1.0 + threshold)
    val prefix = ppjoinPrefix(toks, dfreq, bcols, blockCols, c)
      // hapax pruning: a prefix occurrence of a df=1 token can only ever
      // self-join (killed by id_a < id_b downstream), so it shuffles for
      // nothing. Recall-neutral — any SHARED token has df >= 2 — and on a
      // Zipf-distributed real corpus hapaxes are ~half the token types, so
      // this halves the prefix exchange. rn is computed BEFORE this filter,
      // so positional bounds are unchanged.
      .filter(col("df") >= 2)
      .select((bcols :+ col("id") :+ col("n") :+ col("rn") :+ col("tk")): _*)
      .transform(graft.CacheScope.persisted)

    // length filter (PPJoin): J(A,B) >= t forces |A∩B| >= t·|A∪B|, and with
    // |A∩B| <= min, |A∪B| >= max this gives min(|A|,|B|) >= t·max(|A|,|B|);
    // pairs violating it are pruned BEFORE the pair-dedup shuffle and the
    // verification joins (same 1e-9 guard as the prefix bound).
    //
    // positional filter (PPJoin): both sides order tokens identically
    // (df, tk), so a shared prefix token at 1-based ranks (rn_a, rn_b)
    // bounds the overlap: beyond this token each side has at most
    // n - rn tokens left, hence o <= 1 + min(n_a - rn_a, n_b - rn_b).
    // J >= t needs o >= c·(n_a + n_b); occurrences whose bound falls short
    // are dropped. A qualifying pair's FIRST shared prefix token satisfies
    // the bound (it is the standard PPJoin check), and the pair survives if
    // ANY occurrence passes — a superset of classic PPJoin's candidates, so
    // recall is untouched while the pair-dedup shuffle and verification
    // joins shrink.
    val candidates = ppjoinCandidates(
      prefix, prefix, bcols, blockCols, threshold, c,
      pairPred = col("id_a") < col("id_b"))

    // exact verification on candidates only: one merge pass per pair,
    // |A∪B| = |A| + |B| - |A∩B|
    verifyJaccard(candidates, base, base, bcols, blockCols, threshold)
  }

  /** Cross-corpus (R-S) exact Jaccard join: corpus docs whose n-gram
    * Jaccard with ANY right-side doc clears `threshold` — the
    * similarity-based decontamination member of the family (q50's exact
    * gram join flags ANY shared gram, q67 counts them; this thresholds
    * the actual set similarity, which is what "the benchmark is
    * paraphrased in the training set" needs). Same PPJoin machinery as
    * [[jaccardPairs]] specialised to two relations:
    *
    *  - tokens rank under ONE shared order — (combined df, token) from an
    *    INNER join of the two sides' per-token document frequencies. The
    *    inner join IS the R-S hapax analogue, and strictly stronger: a
    *    token absent from either side can never be shared, so it never
    *    shuffles (on disjoint-vocabulary corpora the prefix exchange is
    *    empty).
    *  - ranking over shared-only tokens keeps every filter SOUND: a
    *    doc's shared-token rank rn' <= its full-order rank rn, so the
    *    prefix condition rn' <= p and the positional bound
    *    1 + min(n_a - rn'_a, n_b - rn'_b) both admit a superset of the
    *    classic PPJoin candidates (n is still the FULL set size) — and
    *    exact verification then restores precision.
    *  - no id_a < id_b: the relation is bipartite (corpus_id, right_id).
    *
    * Scale shape is jaccardPairs': (block, token-hash, id) longs through
    * the exchanges, texts never move, verification only on candidates.
    */
  def jaccardJoin(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      shingleSize: Int,
      threshold: Double): DataFrame = {
    // same degenerate-contract rejection as jaccardPairs
    require(threshold > 0 && threshold <= 1,
      s"jaccard threshold must be in (0, 1], got $threshold")
    val bcols = blockCols.map(col)
    val baseL = hashedSetBase(left, idCol, textCol, bcols, shingleSize)
    val baseR = hashedSetBase(right, idCol, textCol, bcols, shingleSize)
    val toksL = explodedToks(baseL, bcols)
    val toksR = explodedToks(baseR, bcols)
    // shared-token frequency table: inner join of per-side dfs
    val dfreq = toksL.groupBy((bcols :+ col("tk")): _*)
      .agg(count(lit(1)).as("dfl"))
      .join(toksR.groupBy((bcols :+ col("tk")): _*)
        .agg(count(lit(1)).as("dfr")), blockCols :+ "tk")
      .withColumn("df", col("dfl") + col("dfr"))
      .select((bcols :+ col("tk") :+ col("df")): _*)
      // persisted: feeds BOTH sides' prefix joins (shared-vocab sized)
      .transform(graft.CacheScope.persisted)
    val c = threshold / (1.0 + threshold)
    // n is the FULL set size while ranks run over shared-only tokens, so
    // each subset-ranked prefix is a superset of the classic one (see
    // scaladoc) — sound, with exact verification restoring precision
    def prefix(t: DataFrame): DataFrame =
      ppjoinPrefix(t, dfreq, bcols, blockCols, c)
        .select((bcols :+ col("id") :+ col("n") :+ col("rn") :+ col("tk")): _*)
    val candidates = ppjoinCandidates(
      prefix(toksL), prefix(toksR), bcols, blockCols, threshold, c,
      pairPred = lit(true))
    verifyJaccard(candidates, baseL, baseR, bcols, blockCols, threshold)
  }

  /** ASYMMETRIC containment join: needle documents whose shingle set is
    * (near-)fully contained in a haystack document —
    * c(A→B) = |A∩B| / |A| >= threshold. Jaccard misses exactly this
    * case: a 100-token excerpt quoted inside a 10,000-token page has
    * J ≈ 0.01 but containment 1.0, and excerpt/quote/boilerplate-
    * embedding duplicates are the common web-corpus contamination the
    * symmetric operators cannot see (the set-containment-join setting of
    * Melnik & Garcia-Molina, and the C4/Gopher quote-dedup motivation).
    *
    * Prefix filter is one-sided, which is the structural difference from
    * PPJoin: c(A→B) >= t bounds the overlap by t·|A| REGARDLESS of |B|,
    * so A keeps the classic rarest-first prefix of length
    * |A| − ceil(t·|A|) + 1 (disjoint prefix ⇒ overlap ≤ |A| − l_A =
    * ceil(t|A|) − 1 < t|A|, contradiction), while B has no usable prefix
    * (a huge B can contain any A) and contributes ALL its shared-vocab
    * tokens, ranked only for the positional filter. Candidates must
    * still clear |B| >= t·|A| (overlap ≤ |B|) and the positional bound
    * overlap ≤ 1 + min(|A|−rn_A, |B|−rn_B); verification recomputes the
    * exact hashed-set intersection. Output: (id_a, id_b, n_a, inter,
    * containment) — needle, haystack, needle set size, overlap, ratio.
    *
    * Scale shape: identical to [[jaccardJoin]] — shared-vocabulary df
    * table persisted and reused by both sides, shuffles carry (token,
    * id) postings and id pairs, texts never move. The B side skipping
    * its prefix cut means candidate volume is governed by the NEEDLE
    * prefixes being rare-token-anchored — the right trade, because the
    * needle set (dedup queries, benchmark passages) is the small side at
    * corpus scale.
    */
  def containmentJoin(
      needles: DataFrame,
      haystacks: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      shingleSize: Int,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"containment threshold must be in (0, 1], got $threshold")
    val bcols = blockCols.map(col)
    val baseA = hashedSetBase(needles, idCol, textCol, bcols, shingleSize)
    val baseB = hashedSetBase(haystacks, idCol, textCol, bcols, shingleSize)
    val toksA = explodedToks(baseA, bcols)
    val toksB = explodedToks(baseB, bcols)
    val dfreq = toksA.groupBy((bcols :+ col("tk")): _*)
      .agg(count(lit(1)).as("dfl"))
      .join(toksB.groupBy((bcols :+ col("tk")): _*)
        .agg(count(lit(1)).as("dfr")), blockCols :+ "tk")
      .withColumn("df", col("dfl") + col("dfr"))
      .select((bcols :+ col("tk") :+ col("df")): _*)
      .transform(graft.CacheScope.persisted)
    def ranked(t: DataFrame, c: Double): DataFrame =
      ppjoinPrefix(t, dfreq, bcols, blockCols, c)
        .select((bcols :+ col("id") :+ col("n") :+ col("rn") :+ col("tk")): _*)
    // A: classic prefix at c = threshold; B: c = 0 keeps every shared
    // token (rank <= n - ceil(-1e-9) + 1 = n + 1), ranks retained for
    // the positional filter only.
    val candidates = ranked(toksA, threshold)
      .toDF((blockCols :+ "id_a" :+ "n_a" :+ "rn_a" :+ "tk"): _*)
      .join(
        ranked(toksB, 0.0)
          .toDF((blockCols :+ "id_b" :+ "n_b" :+ "rn_b" :+ "tk"): _*),
        blockCols :+ "tk")
      .filter(
        col("n_b").cast("double") >= col("n_a") * threshold - 1e-9 &&
          (lit(1) + least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")))
            .cast("double") >= col("n_a") * threshold - 1e-9)
      .select((bcols :+ col("id_a") :+ col("id_b")): _*)
      .dropDuplicates(blockCols :+ "id_a" :+ "id_b")
    val inter = graft.functions.HashExprs.sortedIntersectSize(
      col("hs_a"), col("hs_b"))
    candidates
      .join(
        baseA.select((bcols :+ col("id").as("id_a") :+ col("hs").as("hs_a")): _*),
        blockCols :+ "id_a")
      .join(
        baseB.select((bcols :+ col("id").as("id_b") :+ col("hs").as("hs_b")): _*),
        blockCols :+ "id_b")
      .withColumn("inter", inter)
      .withColumn("containment",
        col("inter").cast("double") / size(col("hs_a")))
      .filter(col("containment") >= threshold)
      .select(
        (bcols :+ col("id_a") :+ col("id_b") :+
          size(col("hs_a")).as("n_a") :+ col("inter") :+
          round(col("containment"), 4).as("containment")): _*)
  }

  /** Connected components over an undirected pair relation — the step that
    * turns near-duplicate PAIRS (minhash/simhash/jaccard output) into
    * dedup CLUSTERS. Returns (id, component) where component = the
    * smallest id reachable from `id`; only pair-participating ids appear
    * (an unpaired document is trivially its own cluster and needs no row).
    *
    * Execution is hybrid: pair lists up to `driverCutoff` (default 4M —
    * 64 MB of longs, a documented bounded collect; raised from 2M when
    * the sf0.1 PPJoin graph measured 2.29M pairs and paid the
    * distributed loop's ~10 scheduler round-trips for a graph that
    * union-finds in well under a second) run path-compressed
    * union-find on the driver, because an iterative distributed loop
    * costs ~10 scheduler round-trips of fixed overhead that dwarf the
    * actual work on small graphs. Larger graphs take the distributed
    * contraction loop; both paths are spec-pinned to identical output.
    *
    * Distributed algorithm: min-star CONTRACTION, not propagation. Each
    * round computes m(v) = min(v, neighbors(v)), composes it into the
    * id->representative map, and REWRITES the edge set through m (dropping
    * self-loops, deduping). The graph therefore shrinks every round —
    * a clique collapses to nothing in one round — and the loop ends when
    * no edges remain. Plain propagation re-shuffles the FULL edge set
    * every round (measured 19 s on the sf0.1 pair graph, 4.6M directed
    * edges); contraction pays O(E) only while E lasts (same graph: ~5 s).
    * Rounds are bounded by the contracted graph's shrinking diameter —
    * near-dup graphs are clique-ish and finish in 2-4 rounds; the min-map
    * is pointer-jumped (composed with itself three times, lazily) before
    * each rewrite, so even a pure N-path worst case contracts ~8 nodes per
    * round. `maxIter` guards the remainder and hitting the bound raises
    * rather than returning partial labels.
    *
    * Scale: every step is a shuffle join/aggregate on the current
    * (shrinking) edge set; the id->rep map is one O(V) join per round.
    * Materialization is kept to the minimum that bounds recomputation:
    * each round's edge set is persisted in memory (and the previous
    * round's dropped), the small min-maps are localCheckpoint'ed (they
    * anchor the label chain, severing its lineage), and the label
    * composition itself stays lazy until the caller's action — rounds
    * are few (graphs collapse), so plan depth stays shallow.
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String, maxIter: Int = 20,
      driverCutoff: Long = 4000000L): DataFrame = {
    // Track exactly the frames THIS call persists/checkpoints, so the final
    // sweep can't touch anything else. (A global getPersistentRDDs diff is
    // wrong here: Dataset caches register their RDD lazily at first
    // materialization, so a CALLER's pre-existing persist that first
    // materializes during our half.count() would land in the diff and get
    // unpersisted — silently recomputing the caller's expensive subplan on
    // every later action. Same for RDDs persisted concurrently by other
    // threads.)
    val ownChk = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def chk(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(true); ownChk += c; c
    }
    val half = pairs.select(col(aCol).cast("long").as("s"), col(bCol).cast("long").as("t"))
      .transform(graft.CacheScope.persisted)
    val pairCount = half.count()
    // Hybrid execution: below the cutoff the whole edge list fits easily
    // on the driver (2M pairs = 32 MB of longs) and path-compressed
    // union-find answers in milliseconds, where the iterative distributed
    // loop pays ~10 scheduler round-trips of fixed overhead regardless of
    // size. Above it, the contraction loop below is the only option —
    // same semantics, spec-pinned equal (DedupSpec runs both paths on the
    // same graphs). This is the standard shape for iterative graph steps
    // on mostly-small inputs; the cutoff is a documented, bounded collect.
    if (pairCount <= driverCutoff) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      half.select(col("s"), col("t")).as[(Long, Long)].collect().foreach {
        case (a, b) =>
          parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { // union by MIN so every root is its component min
            if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
          }
      }
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
      parent.keySet().forEach(v => out += ((v, find(v))))
      half.unpersist(blocking = false) // consumed by the collect above
      return out.toSeq.toDF("id", "component")
    }
    var edges = half
      .union(half.select(col("t").as("s"), col("s").as("t")))
      .filter(col("s") =!= col("t"))
      .distinct()
      .transform(graft.CacheScope.persisted)
    // checkpointed: the label chain's root — without it the final action
    // would re-derive the (by then unpersisted) original edge set, i.e.
    // recompute the caller's whole pair join
    var labels = chk(edges.select(col("s").as("id")).distinct()
      .withColumn("label", col("id")))
    var eCount = edges.count()
    var i = 0
    // m(f) composed with itself: rep'(v) = f(f(v)) — pointer jumping. Each
    // lazy composition doubles how far a representative chain is followed
    // in one round; three compositions give m^8, turning the path-graph
    // worst case from O(diameter) rounds into O(diameter / 8) without any
    // extra driver actions (the joins fold into the round's single plan).
    def jump(f: DataFrame): DataFrame = {
      val g = f.select(col("mid").as("jmid"), col("rep").as("jrep"))
      f.join(g, f("rep") === g("jmid"), "left")
        .select(col("mid"), coalesce(col("jrep"), col("rep")).as("rep"))
    }
    while (eCount > 0 && i < maxIter) {
      // m: contracted-node -> new representative (min of self + neighbors),
      // pointer-jumped to m^8; localCheckpoint severs the label chain's
      // lineage at this (small) table
      val m = chk(jump(jump(jump(
        edges.groupBy(col("s").as("mid"))
          .agg(min(col("t")).as("nmin"))
          .select(col("mid"), least(col("mid"), col("nmin")).as("rep"))))))
      // compose lazily: label'(v) = m(label(v)); the left join only misses
      // nodes whose entire component already contracted away (keep label)
      labels = labels
        .join(m, labels("label") === m("mid"), "left")
        .select(col("id"), coalesce(col("rep"), col("label")).as("label"))
      // rewrite the graph through m and drop collapsed structure
      val prev = edges
      edges = prev
        .join(m.select(col("mid").as("s"), col("rep").as("rs")), Seq("s"))
        .join(m.select(col("mid").as("t"), col("rep").as("rt")), Seq("t"))
        .select(col("rs").as("s"), col("rt").as("t"))
        .filter(col("s") =!= col("t"))
        .distinct()
        .transform(graft.CacheScope.persisted)
      eCount = edges.count()
      prev.unpersist(false)
      i += 1
    }
    require(eCount == 0, s"connectedComponents did not converge in $maxIter rounds")
    // materialize the answer once, then free every intermediate this call
    // checkpointed/persisted (the m chain, per-round edge sets): the
    // returned frame is anchored at its OWN checkpoint, so the
    // intermediates' storage is no longer reachable from it. Without the
    // sweep each call leaks checkpoint RDDs until GC (localCheckpoint
    // storage is not cache-manager-managed, so CacheScope cannot see it).
    // The sweep releases only the frames tracked in ownChk plus our two
    // persisted frames — never global state.
    val result = labels.select(col("id"), col("label").as("component"))
      .localCheckpoint(true)
    half.unpersist(blocking = false)
    edges.unpersist(blocking = false) // final (empty) round's edge set
    ownChk.foreach { df =>
      org.apache.spark.sql.graft.ColumnBridge.checkpointRdd(df)
        .foreach(_.unpersist(blocking = false))
    }
    result
  }

  /** Near-duplicate survivorship: drop every document whose component
    * label is not its own id — i.e. keep the min-id member of each
    * near-dup cluster plus all unpaired documents. `pairs` must use
    * `idCol`'s values in (aCol, bCol).
    */
  def dedupNear(
      df: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Preference-ranked near-duplicate survivorship: keep, per cluster,
    * the member with the HIGHEST `prefCol` (ties broken by smallest id)
    * instead of [[dedupNear]]'s smallest-id rule. This is the form real
    * curation pipelines want — when a boilerplate-stripped page and its
    * raw crawl twin collide, keep the cleaner one, not the one that
    * happened to be crawled first. `prefCol` should be deterministic and
    * preferably integer (e.g. TextAnalysis.qualityKeyInt) so the choice
    * is reproducible across runs and engines.
    *
    * Scale: the component frame is pair-NODE-sized (documents that
    * matched something), ≪ corpus-sized; the preference join fetches
    * `prefCol` for those nodes only, and the survivor window partitions
    * by component label. The full corpus is touched once, by the final
    * anti-join on id.
    */
  def dedupNearBy(
      df: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      prefCol: String): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
    val w = Window.partitionBy(col("component"))
      .orderBy(col("__pref").desc, col("id"))
    val losers = comp
      .join(df.select(col(idCol).as("id"), col(prefCol).as("__pref")), Seq("id"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") > 1)
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Incremental exact dedup of an arriving batch against the historical
    * corpus — the crawl-day-N+1 ingest path. The Bloom filter is built
    * over the BATCH's xxhash64 text digests (the small side: one crawl
    * day vs all history) and shipped inside the probe expression, so the
    * corpus is scanned map-side and NEVER shuffles; only the corpus
    * sliver whose digest might match a batch digest (true matches + fpp
    * false positives) is projected to md5 digests for the exact
    * verification join. No false negatives by Bloom construction; Bloom
    * false positives die at the md5 equi-join. Output is the batch with
    * an `is_new` flag (false = this text already exists in the corpus).
    *
    * Content equality is digest equality (md5, the [[Dedup]] exact-pass
    * contract); the q110 oracle joins raw text, so gate agreement
    * doubles as the collision check for both hash functions.
    *
    * Scale: the expensive side (100 TB of history) pays one scan with a
    * map-side Bloom probe — the only rows that reach an exchange are the
    * flagged sliver (≈ batch-sized at any corpus scale) and the batch
    * itself. Compare [[minhashNearDuplicatesAgainst]] for the near-dup
    * analogue; this is the exact-match fast path.
    */
  def dedupAgainstCorpus(
      corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, fpp: Double = 0.001): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // scope-persisted: the digest projection feeds the cardinality count,
    // the filter build, AND the final join-back (3 uses of a regex-free
    // but md5+xxhash64 double projection)
    val bd = batch.select(col(idCol).as("__bid"),
        xxhash64(col(textCol)).as("__bx"), md5(col(textCol)).as("__bd"))
      .transform(graft.CacheScope.persisted)
    // expectedNumItems must be the real cardinality or fpp is void
    val n = math.max(bd.select(col("__bx")).distinct().count(), 1L)
    val filter = bd.stat.bloomFilter("__bx", n, fpp)
    val corpusHits = corpus
      .select(xxhash64(col(textCol)).as("__cx"), md5(col(textCol)).as("__cd"))
      .filter(graft.functions.BloomExprs.bloomMightContain(col("__cx"), filter))
      .select(col("__cd")).distinct()
    batch
      .join(bd.select(col("__bid").as(idCol), col("__bd")), Seq(idCol))
      .join(corpusHits.withColumnRenamed("__cd", "__bd")
        .withColumn("__hit", lit(true)), Seq("__bd"), "left")
      .withColumn("is_new", col("__hit").isNull)
      .drop("__bd", "__hit")
  }

  /** Every distinct string reachable from `s` by deleting at most one
    * character (including `s` itself). Built-in HOF form (sequence →
    * transform → substr concat), codegen'd; the empty string maps to
    * just itself (`sequence(0, -1)` would count DOWN and fabricate
    * variants, so zero-length input is guarded explicitly).
    */
  private def deletionNeighborhood(s: Column): Column = {
    val dels = when(length(s) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))
    array_union(array(s), dels)
  }

  /** All-pairs fuzzy string matching at bounded edit distance — the
    * record-linkage/fuzzy-dedup member of the dedup family (near-identical
    * titles, names, or short fields that hash-exact dedup misses by one
    * typo). Blocking is the symmetric-delete scheme (SymSpell): each
    * string emits its ≤`maxDist`-deletion neighborhood, candidates are
    * pairs sharing a variant, and exact `levenshtein` verification
    * restores precision, so output is IDENTICAL to the brute-force
    * quadratic scan.
    *
    * Completeness: if lev(a, b) = k ≤ maxDist, fix an optimal alignment
    * and delete from `a` the ≤k characters it substitutes or deletes and
    * from `b` the ≤k characters it substitutes or inserts; both strings
    * collapse onto the alignment's matched subsequence, a shared member
    * of the two ≤k-deletion neighborhoods. Soundness is the exact verify.
    *
    * Unit of edit: both the deletion variants (substr/length) and the
    * levenshtein verification count the same character units, so the
    * completeness argument is internally consistent; for text beyond the
    * BMP treat distances as code-unit-based.
    *
    * Scale: each length-n string emits O(n^maxDist) variant keys, hashed
    * to int64 BEFORE the shuffle — raw strings never cross an exchange
    * (an xxhash64 collision can only ADD a candidate, which verification
    * removes). The self-join is an equi-join on the variant hash; the
    * quadratic blowup inside one key is bounded by the neighborhood
    * design (a key's population is strings within 2·maxDist edits of each
    * other). This is the short-string analogue of jaccardPairs — use that
    * for document-length text, this for fields up to ~100 chars where
    * edit distance, not token overlap, is the right metric. Verification
    * fetches strings by id equi-join (O(candidates)); output columns
    * (id_a, id_b, dist), id_a < id_b, dist ≤ maxDist (0 = exact dups).
    *
    * Reference analogue: none — the reference dedups on exact symbol
    * equality only; this generalizes its `symbol` grouping key to noisy
    * string keys.
    */
  def editDistancePairs(
      df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2 (neighborhood size is O(n^maxDist)), got $maxDist")
    // null string keys are malformed input for a dedup key, not a value
    // to guess at — same fail-fast contract as packSequences. The id
    // cast gets the same guard: a non-numeric id would cast to null and
    // silently vanish from the pair relation otherwise (try_cast keeps
    // the behavior identical under either ANSI setting).
    val idCast = col(idCol).try_cast("long")
    val base = df.select(
        when(idCast.isNull,
          raise_error(lit(s"editDistancePairs: null or non-numeric $idCol row")))
          .otherwise(idCast).as("id"),
        when(col(strCol).isNull,
          raise_error(lit(s"editDistancePairs: null $strCol row")))
          .otherwise(col(strCol)).as("s"))
      .transform(graft.CacheScope.persisted)
    val vars1 = deletionNeighborhood(col("s"))
    val variants = if (maxDist == 1) vars1
      else array_distinct(flatten(transform(vars1, v => deletionNeighborhood(v))))
    // no distinct here: array_union/array_distinct already dedup the
    // variants WITHIN each string, so (id, k) rows are unique per id up
    // to xxhash64 collisions — which the candidate-pair distinct below
    // absorbs anyway. Saves one full exchange of the variant relation.
    val keyed = base
      .select(col("id"), explode(variants).as("v"))
      .select(col("id"), xxhash64(col("v")).as("k"))
    val cands = keyed.as("a")
      .join(keyed.as("b"), col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val out = cands
      .join(base.select(col("id").as("id_a"), col("s").as("__sa")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("s").as("__sb")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
    out
  }
}
