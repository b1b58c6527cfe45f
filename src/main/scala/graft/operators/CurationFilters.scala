package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators for training-data curation, in the lineage of
  * the published web-corpus pipelines (C4's boilerplate removal, Gopher's
  * repetition rules, benchmark decontamination): intra-document repetition
  * metrics, corpus-wide boilerplate n-gram detection, and n-gram-overlap
  * decontamination against a held-out benchmark set.
  *
  * Scale design shared by all three: metrics are computed from EXPLODED
  * (id, gram) pairs through two-level hash aggregations — map-side partial
  * combine applies, no window, no sort, no driver materialization. All
  * per-document outputs are exact integers, so downstream thresholds are
  * integer comparisons (engine-portable: no float-tie ambiguity between
  * this engine and a SQL oracle).
  */
object CurationFilters {

  private def toks(textCol: Column): Column =
    filter(split(textCol, "\\s+"), t => t =!= "")

  /** Per-document repetition statistics, all exact integers:
    * n_tokens, n_distinct_words, max_word_count (count of the most
    * frequent token), n_bigrams, n_distinct_bigrams.
    *
    * Two (id, gram) hash aggregations (words, bigrams) joined on id; a
    * document with fewer than 2 tokens reports 0 bigrams. At 100 TB the
    * shuffles carry (id, gram-string, count) with full map-side combine;
    * gram strings travel once — the alternative per-row higher-order-
    * function formulation is O(len²) per document, which dies on
    * real-length documents.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df
      .select(col(idCol).as("id"), explode(toks(col(textCol))).as("w"))
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct_words"),
        max(col("c")).as("max_word_count"))
    val bigrams = df
      .select(
        col(idCol).as("id"),
        explode(graft.functions.HashExprs.wordNgrams(toks(col(textCol)), 2))
          .as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(
        sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"))
    words.join(bigrams, Seq("id"), "left")
      .na.fill(0L, Seq("n_bigrams", "n_distinct_bigrams"))
  }

  /** Gopher-style repetition gate from integer stats — flags documents
    * whose most frequent word exceeds maxTopWordPct percent of tokens, or
    * whose duplicate-bigram share exceeds maxDupBigramPct percent.
    * Integer cross-multiplication only: `max_word_count * 100 >
    * n_tokens * pct` is exact, so the flag is bit-stable across engines.
    */
  def repetitionFlag(
      maxTopWordPct: Int = 20, maxDupBigramPct: Int = 20): Column =
    (col("max_word_count") * 100 > col("n_tokens") * maxTopWordPct) ||
      ((col("n_bigrams") - col("n_distinct_bigrams")) * 100 >
        col("n_bigrams") * maxDupBigramPct)

  /** Corpus-wide boilerplate detector: the k most frequent word n-grams
    * with at least minCount total occurrences — the C4 "line appears
    * many times" rule transplanted to n-grams (this corpus has no line
    * structure). Global top-k plans as TakeOrderedAndProject (no full
    * sort); the count aggregation is the only shuffle. At 100 TB, run
    * with a higher minCount and the aggregation's combine absorbs the
    * long tail map-side.
    */
  def heavyNgrams(
      df: DataFrame, textCol: String, n: Int, minCount: Long, k: Int): DataFrame =
    df.select(
        explode(graft.functions.HashExprs.wordNgrams(toks(col(textCol)), n))
          .as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= minCount)
      .orderBy(col("n_occurrences").desc, col("gram"))
      .limit(k)

  /** Benchmark decontamination: corpus documents sharing at least one
    * word n-gram with any benchmark document. Returns the distinct
    * contaminated ids.
    *
    * Both sides reduce to DISTINCT hashed n-grams (xxhash64) before the
    * join, so the exchange carries (id, long) / (long) — never gram
    * strings — and the join is a left-semi on the hash: no row
    * multiplication when a document shares many grams. A 64-bit
    * collision could flag a clean document (never the reverse);
    * deterministic, and vanishing at any corpus size that fits in a
    * datacenter. The benchmark side is DISTINCT + broadcastable when
    * small (benchmarks are ~10^5 grams); Spark picks broadcast vs
    * shuffle by size — both are the right plan class.
    */
  def decontaminate(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame =
    hashedGrams(corpus, Some(idCol), textCol, n)
      .join(
        hashedGrams(benchmark, None, textCol, n).distinct(),
        Seq("gh"), "left_semi")
      .select(col("id")).distinct()

  /** (id?, gh) hashed word-n-gram pairs — distinct within document
    * (wordShingles), xxhash64'd so nothing downstream ever carries the
    * gram string.
    */
  private def hashedGrams(
      df: DataFrame, idCol: Option[String], textCol: String, n: Int): DataFrame = {
    val sh = graft.functions.HashExprs
      .wordShingles(toks(col(textCol)), n) // distinct within doc
    val exploded = idCol match {
      case Some(id) => df.select(col(id).as("id"), explode(sh).as("gram"))
      case None     => df.select(explode(sh).as("gram"))
    }
    exploded.withColumn("gh", xxhash64(col("gram"))).drop("gram")
  }

  /** Bloom-filter decontamination — the broadcast form of
    * [[decontaminate]] and the plan you want at 100 TB. Builds Spark's
    * BloomFilter sketch over the benchmark's distinct hashed n-grams
    * (distributed build, driver merge — the benchmark is the small side
    * by definition) and probes every corpus gram MAP-SIDE through the
    * codegen'd [[graft.functions.BloomExprs.BloomMightContainLong]]:
    * the corpus never shuffles grams at all; the only exchange is the
    * distinct over the flagged (tiny) id set.
    *
    * Returns ids that MIGHT be contaminated — a strict superset of the
    * exact join's ids (Bloom filters have no false negatives), with the
    * false-positive share controlled by `fpp`. When exactness matters,
    * run [[decontaminate]] on just the flagged subset: at corpus scale
    * the flagged set is minuscule, so the exact pass costs ~nothing —
    * that composition is [[bloomDecontaminateExact]].
    */
  def bloomDecontaminate(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int, fpp: Double = 0.001): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // persisted LOCALLY: the benchmark gram pipeline (tokenize ->
    // shingle -> hash -> distinct, a shuffle) feeds exactly two
    // IN-FUNCTION actions — the cardinality count and the filter build —
    // and nothing after (the returned plan embeds the built filter), so
    // the cache is released before returning rather than leaking into a
    // scope-free caller's session. expectedNumItems must be the real
    // cardinality or the filter's fpp guarantee is void.
    val bench = hashedGrams(benchmark, None, textCol, n).distinct().persist()
    val filter =
      try {
        val nGrams = math.max(bench.count(), 1L)
        bench.stat.bloomFilter("gh", nGrams, fpp)
      } finally bench.unpersist()
    hashedGrams(corpus, Some(idCol), textCol, n)
      .filter(graft.functions.BloomExprs.bloomMightContain(col("gh"), filter))
      .select(col("id")).distinct()
  }

  /** Exact decontamination at Bloom cost: Bloom pre-filter prunes the
    * corpus to the flagged sliver, then the exact semi-join runs on that
    * sliver only. Identical result set to [[decontaminate]] (the Bloom
    * flag set is a superset, the join removes its false positives);
    * the big side crosses no exchange.
    */
  def bloomDecontaminateExact(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int, fpp: Double = 0.001): DataFrame = {
    val flagged = bloomDecontaminate(corpus, benchmark, idCol, textCol, n, fpp)
    decontaminate(
      corpus.join(flagged.withColumnRenamed("id", idCol), Seq(idCol), "left_semi"),
      benchmark, idCol, textCol, n)
  }

  /** Contamination DEPTH, not just the flag: for each corpus document that
    * shares at least one word n-gram with the benchmark, how many of its
    * distinct grams are benchmark grams. [[decontaminate]] answers
    * "drop it or not"; this answers "how contaminated" — the signal the
    * published decontamination recipes threshold on (drop above X%
    * overlap, keep-and-monitor below) instead of dropping on any single
    * shared gram, which over-removes documents that merely quote a
    * benchmark's one famous sentence.
    *
    * Same exchange discipline as [[decontaminate]]: both sides reduce to
    * distinct hashed grams, the join is on the hash long, and because each
    * side is distinct per key the left join multiplies no rows — the
    * aggregation after it is a plain two-column hash agg. Returns
    * (id, n_grams, n_shared) for contaminated ids only; overlap fraction
    * is the caller's division (kept integral here so thresholds stay
    * engine-exact).
    */
  def contaminationOverlap(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val bench = hashedGrams(benchmark, None, textCol, n).distinct()
      .withColumn("__hit", lit(1L))
    hashedGrams(corpus, Some(idCol), textCol, n)
      .join(bench, Seq("gh"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_shared"))
      .filter(col("n_shared") > 0)
  }

  // ------------------------------------------------------------------
  // PII detection / redaction
  // ------------------------------------------------------------------

  /** PII patterns, deliberately written in the common subset of Java regex
    * and RE2 (no backreferences, no lookaround) so a DuckDB oracle can run
    * the SAME pattern strings verbatim: emails, dotted-quad IPv4
    * addresses, dashed phone numbers. The model is the pattern list — the
    * operator shape (map-side regexp scan + replace, nothing leaves the
    * executor) is what carries to a real pipeline's fuller pattern set.
    */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern: String = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"
  val phonePattern: String = "\\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Text with PII matches replaced by typed placeholders. Replacement
    * order (email, then IPv4, then phone) is part of the contract: emails
    * can embed digit runs, so they are consumed before the narrower
    * numeric patterns get to look; the placeholders themselves contain no
    * digits or '@', so redaction is idempotent.
    */
  def redactPii(textCol: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(textCol, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** Per-document PII scan: per-category match counts plus the redacted
    * text. Counts are INDEPENDENT scans of the raw text (a string that
    * matches two categories counts in both); [[redactPii]]'s replacement
    * order is what resolves overlaps in the redacted output. Pure
    * codegen'd per-row projection — no shuffle, no state; at 100 TB this
    * runs entirely map-side at scan parallelism, which is why PII
    * scrubbing is the cheapest stage of a curation pipeline despite
    * touching every byte.
    */
  def piiScan(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      size(regexp_extract_all(col(textCol), lit(emailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(ipv4Pattern), lit(0)))
        .cast("long").as("n_ips"),
      size(regexp_extract_all(col(textCol), lit(phonePattern), lit(0)))
        .cast("long").as("n_phones"),
      redactPii(col(textCol)).as("redacted"))
}
