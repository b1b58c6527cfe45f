package graft.queries

import graft.Tables
import graft.operators.{CurationFilters, Dedup, LinkGraph, Multimodal, Packing, RangeJoin, Sampling, Similarity, SnapshotDiff, TextAnalysis}
import graft.sources.DocJsonl
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data curation surface over `documents` and `embeddings`:
  * dedup (exact / MinHash-LSH / SimHash / Jaccard), similarity search
  * (brute-force + LSH ANN), text analysis, multimodal plumbing.
  *
  * Queries whose semantics are SQL-expressible carry a DuckDB oracle; the
  * hash-based ones (MinHash/SimHash/LSH — engine-specific hash functions)
  * are covered by ScalaTest recall/correctness specs instead and get the
  * driver's rows-only check.
  */
object Curation {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(Tables.configure(s), dir, name)

  private val enProfile: Map[String, Seq[String]] =
    Map("en" -> Seq("the", "a", "of", "to", "and", "is", "in", "that", "it", "for"))

  // q59's persisted-index scratch, one per JVM (every write inside it is
  // mode=overwrite, so reuse is safe and bounded)
  private lazy val ivfIndexDir: String =
    java.nio.file.Files.createTempDirectory("graft-ivf-idx").toString

  // q112's append scratch: per-JVM is safe because each invocation
  // OVERWRITE-builds the base index first (clearing prior appends)
  private lazy val ivfAppendDir: String =
    java.nio.file.Files.createTempDirectory("graft-ivf-app").toString

  // q79's JSONL round-trip scratch, same per-JVM overwrite contract
  private lazy val jsonlDir: String =
    java.nio.file.Files.createTempDirectory("graft-jsonl").toString

  /** ANN soundness gate body (q40/q41): the hits that are NOT real — a
    * self-match, a fabricated qid/id, or a reported similarity that
    * differs from the exact cosine recomputed on the pair's own vectors
    * (same array<double> cast and cosine expression the ANN operators
    * rank with, so agreement is bit-exact before the shared round).
    * Sound output = empty set.
    */
  private def annUnsoundHits(
      hits: DataFrame, corpus: DataFrame, queries: DataFrame): DataFrame = {
    val qv = queries.select(
      col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qvec"))
    val cv = corpus.select(
      col("vec_id").as("id"), col("embedding").cast("array<double>").as("cvec"))
    hits
      .join(qv, Seq("qid"), "left")
      .join(cv, Seq("id"), "left")
      // null-safe inequality: cosine is NULL for zero-norm vectors, and a
      // plain =!= would evaluate NULL there — silently DROPPING the
      // unsound hit from the gate. <=> keeps it flagged.
      .filter(
        col("qid") === col("id") ||
          col("qvec").isNull || col("cvec").isNull ||
          !(round(Similarity.cosine(col("qvec"), col("cvec")), 4) <=> col("sim")))
      .select(col("qid"), col("id"), col("sim"))
      .orderBy(col("qid"), col("id"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting + char stats per language.
    // Integer sums divided by counts can land exactly on rounding halfway
    // points (terminating decimals); anchor the quotient at scale 10 so
    // both engines resolve the visible round in exact decimal — see
    // Relational.decAvg.
    "q20_token_stats" -> ((s, dir) => {
      def intAvg(c: org.apache.spark.sql.Column) =
        round((sum(c).cast("double") / count(lit(1))).cast("decimal(38,10)"), 4)
          .cast("double")
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          intAvg(TextAnalysis.tokenCount(col("text"))).as("avg_tokens"),
          intAvg(length(col("text"))).as("avg_chars"))
        .orderBy(col("lang"))
    }),

    // Quality scoring per language (length saturation + type-token ratio +
    // punctuation noise).
    "q21_quality" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(round(avg(TextAnalysis.qualityScore(col("text"))), 4).as("avg_quality"))
        .orderBy(col("lang"))),

    // Heuristic language ID (single-profile variant so the oracle can
    // replicate it; the multi-profile version is spec-tested).
    "q22_langid" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn(
          "lang_pred",
          TextAnalysis.langId(col("text"), enProfile, minRatio = 0.08))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("lang_pred"))),

    // Exact dedup profile: docs vs distinct content digests per source.
    "q23_dedup_exact" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_unique"))
        .orderBy(col("source"))),

    // MinHash + banded LSH near-dup candidates, Jaccard-verified. The
    // signature is built from PORTABLE polynomial digests (HashExprs
    // .familyHash over poly257/poly263 char folds), so the oracle
    // replicates the full signature, the band-slice collision relation,
    // and the exact-Jaccard verification — a hard gate, not rows-only.
    // (The engine's band BUCKET is murmur3 of the slice; the oracle tests
    // slice equality directly — identical up to a 2^-32 bucket collision,
    // which could only ADD an already-Jaccard-verified pair.)
    "q24_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashNearDuplicates(
          t(s, dir, "documents"), "doc_id", "text",
          shingleSize = 2, numHashes = 64, bands = 16, threshold = 0.4)
        .orderBy(col("id_a"), col("id_b"))),

    // SimHash fingerprints + Hamming-close pairs (chunk-blocked at the
    // classic radius 3 = 4 x 16-bit chunks; recall is exact by pigeonhole).
    // Pigeonhole completeness means the output IS the full Hamming<=3
    // relation, so the oracle needs no blocking at all: it rebuilds the
    // portable fingerprint bits per doc and brute-forces every pair.
    "q25_simhash" -> ((s, dir) =>
      Dedup.simhashNearDuplicates(
          t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))),

    // Exact word-set Jaccard pairs within a language block.
    "q26_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(
          t(s, dir, "documents"), "doc_id", "text",
          blockCols = Seq("lang"), shingleSize = 1, threshold = 0.5)
        .orderBy(col("lang"), col("id_a"), col("id_b"))),

    // Exact brute-force cosine top-k (query set = first 5 vectors,
    // broadcast; corpus streamed — no corpus shuffle).
    "q27_knn_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(
          emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
        .select(
          col("qid"), col("id"),
          round(col("sim"), 4).as("sim"), col("rank").as("rnk"))
        .orderBy(col("qid"), col("rnk"))
    }),

    // LSH-bucketed ANN over the same queries (the scale path; recall vs
    // brute force is spec-tested). Hyperplane components are portable
    // digests of "hp|seed|g", so the oracle regenerates all 5120 plane
    // values, the 8x10-bit sign keys, and the radius-1 multiprobe
    // collision relation, then reranks by exact cosine — hard gate.
    "q28_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(
          emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          dim = 64, k = 10)
        .select(
          col("qid"), col("id"),
          round(col("sim"), 4).as("sim"), col("rank").as("rnk"))
        .orderBy(col("qid"), col("rnk"))
    }),

    // IVF (inverted-file) ANN over the same queries — the other scale path
    // next to LSH (coarse k-means quantizer + nprobe). The quantizer is
    // FULLY deterministic (driver-side Lloyd over the id-ordered sample,
    // sums folded in id order), so the oracle unrolls all 8 k-means
    // iterations in SQL (ordered list_reduce folds reproduce the IEEE
    // accumulation bit-for-bit), reassigns the corpus, probes 4 cells per
    // query, and reranks by exact cosine — hard gate (ivfOracleSql).
    "q35_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(
          emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, nlist = 16, nprobe = 4)
        .select(
          col("qid"), col("id"),
          round(col("sim"), 4).as("sim"), col("rank").as("rnk"))
        .orderBy(col("qid"), col("rnk"))
    }),

    // Embedding-cosine near-duplicate pairs (banded multi-table LSH, exact-
    // verified). This corpus has no pairs above 0.9 (max cosine is ~0.6 at
    // sf0.1), so both engines return the empty set and the oracle is sound:
    // LSH blocking can only restrict candidates, never add them. The
    // found-pair path is covered by SimilaritySpec on planted data.
    "q36_emb_neardup" -> ((s, dir) =>
      Similarity.cosineNearDuplicates(
          t(s, dir, "embeddings"), "vec_id", "embedding",
          dim = 64, threshold = 0.9)
        .orderBy(col("id_a"), col("id_b"))),

    // ---- gate-visible checks for the hash-defined operators ----
    // Since round 7 the hash-defined queries (q24/q25/q28/q35) carry HARD
    // oracles of their own: every hash they depend on (minhash family,
    // simhash bit stream, hyperplane components, k-means folds) is
    // engine-portable arithmetic that the DuckDB SQL replicates verbatim.
    // These by-construction gates are kept alongside — they check each
    // operator's soundness guarantee as an empty-set difference (the q36
    // pattern) INDEPENDENTLY of any hash replication, so a regression in
    // either the sketch or the verification path is caught twice, from
    // two different directions. Recall stays spec-tested on
    // planted/clustered data where it is meaningful.

    // q24's guarantee: every verified MinHash pair IS an exact-Jaccard pair
    // at the same shingle size and threshold — i.e. each emitted pair's
    // true Jaccard clears the bar. Checked per-pair through the
    // hashed-sorted-set merge machinery (jaccardPairs' verify path, itself
    // oracle-proven against DuckDB brute force by q26), which is
    // INDEPENDENT of the array_intersect/array_union path minhash
    // verification uses internally. Restricting the exact side to the LSH
    // output is semantically identical to the previous
    // `lsh.except(full PPJoin)` form (pair ∈ exact ⟺ J >= t) at a fraction
    // of the cost; jaccardPairs' own candidate generation stays covered by
    // q26's oracle.
    "q38_minhash_sound" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val lsh = Dedup.minhashNearDuplicates(
          d, "doc_id", "text",
          shingleSize = 2, numHashes = 64, bands = 16, threshold = 0.4)
        .select(col("id_a"), col("id_b"))
      val hs = d.select(
        col("doc_id").as("id"),
        graft.functions.HashExprs.hashedSortedSet(
          Dedup.shingles(col("text"), 2)).as("hs"))
      val inter = graft.functions.HashExprs.sortedIntersectSize(
        col("hs_a"), col("hs_b"))
      lsh
        .join(hs.toDF("id_a", "hs_a"), "id_a")
        .join(hs.toDF("id_b", "hs_b"), "id_b")
        .withColumn("inter", inter)
        .withColumn(
          "j",
          col("inter").cast("double") /
            (size(col("hs_a")) + size(col("hs_b")) - col("inter")))
        .filter(col("j") < 0.4)
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // q25's guarantee is two-sided (pigeonhole blocking has EXACT recall
    // for the radius): chunk-blocked pairs == brute-force Hamming pairs.
    // Symmetric difference must be empty. The brute side is the O(N^2)
    // diagnostic over 64-bit fingerprints only — fine at gate scales
    // (5k docs = 12.5M long comparisons), never the production path.
    "q39_simhash_complete" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val found = Dedup.simhashNearDuplicates(d, "doc_id", "text", maxHamming = 3)
        .select(col("id_a"), col("id_b"))
      val fps = d.select(col("doc_id").as("id"), Dedup.simhash64(col("text")).as("fp"))
      val brute = fps.toDF("id_a", "fp_a")
        .join(fps.toDF("id_b", "fp_b"), col("id_a") < col("id_b"))
        .filter(Dedup.hamming64(col("fp_a"), col("fp_b")) <= 3)
        .select(col("id_a"), col("id_b"))
      // symmetric difference via ONE full-outer join: except().union(except())
      // would plan the O(N^2) brute subtree twice (both pair sets are
      // already distinct, so null-side rows are exactly the difference)
      found.withColumn("in_f", lit(1))
        .join(brute.withColumn("in_b", lit(1)), Seq("id_a", "id_b"), "full_outer")
        .filter(col("in_f").isNull || col("in_b").isNull)
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // q28's guarantee: every LSH ANN hit is a real (query, corpus) pair
    // whose reported similarity equals the exact cosine. Checked by DIRECT
    // RECOMPUTATION: join each reported hit back to its two vectors and
    // recompute the cosine — a hit is unsound iff it is a self-match,
    // either id is fabricated (left-join miss), or the reported similarity
    // differs. No ranking of the full Q x N relation (the old form ran
    // bruteForceTopK with k = MaxValue through a window just to feed an
    // except) — the gate's cost is now O(hits), not O(Q x N log N).
    "q40_ann_lsh_sound" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 5)
      val lsh = Similarity.lshTopK(
          emb, "vec_id", "embedding", qs, "vec_id", "embedding",
          dim = 64, k = 10)
        .select(col("qid"), col("id"), round(col("sim"), 4).as("sim"))
      annUnsoundHits(lsh, emb, qs)
    }),

    // q35's guarantee, same direct-recomputation form for the IVF path.
    "q41_ann_ivf_sound" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 5)
      val ivf = Similarity.ivfTopK(
          emb, "vec_id", "embedding", qs, "vec_id", "embedding",
          k = 10, nlist = 16, nprobe = 4)
        .select(col("qid"), col("id"), round(col("sim"), 4).as("sim"))
      annUnsoundHits(ivf, emb, qs)
    }),

    // Deterministic md5-keyed train/val/test split — reproducible across
    // runs, partitionings and engines (the oracle replicates the exact
    // assignment arithmetic), unlike rand()-based splits.
    "q42_hash_split" -> ((s, dir) =>
      Sampling.assignSplit(
          t(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("split"))),

    // Deterministic stratified sampling: per-language keep fractions over
    // the same engine-independent uniform key (the scaled, reproducible
    // analogue of sampleBy).
    "q43_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(
          t(s, dir, "documents"), "doc_id", "lang",
          fractions = Map("en" -> 0.5, "fr" -> 0.25),
          defaultFraction = 0.1)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang"))),

    // Interval join without an equality key: clicks within 5 minutes after
    // each purchase, via bucketized equi-join (identical output to the
    // naive inequality join, which DuckDB's IEJoin runs as the oracle).
    "q44_range_join" -> ((s, dir) => {
      // events.ts is a raw ns-since-epoch long (Tables nanosAsLong) —
      // offsets below are therefore nanoseconds
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("ts").as("c_ts"))
      RangeJoin.timeRangeJoin(
          purchases, "p_ts", clicks, "c_ts",
          lower = 0L, upper = 5L * 60 * 1000000000L)
        .groupBy(col("p_id"))
        .agg(count(lit(1)).as("n_clicks"), min(col("c_id")).as("min_click_id"))
        .orderBy(col("p_id"))
    }),

    // Top-3 characteristic terms per doc by tf-idf over a deterministic
    // subset (every stage — tokenize, tf, df, ln scoring, ranked top-k —
    // replicated by the oracle).
    "q46_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(
          t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text", 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"), col("rnk"))),

    // End-to-end curation pipeline composition — the operators above are
    // only useful if they CHAIN: quality-gate, exact-dedup survivor,
    // deterministic split, per-split profile; every stage replicated by
    // the oracle.
    "q45_curation_pipeline" -> ((s, dir) => {
      val scored = t(s, dir, "documents")
        .withColumn("q", TextAnalysis.qualityScore(col("text")))
        .filter(col("q") >= 0.75)
      val deduped = Dedup.dedupExact(scored, "doc_id", "text")
      Sampling.assignSplit(deduped, "doc_id", Seq("train" -> 0.9, "eval" -> 0.1))
        .groupBy(col("split"))
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("q")), 4).as("avg_quality"))
        .orderBy(col("split"))
    }),

    // Sketch aggregations with a GATE-VISIBLE error bound (the q38-q41
    // empty-set pattern): per event type, HyperLogLog++ distinct counts and
    // t-digest-style approximate medians are compared against their exact
    // counterparts INSIDE the query; any group whose sketch deviates beyond
    // bound (3x the configured rsd for HLL, 5% of the value range for the
    // median) is emitted — expected empty. Sketches are the only viable
    // form of these aggregates at 100 TB (exact distinct shuffles every
    // key; exact percentile sorts); the bound check keeps them honest.
    "q47_sketch_bounds" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      // distinct-count and percentile checks aggregated SEPARATELY: mixing
      // a distinct aggregate (expand plan) with imperative ObjectHashAgg
      // buffers (percentile sketches) in one agg forces a sort-based
      // fallback over the expanded rows — measured 3x slower than the two
      // clean aggregations plus a 5-row join
      val dist = ev.groupBy(col("event_type")).agg(
        countDistinct(col("user_id")).as("exact_d"),
        approx_count_distinct(col("user_id"), 0.05).as("approx_d"))
      val pct = ev.groupBy(col("event_type")).agg(
        expr("percentile(value, 0.5)").as("exact_p50"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("approx_p50"),
        (max(col("value")) - min(col("value"))).as("vrange"))
      dist.join(pct, "event_type")
        .filter(
          abs(col("approx_d") - col("exact_d")) >
            col("exact_d").cast("double") * 0.15 ||
            abs(col("approx_p50") - col("exact_p50")) > col("vrange") * 0.05)
        .select(col("event_type"))
        .orderBy(col("event_type"))
    }),

    // Array-math profile of the embedding corpus per class label.
    "q29_emb_stats" -> ((s, dir) => {
      val v = col("embedding").cast("array<double>")
      val norm = sqrt(aggregate(
        transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))
      t(s, dir, "embeddings")
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n"),
          round(avg(norm), 4).as("avg_norm"))
        .orderBy(col("label"))
    }),

    // Gopher-style repetition hygiene, aggregated per language as exact
    // integer sums (per-doc metrics are integers; the flag is an integer
    // cross-multiplication — nothing float crosses the engine boundary).
    "q48_repetition" -> ((s, dir) => {
      val stats = CurationFilters.repetitionStats(
        t(s, dir, "documents"), "doc_id", "text")
        .join(t(s, dir, "documents").select(col("doc_id").as("id"), col("lang")), Seq("id"))
      stats.groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("n_tokens") - col("n_distinct_words")).as("total_dup_words"),
          sum(col("n_bigrams") - col("n_distinct_bigrams")).as("total_dup_bigrams"),
          sum(when(CurationFilters.repetitionFlag(20, 20), 1L).otherwise(0L))
            .as("n_flagged"))
        .orderBy(col("lang"))
    }),

    // Corpus-wide boilerplate 3-grams: top 20 by total occurrences
    // (count desc, gram asc — fully deterministic).
    "q49_heavy_ngrams" -> ((s, dir) =>
      CurationFilters.heavyNgrams(
        t(s, dir, "documents"), "text", n = 3, minCount = 2L, k = 20)),

    // Benchmark decontamination: docs (doc_id % 17 != 0) sharing any
    // 4-gram with the deterministic benchmark slice (doc_id % 17 == 0),
    // counted per source. The operator joins on xxhash64-hashed grams
    // (longs through the exchange); the oracle joins raw gram strings —
    // agreement IS the collision-freeness check, and it is deterministic.
    "q50_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val flagged = CurationFilters.decontaminate(
        docs.filter(col("doc_id") % 17 =!= 0),
        docs.filter(col("doc_id") % 17 === 0),
        "doc_id", "text", n = 4)
      docs.join(flagged.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_semi")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_contaminated"))
        .orderBy(col("source"))
    }),

    // Deterministic exactly-k-per-group sample: 40 docs per language,
    // ranked by the engine-independent md5 uniform key. The key is an
    // integer/2^32 dyadic rational — bit-exact in both engines — so the
    // oracle replicates the ranking and the kept set id-for-id.
    "q62_exact_k_sample" -> ((s, dir) =>
      Sampling.sampleExactKPerGroup(
          t(s, dir, "documents"), "lang", "doc_id", k = 40)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"))),

    // Normalized exact dedup (CCNet-style lowercase dedup): survivors
    // after grouping on the normalized text. The operator groups on
    // md5(normalized); the oracle groups on the raw normalized string —
    // agreement doubles as the md5 collision check (as in q50).
    "q63_normalized_dedup" -> ((s, dir) =>
      Dedup.dedupExactNormalized(t(s, dir, "documents"), "doc_id", "text")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("source"))),

    // Quality-percentile cut: keep the top 3/4 of each language by the
    // INTEGER quality key (length saturation + diversity + low punct,
    // integral division only), cut by integer cross-multiplication
    // rank*4 <= n*3 over (key desc, doc_id) — every comparison the rank
    // and the cut make is on integers, so DuckDB replicates the kept set
    // bit-for-bit.
    "q61_quality_cut" -> ((s, dir) => {
      val scored = t(s, dir, "documents")
        .withColumn("qkey", TextAnalysis.qualityKeyInt(col("text")))
      Sampling.topFractionPerGroup(scored, "lang", "qkey", "doc_id", 3, 4)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("id_sum"),
          min(col("qkey")).as("min_kept_key"))
        .orderBy(col("lang"))
    }),

    // PII scan + redaction over deterministically planted PII (the corpus
    // itself is clean word-soup; the plant guarantees nonzero counts and
    // exercises every pattern + the replacement order). residual_pii
    // re-scans the REDACTED text with all three patterns — the inline
    // soundness claim is that it sums to zero. Patterns are written in the
    // Java-regex/RE2 common subset, so the oracle runs them verbatim.
    "q64_pii" -> ((s, dir) => {
      val planted = t(s, dir, "documents").withColumn("text", concat(
        col("text"),
        when(col("doc_id") % 5 === 0, concat(lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, concat(lit(" host 10."),
          (col("doc_id") % 250).cast("string"), lit(".0."),
          (col("doc_id") % 200).cast("string"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, concat(lit(" call 555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(lit(""))))
      val scan = CurationFilters.piiScan(planted, "doc_id", "text")
      planted.select(col("doc_id").as("id"), col("source"))
        .join(scan, Seq("id"))
        .groupBy(col("source"))
        .agg(
          sum(when(col("n_emails") + col("n_ips") + col("n_phones") > 0, 1L)
            .otherwise(0L)).as("n_docs_with_pii"),
          sum(col("n_emails")).as("n_emails"),
          sum(col("n_ips")).as("n_ips"),
          sum(col("n_phones")).as("n_phones"),
          sum(length(col("redacted")).cast("long")).as("redacted_chars"),
          sum((size(regexp_extract_all(col("redacted"),
              lit(CurationFilters.emailPattern), lit(0))) +
            size(regexp_extract_all(col("redacted"),
              lit(CurationFilters.ipv4Pattern), lit(0))) +
            size(regexp_extract_all(col("redacted"),
              lit(CurationFilters.phonePattern), lit(0)))).cast("long"))
            .as("residual_pii"))
        .orderBy(col("source"))
    }),

    // Deterministic corpus shuffle: (shard, pos) permutation coordinates.
    // order_checksum = sum(pos * doc_id) pins the EXACT within-shard
    // order (any transposition of two docs changes it), so oracle
    // agreement proves the full permutation, not just shard membership.
    "q65_corpus_shuffle" -> ((s, dir) =>
      Sampling.deterministicShuffle(
          t(s, dir, "documents"), "doc_id", numShards = 8)
        .groupBy(col("shard"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("doc_id")).as("id_sum"),
          sum(col("pos") * col("doc_id")).as("order_checksum"))
        .orderBy(col("shard"))),

    // Temperature-weighted mixture resample (alpha = 0.5): per-source
    // targets totalTarget * floor(sqrt(n)) / sum(floor(sqrt(n))) drawn
    // exactly by md5 rank. Integer targets + integer ranking key => the
    // oracle replicates the kept set id-for-id (id_sum pins it).
    "q66_temperature_mix" -> ((s, dir) =>
      Sampling.temperatureResample(
          t(s, dir, "documents"), "source", "doc_id", totalTarget = 2000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("source"))),

    // Contamination depth: for every corpus doc sharing a 4-gram with the
    // benchmark slice, how many of its distinct grams are benchmark grams.
    // The operator joins hashed grams; the oracle joins raw gram strings —
    // agreement doubles as the collision-freeness check (as in q50), and
    // the overlap percentage is integral division so the max is exact.
    "q67_contam_overlap" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val ov = CurationFilters.contaminationOverlap(
        docs.filter(col("doc_id") % 17 =!= 0),
        docs.filter(col("doc_id") % 17 === 0),
        "doc_id", "text", n = 4)
      docs.select(col("doc_id").as("id"), col("source"))
        .join(ov, Seq("id"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_contaminated"),
          sum(col("n_grams")).as("total_grams"),
          sum(col("n_shared")).as("total_shared"),
          max(call_function("div", col("n_shared") * 100L, col("n_grams")))
            .as("max_overlap_pct"))
        .orderBy(col("source"))
    }),

    // Token-length histogram per language: integer bucket edges, labels
    // ordered by construction. Corpus profiling for context-window
    // planning; integer comparisons only.
    "q68_token_hist" -> ((s, dir) =>
      TextAnalysis.tokenHistogram(
          t(s, dir, "documents"), "lang", "text", Seq(50, 100, 200, 400))
        .orderBy(col("lang"), col("bucket"))),

    // Sequence-level dedup: chunk every document to 64-token sequences,
    // dedup chunks GLOBALLY (survivor = first (doc_id, chunk) per chunk
    // digest). The operator windows on md5(chunk_text); the oracle windows
    // on md5 recomputed from its own slicing — token conservation and the
    // kept-token totals pin both the chunking and the survivor choice.
    "q69_chunk_dedup" -> ((s, dir) =>
      Dedup.chunkDedup(
          t(s, dir, "documents"), "doc_id", "text", budget = 64,
          carryCols = Seq("lang"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_chunks"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_unique_chunks"),
          sum(when(col("keep"), col("chunk_tokens")).otherwise(0L))
            .as("tokens_kept"),
          sum(col("chunk_tokens")).as("total_tokens"))
        .orderBy(col("lang"))),

    // Encoding hygiene: control (Cc) and format (Cf) characters planted
    // deterministically (BEL+ESC on doc_id%3; ZERO WIDTH SPACE + SOFT
    // HYPHEN on doc_id%4 -> chr(7)/chr(27)/chr(8203)/chr(173) in the
    // oracle), stripped by sanitizeText; the oracle runs the same
    // Unicode-category pattern. Counts + removed-char totals pin the
    // sanitation exactly.
    "q70_sanitize" -> ((s, dir) => {
      val planted = t(s, dir, "documents").withColumn("text", concat(
        col("text"),
        when(col("doc_id") % 3 === 0, lit("\u0007alert\u001B")).otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit("\u200Bzw\u00AD")).otherwise(lit(""))))
      planted
        .withColumn("clean", TextAnalysis.sanitizeText(col("text")))
        .withColumn("removed",
          (length(col("text")) - length(col("clean"))).cast("long"))
        .groupBy(col("source"))
        .agg(
          sum(when(col("removed") > 0, 1L).otherwise(0L)).as("n_docs_affected"),
          sum(col("removed")).as("n_chars_removed"),
          sum(length(col("clean")).cast("long")).as("clean_chars"))
        .orderBy(col("source"))
    }),

    // C4-style blocklist gate: exact token membership on the lowercased
    // text (the list is the model; corpus vocabulary words stand in).
    "q71_blockwords" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("n_blocked", TextAnalysis.blockwordCount(
          col("text"), Seq("merge", "batch", "spark")))
        .groupBy(col("lang"))
        .agg(
          sum(when(col("n_blocked") > 0, 1L).otherwise(0L)).as("n_flagged_docs"),
          sum(col("n_blocked")).as("total_blockwords"))
        .orderBy(col("lang"))),

    // Character-distribution entropy per language — the perplexity proxy.
    // Per-doc entropies round at 4 decimals in BOTH engines before the
    // min/max; the avg rounds at 3 (entropy values are irrational, so a
    // last-ulp summation difference cannot straddle a rounding boundary).
    "q72_char_entropy" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.charEntropyStats(docs, "doc_id", "text")
        .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          round(avg(col("entropy_bits")), 3).as("avg_entropy_bits"),
          min(col("entropy_bits")).as("min_entropy_bits"),
          max(col("entropy_bits")).as("max_entropy_bits"))
        .orderBy(col("lang"))
    }),

    // Binary metadata round-trip: spec-valid synthetic PNG/WAV headers
    // built from doc_id arithmetic, parsed back by the REAL byte-level
    // header parsers (beUInt/leUInt on binary columns — no codec libs).
    // The oracle computes the expected sums from doc_id directly, so
    // agreement proves construct -> parse is the identity.
    "q73_binary_meta" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val framed = docs.select(
        col("source"),
        Multimodal.syntheticPng(
          col("doc_id") % 1800 + 100, col("doc_id") % 997 + 50).as("png"),
        Multimodal.syntheticWav(
          when(col("doc_id") % 2 === 0, 44100L).otherwise(16000L),
          col("doc_id") % 2 + 1).as("wav"))
      framed.select(
          col("source"),
          Multimodal.pngDimensions(col("png")).as("dims"),
          Multimodal.wavMeta(col("wav")).as("audio"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("dims.width")).as("width_sum"),
          sum(col("dims.height")).as("height_sum"),
          sum(col("audio.sample_rate")).as("rate_sum"),
          sum(col("audio.channels")).as("channel_sum"))
        .orderBy(col("source"))
    }),

    // JSONL round trip with dead-letter: documents exported as JSONL
    // (plus 7 planted syntactically-broken lines), read back against the
    // strict schema. Valid rows aggregate per source exactly as the
    // original table (round trip is the identity for string/long
    // columns); the dead letter carries exactly the planted lines.
    "q79_jsonl" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val dirOut = jsonlDir
      DocJsonl.write(docs, dirOut)
      val broken = s.createDataset(Seq(
        "{not json at all", "{\"doc_id\": 1,,}", "[1, 2",
        "{\"unterminated\": \"", "}{", "{]", "nope"))(
        org.apache.spark.sql.Encoders.STRING).toDF("value")
      broken.write.mode("append").text(dirOut)
      val back = DocJsonl.read(s, dirOut, docs.schema)
      DocJsonl.valid(back)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .unionByName(DocJsonl.deadLetter(back)
          .agg(count(lit(1)).as("n"))
          .select(lit("___corrupt").as("source"), col("n"), lit(0L).as("id_sum")))
        .orderBy(col("source"))
    }),

    // Embedding-space decontamination: corpus vectors cosine-matching a
    // reference set (every 13th embedding, id-shifted) through the
    // cross-set banded LSH. Identical vectors agree on every band, so
    // each planted copy is found with probability 1; the corpus's max
    // organic cosine is ~0.49 (checked), far under the 0.95 bar, so the
    // relation is exactly the planted self-matches in both engines and
    // offset_check pins id_b = id_a + 100000 pairwise.
    "q93_emb_decontam" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val ref = emb.filter(col("vec_id") % 13 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      Similarity.cosineNearDuplicatesAgainst(emb, ref, "vec_id",
          "embedding", dim = 64, threshold = 0.95)
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(col("id_a")).as("src_id_sum"),
          sum(col("id_b") - lit(100000L) - col("id_a")).as("offset_check"),
          round(sum(col("sim")), 1).as("sim_sum"))
    }),

    // Reference-passage decontamination: corpus docs sharing winnowed
    // fingerprints with a benchmark PASSAGE (tokens 5-14 of every 23rd
    // doc — a 10-token run clears the k+w-1 = 6 winnowing guarantee, so
    // every source doc shares >= 1 fingerprint with its own passage;
    // minShared = 2 then filters accidental single-fingerprint
    // collisions, trading that guarantee for precision — exactly the
    // knob a real pipeline turns). Contiguous-overlap complement of
    // q88's bag-overlap join; corpus-side stop-fingerprint cap.
    "q91_ref_passages" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = TextAnalysis.tokens(col("text"))
      val ref = docs.filter(col("doc_id") % 23 === 0)
        .filter(size(toks) >= 14)
        .select(col("doc_id"), col("lang"),
          concat_ws(" ", slice(toks, lit(5), lit(10))).as("text"))
      Dedup.winnowedPassageMatchesAgainst(docs, ref, "doc_id", "text",
          blockCols = Seq("lang"), k = 3, window = 4,
          minShared = 2, maxDf = 100)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_pairs"),
          countDistinct(col("id_a")).as("n_corpus_flagged"),
          countDistinct(col("id_b")).as("n_refs_matched"),
          sum(col("n_shared")).as("shared_total"))
        .orderBy(col("lang"))
    }),

    // Character-class encoding audit with planted non-ASCII (the base
    // corpus is pure-ASCII word soup; the plant gives the non-ASCII
    // column real signal). All-integer per-class counts.
    "q90_char_classes" -> ((s, dir) => {
      val planted = t(s, dir, "documents").withColumn("text", concat(
        col("text"),
        when(col("doc_id") % 3 === 0, lit(" na\u00EFve 3.14!"))
          .otherwise(lit(""))))
      TextAnalysis.charClasses(planted, "doc_id", "text",
          carryCols = Seq("source"))
        .groupBy(col("source"))
        .agg(
          sum(col("n_chars")).as("chars"),
          sum(col("n_letters")).as("letters"),
          sum(col("n_digits")).as("digits"),
          sum(col("n_punct")).as("punct"),
          sum(col("n_ws")).as("ws"),
          sum(col("n_non_ascii")).as("non_ascii"),
          sum(when(col("n_non_ascii") > 0, 1L).otherwise(0L))
            .as("n_docs_non_ascii"))
        .orderBy(col("source"))
    }),

    // Similarity-based decontamination: corpus docs whose token-set
    // Jaccard with ANY benchmark doc >= 0.9, via the R-S PPJoin
    // (Dedup.jaccardJoin). Benchmark = every 17th doc with one appended
    // token (J = n/(n+1) against its source, plus whatever organic
    // near-dups clear the bar — both engines see the same relation).
    // Per-pair jaccards anchor at round(4) -> DECIMAL before the sum so
    // the aggregate is order-independent in both engines.
    "q88_sim_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 17 === 0)
        .withColumn("text", concat(col("text"), lit(" canary")))
      Dedup.jaccardJoin(docs, bench, "doc_id", "text",
          blockCols = Seq("lang"), shingleSize = 1, threshold = 0.9)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_pairs"),
          countDistinct(col("id_a")).as("n_flagged"),
          sum(col("jaccard").cast("decimal(10,4)")).cast("double")
            .as("sim_sum"))
        .orderBy(col("lang"))
    }),

    // HTML/markup stripping over deterministically planted tag soup
    // (script-with-contents, comments, tags, the five core entities).
    // Both engines run the same RE2-subset patterns + literal replaces;
    // counts and char totals pin extraction exactly.
    "q87_strip_markup" -> ((s, dir) => {
      val planted = t(s, dir, "documents").withColumn("text", concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          lit(" <p class=\"m\">Tom &amp; Jerry</p>")).otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          lit(" <script>var x = 1 &lt; 2;</script><b>bold</b>"))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          lit(" <!-- note --> five&nbsp;&#39;quoted&#39;"))
          .otherwise(lit(""))))
      planted
        .withColumn("clean", TextAnalysis.stripMarkup(col("text")))
        .groupBy(col("source"))
        .agg(
          sum(when(col("clean") =!= col("text"), 1L).otherwise(0L))
            .as("n_docs_changed"),
          sum((length(col("text")) - length(col("clean"))).cast("long"))
            .as("n_chars_removed"),
          sum(length(col("clean")).cast("long")).as("clean_chars"))
        .orderBy(col("source"))
    }),

    // Token-budget corpus cut: the top-50k-tokens prefix of the
    // (quality desc, id) order, via the bucketed prefix-sum (only the
    // straddling quality key ranks rows — see Sampling.tokenBudgetCut).
    // Integer key + integer token counts => the oracle replicates the
    // kept set document-for-document with one running-sum window.
    "q85_token_budget" -> ((s, dir) => {
      // persisted: tokenBudgetCut scans its input three times (per-key
      // totals, full-keep branch, straddle branch); caching the PROJECTED
      // frame (4 scalar cols, no text — ~32 bytes/doc) makes the regex
      // tokenization run once instead of three times
      val keyed = t(s, dir, "documents").select(
          col("doc_id"), col("lang"),
          TextAnalysis.qualityKeyInt(col("text")).as("qkey"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("nt"))
        .transform(graft.CacheScope.persisted(_))
      Sampling.tokenBudgetCut(keyed, "doc_id", "qkey", "nt",
          budget = 50000L)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_kept"),
          sum(col("nt")).as("tokens_kept"),
          sum(col("doc_id")).as("id_sum"),
          min(col("qkey")).as("min_kept_key"))
        .orderBy(col("lang"))
    }),

    // Corpus-bigram log-prob with add-one smoothing — the word-salad
    // detector one Markov order above q74. Same rounding protocol:
    // per-doc round(4) (integer count ratios before the log, so both
    // engines see identical rationals), per-lang avg round(3).
    "q84_bigram_logprob" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.bigramLogProb(docs, "doc_id", "text", k = 1)
        .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_bigrams")).as("total_bigrams"),
          round(avg(col("avg_log2_prob")), 3).as("avg_score"),
          min(col("avg_log2_prob")).as("min_score"),
          max(col("avg_log2_prob")).as("max_score"))
        .orderBy(col("lang"))
    }),

    // Unicode NFC normalization — the canonical-form stage that must run
    // BEFORE any dedup/decontamination (the same visible string has many
    // code-point encodings; un-normalized corpora silently treat equal
    // texts as different). Decomposed sequences planted deterministically
    // (combining acute on doc_id%3; combining ring + diaeresis on
    // doc_id%4), folded by the codegen'd NormalizeExprs.nfc; the oracle
    // runs DuckDB's own nfc_normalize on the same planted text.
    "q83_nfc_normalize" -> ((s, dir) => {
      // decomposed on purpose: 'e'+U+0301, 'A'+U+030A, 'o'+U+0308 \u2014
      // NFC folds each pair to one precomposed code point
      val planted = t(s, dir, "documents").withColumn("text", concat(
        col("text"),
        when(col("doc_id") % 3 === 0, lit(" cafe\u0301")).otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit(" A\u030Angstro\u0308m"))
          .otherwise(lit(""))))
      planted
        .withColumn("clean", graft.functions.NormalizeExprs.nfc(col("text")))
        .withColumn("removed",
          (length(col("text")) - length(col("clean"))).cast("long"))
        .groupBy(col("source"))
        .agg(
          sum(when(col("removed") > 0, 1L).otherwise(0L)).as("n_docs_changed"),
          sum(col("removed")).as("n_marks_folded"),
          sum(length(col("clean")).cast("long")).as("clean_chars"))
        .orderBy(col("source"))
    }),

    // CMS heavy-hitter soundness gate: build the Count-Min sketch over
    // the full token stream (the 100 TB frequency path — the stream
    // never shuffles, see operators.HeavyHitters), take the EXACT top-20
    // tokens (affordable at gate scale), probe each through the sketch,
    // and emit any estimate that undercounts (impossible by CMS
    // construction) or overshoots truth by more than ceil(eps*N).
    // Empty set == the sketch honors both sides of its error contract.
    "q82_cms_heavy_sound" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // persisted: the exploded token frame feeds both the sketch build
      // and the exact top-20 side — tokenize once, not three times. N for
      // the slack bound is the sketch's own totalCount (= items added).
      val toks = docs.select(
          explode(TextAnalysis.tokens(col("text"))).as("token"))
        .transform(graft.CacheScope.persisted(_))
      val eps = 1e-4
      val sketch = graft.operators.HeavyHitters.tokenSketchOfTokens(
        toks, "token", eps, confidence = 0.999, seed = 42)
      val slack = math.ceil(eps * sketch.totalCount()).toLong
      toks.groupBy(col("token")).agg(count(lit(1)).as("true_n"))
        .orderBy(col("true_n").desc, col("token")).limit(20)
        .withColumn("est_n", graft.functions.CmsExprs.cmsEstimate(
          xxhash64(col("token")), sketch))
        .filter(col("est_n") < col("true_n") ||
          col("est_n") > col("true_n") + slack)
        .select(col("token"), col("true_n"), col("est_n"))
        .orderBy(col("token"))
    }),

    // Corpus snapshot diff — the incremental-refresh primitive. Two
    // deterministic snapshots of the documents table: old drops
    // doc_id%7==0, cur drops doc_id%5==0 and rewrites text on
    // doc_id%3==0. Digest-projected full-outer join (only (id, md5)
    // cross the exchange; text never moves), then counts per status.
    "q81_corpus_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val old = docs.filter(col("doc_id") % 7 =!= 0)
      val cur = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text")))
      SnapshotDiff.report(old, cur, "doc_id", "text")
        .orderBy(col("status"))
    }),

    // Z-order (Morton) interleaving — the multi-dimensional clustered
    // layout key. Pure 64-bit bit arithmetic; the oracle replicates the
    // 5-step magic-number spread with DuckDB's &, |, << on the same hex
    // masks, so every z-value matches bit-for-bit.
    "q78_zorder" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("source"), graft.functions.ZOrder.zValue(
          col("doc_id") % 1000, (col("doc_id") * 7) % 1000).as("z"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("z")).as("z_sum"),
          min(col("z")).as("z_min"),
          max(col("z")).as("z_max"))
        .orderBy(col("source"))),

    // One-call dataset-card profile per source: all exact integers from
    // a single hash aggregation.
    "q77_corpus_profile" -> ((s, dir) =>
      TextAnalysis.corpusProfile(t(s, dir, "documents"), "source", "text")
        .orderBy(col("source"))),

    // Exact weighted sampling without replacement (integer A-ES via the
    // max-of-w-draws identity): weight = quality tier (qualityKeyInt div
    // 250 + 1, in [1,5]), k = 100. Every draw, the max, and the top-k cut
    // are integers, so the oracle replicates the kept set id-for-id —
    // which a float-pow A-ES key could never guarantee across engines.
    "q76_weighted_sample" -> ((s, dir) => {
      val weighted = t(s, dir, "documents")
        .withColumn("wt", call_function("div",
          TextAnalysis.qualityKeyInt(col("text")), lit(250L)) + 1L)
      Sampling.weightedSampleK(weighted, "doc_id", "wt", k = 100)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"))
    }),

    // Corpus-unigram log-prob scoring (the LM-perplexity-filter skeleton
    // with the corpus as its own model). Per-doc scores round at 4 in
    // both engines before the per-lang min/max; avg rounds at 3.
    "q74_unigram_logprob" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.unigramLogProb(docs, "doc_id", "text")
        .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          round(avg(col("avg_log2_prob")), 3).as("avg_score"),
          min(col("avg_log2_prob")).as("min_score"),
          max(col("avg_log2_prob")).as("max_score"))
        .orderBy(col("lang"))
    }),

    // URL/domain provenance analysis over deterministically planted
    // outlinks (the corpus is URL-free word soup; the plant exercises
    // extraction + domain grouping). Top domains by reference count,
    // ties broken by domain.
    "q75_url_domains" -> ((s, dir) => {
      val planted = t(s, dir, "documents").withColumn("text", concat(
        col("text"),
        when(col("doc_id") % 6 === 0, concat(lit(" see https://site"),
          (col("doc_id") % 13).cast("string"), lit(".example.org/p/"),
          col("doc_id").cast("string"))).otherwise(lit("")),
        when(col("doc_id") % 9 === 0, concat(lit(" ref http://cdn"),
          (col("doc_id") % 7).cast("string"), lit(".net"))).otherwise(lit(""))))
      TextAnalysis.urlRefs(planted, "doc_id", "text")
        .groupBy(col("domain"))
        .agg(
          count(lit(1)).as("n_refs"),
          countDistinct(col("id")).as("n_docs"))
        .orderBy(col("n_refs").desc, col("domain"))
        .limit(20)
    }),

    // Bloom decontamination soundness: the Bloom flag set must contain
    // every exactly-contaminated id (no false negatives by construction —
    // this gate makes the construction visible), and the Bloom-prefilter +
    // exact-join composition must equal the exact join outright. Gate
    // output = (exact \ bloom) ∪ (exact Δ composed) = empty.
    "q60_bloom_decontam_sound" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 17 =!= 0)
      val bench = docs.filter(col("doc_id") % 17 === 0)
      val exact = CurationFilters.decontaminate(
        corpus, bench, "doc_id", "text", n = 4)
      val bloom = CurationFilters.bloomDecontaminate(
        corpus, bench, "doc_id", "text", n = 4, fpp = 0.01)
      val composed = CurationFilters.bloomDecontaminateExact(
        corpus, bench, "doc_id", "text", n = 4, fpp = 0.01)
      exact.except(bloom)
        .union(exact.except(composed))
        .union(composed.except(exact))
        .orderBy(col("id"))
    }),

    // Sequence packing: documents -> fixed-token-budget training packs,
    // greedy-contiguous within id-mod shards (operators.Packing).
    // Summarized per shard so the gate output is small; every column is an
    // exact integer.
    "q51_seq_packing" -> ((s, dir) =>
      Packing.packProfile(
          t(s, dir, "documents")
            .select(col("doc_id"),
              TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks")),
          "doc_id", "n_toks", budget = 512L, numShards = 8)
        .groupBy(col("shard"))
        .agg(
          count(lit(1)).as("n_packs"),
          sum(col("n_docs")).as("n_docs"),
          sum(col("pack_tokens")).as("total_tokens"),
          max(col("pack_tokens")).as("max_pack_tokens"),
          sum(col("overflow_tokens")).as("total_overflow"))
        .orderBy(col("shard"))),

    // The full modern curation chain, every stage one of this engine's
    // oracle-proven operators: repetition gate (q48 machinery) ->
    // benchmark decontamination (q50) -> deterministic split (q42) ->
    // sequence packing of the train split (q51). Only integer-exact
    // stages, so the composed oracle is bit-stable end to end (the float
    // quality gate is composed separately in q45).
    "q52_train_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val clean = docs.join(
        CurationFilters.repetitionStats(docs, "doc_id", "text")
          .filter(!CurationFilters.repetitionFlag(20, 20))
          .select(col("id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      val corpus = clean.filter(col("doc_id") % 17 =!= 0)
      val decont = corpus.join(
        CurationFilters.decontaminate(
            corpus, docs.filter(col("doc_id") % 17 === 0),
            "doc_id", "text", n = 4)
          .withColumnRenamed("id", "doc_id"),
        Seq("doc_id"), "left_anti")
      val train = Sampling
        .assignSplit(decont, "doc_id", Seq("train" -> 0.9, "eval" -> 0.1))
        .filter(col("split") === "train")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"))
      Packing.packProfile(train, "doc_id", "n_toks", budget = 512L, numShards = 4)
        .groupBy(col("shard"))
        .agg(
          count(lit(1)).as("n_packs"),
          sum(col("n_docs")).as("n_docs"),
          sum(col("pack_tokens")).as("total_tokens"))
        .orderBy(col("shard"))
    }),

    // Near-dup pairs -> dedup clusters: connected components (min-star
    // contraction) over the q26-style pair relation, summarized per lang.
    // The oracle computes the same components with a recursive CTE over
    // its own (q26-identical) pair SQL — the pair sets are proven equal,
    // so cluster agreement checks the CC algorithm itself. Threshold 0.95
    // (vs q26's 0.5): this synthetic corpus is pathologically
    // self-similar — at 0.5, ~99% of same-lang pairs connect and CC
    // measures one giant blob collapsing, not the sparse cluster
    // structure dedup CC exists for; at 0.95 the graph is sparse
    // (~1 pair/doc) and clusters are meaningful.
    "q53_dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", Seq("lang"), 1, 0.95)
      val sizes = Dedup.connectedComponents(pairs, "id_a", "id_b")
        .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
        .groupBy(col("lang"), col("component"))
        .agg(count(lit(1)).as("sz"))
      sizes.groupBy(col("lang"))
        .agg(
          sum(col("sz")).as("n_docs_in_clusters"),
          count(lit(1)).as("n_clusters"),
          max(col("sz")).as("max_cluster"))
        .orderBy(col("lang"))
    }),

    // Semantic dedup soundness (q38-style empty-set gate): the operator's
    // cells and k-means centroids are engine-defined, so no SQL oracle can
    // replicate the assignment — but its KEEP/DROP invariant is checkable
    // by construction: every dropped doc must have a same-cell kept doc
    // within its near-dup component, i.e. re-deriving components from the
    // operator's own within-cell pairs must agree that each component
    // keeps exactly its min id. Emitted rows = violations; expected empty.
    "q54_semdedup_sound" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val th = 0.5
      val out = Similarity.semanticDedup(
        emb, "vec_id", "embedding", threshold = th, nlist = 64)
      // violation 1: a cell with members but zero keepers (every non-empty
      // component keeps its min id, and components are within-cell)
      val orphanCells = out.groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
        .filter(col("n_kept") === 0 && col("n") > 0)
        .select(col("cell").cast("long").as("bad"))
      // violation 2: two KEPT docs that are a near-dup pair — re-derive
      // within-cell pairs from the (deterministic) assignment the operator
      // itself produces; any such pair proves the drop pass missed an edge
      val v = emb.select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("vec"))
      val kept = out.filter(col("keep")).select(col("id"), col("cell"))
        .join(v, Seq("id"))
      val keptPairs = kept.select(col("cell"), col("id").as("id_a"), col("vec").as("va"))
        .join(kept.select(col("cell"), col("id").as("id_b"), col("vec").as("vb")),
          Seq("cell"))
        .filter(col("id_a") < col("id_b"))
        .filter(Similarity.cosine(col("va"), col("vb")) >= th)
        .select(col("id_a").as("bad"))
      orphanCells.union(keptPairs).orderBy(col("bad"))
    }),

    // Winnowed rolling-hash fingerprints (MOSS local fingerprinting over
    // word 3-grams, window 4): passage-level document fingerprinting —
    // the rolling-hash member of the text-analysis family (fingerprint64
    // is the whole-document form, simhash the near-dup form). The oracle
    // replicates the polynomial hash AND the winnowing selection verbatim
    // in SQL (list comprehensions + list_reduce), so the gate pins the
    // entire sketch bit-for-bit: hash arithmetic, gram construction,
    // window minima, distinctness. All-integer outputs.
    "q56_winnow_fingerprints" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(
          col("lang"),
          TextAnalysis.winnowedFingerprints(col("text"), k = 3, window = 4)
            .as("fps"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(col("fps"))).as("n_fingerprints"),
          sum(aggregate(col("fps"), lit(0L), (acc, x) => acc + x)).as("fp_sum"))
        .orderBy(col("lang"))),

    // IVF index round-trip parity: build the persisted cell-partitioned
    // index, query it, and demand bit-identical rows to the direct form
    // (deterministic quantizer + exact double parquet round-trip + the
    // same cosine expression). Gate output = symmetric difference = empty.
    "q59_ivf_index_parity" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 5)
      val direct = Similarity.ivfTopK(
          emb, "vec_id", "embedding", qs, "vec_id", "embedding",
          k = 10, nlist = 16, nprobe = 4)
        .select(col("qid"), col("id"), col("sim"), col("rank"))
      // one scratch dir per JVM, not per invocation: Bench's median-of-3
      // and repeated gate runs would otherwise each leave a full index
      // tree in /tmp (the writes inside are mode=overwrite)
      val tmp = ivfIndexDir
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 16, tmp)
      val indexed = Similarity.ivfTopKIndexed(
          tmp, qs, "vec_id", "embedding", k = 10, nprobe = 4)
        .select(col("qid"), col("id"), col("sim"), col("rank"))
      direct.except(indexed).union(indexed.except(direct))
        .orderBy(col("qid"), col("id"))
    }),

    // Passage-level duplicate pairs via winnowed fingerprints: contiguous
    // copied passages caught even when whole-document similarity is low.
    // Fully SQL-replicated (the whole sketch is engine-portable integer
    // arithmetic), so unlike the MinHash/SimHash candidates this
    // hash-defined path gets a HARD oracle, not rows-only.
    "q58_passage_matches" -> ((s, dir) =>
      Dedup.winnowedPassageMatches(
          t(s, dir, "documents"), "doc_id", "text",
          blockCols = Seq("lang"), k = 3, window = 4,
          minShared = 2, maxDf = 100)
        .select(col("lang"), col("id_a"), col("id_b"), col("n_shared"))
        .orderBy(col("lang"), col("id_a"), col("id_b"))),

    // Context-window chunking: long documents split into fixed-token-
    // budget chunks (ceil-division row explosion, per-row, shuffle-free).
    // Gate checks the whole assignment algebra: chunk counts, conservation
    // of tokens (sum(chunk_tokens) == sum(n_toks)), full-vs-remainder
    // chunk split. Budget 64 on token counts from tokenStats.
    "q57_chunking" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"))
        .filter(col("n_toks") > 0) // the operator rejects empty docs
      Packing.chunkDocuments(toks, "doc_id", "n_toks", budget = 64L)
        .groupBy(col("lang"))
        .agg(
          countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum(col("chunk_tokens")).as("total_tokens"),
          sum(when(col("chunk_tokens") === 64L, 1L).otherwise(0L)).as("n_full"),
          max(col("chunk")).as("max_chunk_idx"))
        .orderBy(col("lang"))
    }),

    // Multimodal plumbing: text payloads as opaque binary through the
    // ingest -> metadata path (decode itself is stubbed; see
    // operators.Multimodal).
    "q30_multimodal_bytes" -> ((s, dir) =>
      Multimodal.ingest(
          t(s, dir, "documents").withColumn("src", col("source")),
          "doc_id", col("text").cast("binary"), "text")
        .join(
          t(s, dir, "documents").select(col("doc_id").as("id"), col("source")),
          Seq("id"))
        .groupBy(col("source"))
        .agg(
          sum(col("n_bytes")).as("total_bytes"),
          count(lit(1)).as("n"))
        .orderBy(col("source"))),

    // C4-style line-level corpus dedup: boilerplate lines planted into
    // the corpus (newsletter/footer chrome on doc_id strides) plus any
    // organically repeated full text; lines occurring > 2 times
    // corpus-wide are removed and documents reassembled. The oracle
    // counts raw line strings where the engine counts md5 digests —
    // agreement doubles as the collision check (q50's pattern).
    "q94_line_dedup" -> ((s, dir) => {
      val planted = t(s, dir, "documents").withColumn("text",
        concat_ws("\n",
          when(col("doc_id") % 5 === 0,
            lit("subscribe to our newsletter for daily updates")),
          col("text"),
          when(col("doc_id") % 9 === 0,
            lit("all rights reserved by the site owner"))))
      Dedup.lineDedup(planted, "doc_id", "text", maxOccurrences = 2)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("n_lines_removed") > 0, 1L).otherwise(0L))
            .as("n_docs_affected"),
          sum(col("n_lines_removed")).as("n_lines_removed"),
          sum(length(col("clean_text")).cast("long")).as("clean_chars"),
          countDistinct(md5(col("clean_text"))).as("n_distinct_clean"))
        .orderBy(col("source"))
    }),

    // URL canonicalization: four planted spellings per stride — default
    // port + tracking params + fragment + trailing slash (m=0) collapse
    // onto the clean form (m=1); non-default ports survive (m=2); the
    // all-identical case (m=3). distinct_raw > distinct_canonical by
    // construction; the oracle replicates every canonicalization step.
    "q95_url_canonical" -> ((s, dir) => {
      val m = col("doc_id") % 4
      val urls = t(s, dir, "documents").select(
        col("source"),
        when(m === 0, concat(
            lit("https://WWW.Example.COM:443/Products/"),
            (col("doc_id") % 10).cast("string"),
            lit("/?utm_source=mail&b=2&a=1#frag")))
          .when(m === 1, concat(
            lit("https://www.example.com/Products/"),
            (col("doc_id") % 10).cast("string"),
            lit("?a=1&b=2")))
          .when(m === 2, concat(
            lit("HTTP://Site.ORG:8080/a/b?z="),
            (col("doc_id") % 5).cast("string"),
            lit("&utm_campaign=x")))
          .otherwise(lit("http://site.org:80/plain/")).as("url"))
      urls
        .withColumn("canon", TextAnalysis.canonicalizeUrl(col("url")))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_urls"),
          countDistinct(col("url")).as("n_distinct_raw"),
          countDistinct(col("canon")).as("n_distinct_canonical"))
        .orderBy(col("source"))
    }),

    // Leakage-safe split: near-dup clusters (q53's pair graph) never
    // straddle train/val/test — the split key is the component label,
    // singletons their own id. The oracle composes q53's recursive-CTE
    // components with q42's md5 assignment rule.
    "q96_leakage_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", Seq("lang"), 1, 0.95)
      Sampling.leakageSafeSplit(docs, "doc_id", pairs,
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "leak")
        .groupBy(col("split"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy(col("split"))
    }),

    // Magic-byte file-type sniffing: payloads synthesized per doc_id
    // stride (real PNG/WAV headers via the q73 builders, JPEG/PDF/ZIP
    // signature prefixes, 1-byte junk), routed by sniffType. The oracle
    // recomputes the expected label from doc_id directly — agreement
    // proves construct -> sniff is the identity, including the truncated
    // fall-through.
    "q97_filetype_sniff" -> ((s, dir) => {
      val m = col("doc_id") % 6
      val framed = t(s, dir, "documents").select(
        col("source"),
        when(m === 0, Multimodal.syntheticPng(
            col("doc_id") % 1800 + 100, col("doc_id") % 997 + 50))
          .when(m === 1, Multimodal.syntheticWav(
            when(col("doc_id") % 2 === 0, 44100L).otherwise(16000L),
            col("doc_id") % 2 + 1))
          .when(m === 2, unhex(lit("FFD8FFE000104A46494600")))
          .when(m === 3, unhex(lit("255044462D312E34")))
          .when(m === 4, unhex(lit("504B03040A00")))
          .otherwise(unhex(lpad(hex(col("doc_id") % 256), 2, "0")))
          .as("payload"))
      framed
        .withColumn("kind", Multimodal.sniffType(col("payload")))
        .groupBy(col("source"), col("kind"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("source"), col("kind"))
    }),

    // Substring-span dedup (ExactSubstr at k-gram granularity): a license
    // passage pasted at the head (doc_id % 7) and tail (doc_id % 11) of
    // otherwise-unique documents — invisible to document- and line-level
    // dedup, but every interior 4-gram repeats corpus-wide. The oracle
    // counts raw gram strings where the engine counts md5 digests
    // (collision check, q50's pattern), and replicates the coverage /
    // span-merge / rewrite arithmetic with list comprehensions.
    "q98_span_dedup" -> ((s, dir) =>
      spanDedupGate(s, dir, Dedup.spanDedup(_, "doc_id", "text", 4, 2))),

    // int8 embedding quantization: the whole codec is single IEEE ops on
    // exact inputs (max-abs fold, one division, floor(x/scale + 0.5)), so
    // the oracle replicates scale, every quantized value, and the
    // reconstruction error bit-for-bit. Two vectors are zeroed to pin the
    // scale-0 path through the gate; n_violations gates the |err| <=
    // scale/2 contract corpus-wide (epsilon-guarded against the one-ulp
    // boundary, identically on both sides).
    "q99_embed_quant" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").withColumn("embedding",
        when(col("vec_id") % 250 === 0,
          transform(col("embedding"), x => lit(0f)))
          .otherwise(col("embedding")))
      Similarity.quantizeEmbeddings(emb, "embedding")
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n_vecs"),
          sum(aggregate(col("qvec"), lit(0L), (s0, x) => s0 + x)).as("sum_q"),
          max(array_max(col("qvec"))).as("max_q"),
          min(array_min(col("qvec"))).as("min_q"),
          sum(when(col("max_abs_err") > col("scale") * 0.5000001d, 1L)
            .otherwise(0L)).as("n_violations"),
          max(when(col("scale") > 0d,
            floor(col("max_abs_err") / col("scale") * 10000d + 0.5d)
              .cast("long"))).as("max_err_ratio_e4"),
          sum(when(col("scale") === 0d, 1L).otherwise(0L)).as("n_zero_vecs"))
        .orderBy(col("label"))
    }),

    // The rolling-hash production form of q98: SAME planted corpus, SAME
    // aggregate, SAME raw-string oracle — but grams hashed by the O(n)
    // 2^64 polynomial instead of md5-of-string, so oracle agreement IS
    // the 64-bit collision check at this corpus scale.
    "q100_span_dedup_fast" -> ((s, dir) =>
      spanDedupGate(s, dir, Dedup.spanDedupFast(_, "doc_id", "text", 4, 2))),

    // Quantized two-stage top-k over q27's exact queries: stage-1 scores
    // are pure integer dot products of the int8 forms (scale-free cosine),
    // stage-2 reranks the k*4 candidate slice with the exact float
    // cosine. Both stages replicate in SQL, so the gate pins candidate
    // selection AND final ranking — not just rows.
    "q101_quantized_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.quantizedTopK(
          emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, rerankFactor = 4)
        .select(
          col("qid"), col("id"),
          round(col("sim"), 4).as("sim"), col("rank").as("rnk"))
        .orderBy(col("qid"), col("rnk"))
    }),

    // Fuzzy string dedup at edit distance <= 1: titles synthesized per
    // 8-id group — clean form, one-char deletion / substitution /
    // insertion variants, a transposition (Levenshtein 2, the designed
    // negative), an exact duplicate, and an unrelated pair. Group labels
    // embed in the title so near-identical labels ("report 12"/"report
    // 13") also pair across groups — the oracle is the FULL brute-force
    // levenshtein relation (its only prefilter, the length band <= 1, is
    // sound: one edit changes length by at most one), so agreement pins
    // the symmetric-delete blocking as lossless, not just plausible.
    "q102_edit_dedup" -> ((s, dir) =>
      Dedup.editDistancePairs(editTitles(t(s, dir, "documents")),
          "doc_id", "title", maxDist = 1)
        .groupBy(col("dist").cast("long").as("dist"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(col("id_a")).as("a_sum"),
          sum(col("id_b")).as("b_sum"))
        .orderBy(col("dist"))),

    // Host-level link authority: src host from the doc's own id stride,
    // outlinks PLANTED INTO THE TEXT so the regex extraction path is
    // exercised, not bypassed. The functional site graph (13 nodes) plus
    // the cdn tier (7 sinks) gives every metric a nonzero case: sites
    // have both in-degree and 2-hop reach, cdns are pure sinks reached
    // from two hops out. Exact integer counts; the oracle replicates
    // extraction, the distinct edge relation, and both joins.
    "q103_host_authority" -> ((s, dir) =>
      LinkGraph.authority(plantedHostEdges(t(s, dir, "documents")))
        .orderBy(col("host"))),

    // Fixed-point integer PageRank over the same host graph: ranks in
    // micro-units, every step integral division, so the quantized
    // 3-iteration fixpoint is engine-portable and the oracle unrolls the
    // SAME three iterations in SQL — the gate pins the whole diffusion,
    // not a rounded summary.
    "q104_host_pagerank" -> ((s, dir) =>
      LinkGraph.pageRankInt(plantedHostEdges(t(s, dir, "documents")),
          iters = 3)
        .select(col("host"), col("rank").as("pr"))
        .orderBy(col("pr").desc, col("host"))),

    // Vocabulary drift between two corpus snapshots: overlapping id
    // windows simulate crawl N / crawl N+1, planted marker tokens force
    // the added/removed/grown classes, and the organic id-digit tokens
    // populate shrunk/stable. All-integer frequency-class comparisons;
    // minCount=2 exercises the hapax floor on both sides of the join.
    "q105_vocab_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // the %20==4 / %20==14 strides live in BOTH id windows (4 mod 10
      // is inside [2, 8)), so cycletag grows 1->3 per doc and fadetag
      // shrinks 3->1 — populating the grown/shrunk classes the organic
      // 60%-overlap windows keep under the 2x frequency bar
      val old = docs.filter(col("doc_id") % 10 < 8)
        .withColumn("text", concat(col("text"),
          when(col("doc_id") % 6 === 0, lit(" legacyterm")).otherwise(lit("")),
          when(col("doc_id") % 20 === 4, lit(" cycletag")).otherwise(lit("")),
          when(col("doc_id") % 20 === 14,
            lit(" fadetag fadetag fadetag")).otherwise(lit(""))))
      val cur = docs.filter(col("doc_id") % 10 >= 2)
        .withColumn("text", concat(col("text"),
          when(col("doc_id") % 5 === 0, lit(" neoterm neoterm")).otherwise(lit("")),
          when(col("doc_id") % 20 === 4,
            lit(" cycletag cycletag cycletag")).otherwise(lit("")),
          when(col("doc_id") % 20 === 14, lit(" fadetag")).otherwise(lit(""))))
      SnapshotDiff.vocabDrift(old, cur, "text", minCount = 2)
        .groupBy(col("status"))
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(col("old_n")).as("old_total"),
          sum(col("new_n")).as("new_total"))
        .orderBy(col("status"))
    }),

    // Length-bucket padding profile: boundaries 16/32/64/96 against the
    // 10-100-token corpus so every bucket populates and the top bucket
    // truncates. Every output column is an exact integer (integral
    // division for utilization), replicated by the oracle's CASE ladder.
    "q106_length_buckets" -> ((s, dir) =>
      Packing.lengthBucketStats(
          t(s, dir, "documents").withColumn("n_tokens",
            size(filter(split(col("text"), "\\s+"), t0 => t0 =!= ""))
              .cast("long")),
          "doc_id", "n_tokens", Seq(16, 32, 64, 96))
        .orderBy(col("bucket"))),

    // Quality-preferred survivorship: q96's pair graph, but each cluster
    // keeps its HIGHEST-quality member (integer key, ties by min id)
    // instead of the min id — the oracle recomputes components
    // recursively, the quality key, and the rank-1 choice, so the whole
    // keep-the-cleaner-twin rule is pinned.
    "q107_best_survivor" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", Seq("lang"), 1, 0.95)
      val keyed = docs.withColumn("qkey",
        TextAnalysis.qualityKeyInt(col("text")))
      Dedup.dedupNearBy(keyed, "doc_id", pairs, "id_a", "id_b", "qkey")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("id_sum"),
          sum(col("qkey")).as("qkey_sum"))
        .orderBy(col("lang"))
    }),

    // Mixture-recipe execution: per-language token quotas filled
    // best-quality-first — en and de straddle mid-key, zh keeps whole
    // (budget exceeds its corpus), fr's zero budget keeps nothing, es is
    // absent from the recipe and drops. The oracle is one per-group
    // prefix window over (qkey desc, id).
    "q108_token_mix" -> ((s, dir) => {
      val keyed = t(s, dir, "documents").select(
          col("doc_id"), col("lang"),
          TextAnalysis.qualityKeyInt(col("text")).as("qkey"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("nt"))
        .transform(graft.CacheScope.persisted(_))
      Sampling.tokenBudgetPerGroup(keyed, "doc_id", "lang", "qkey", "nt",
          Seq("en" -> 6000L, "de" -> 2000L, "zh" -> 5000L, "fr" -> 0L))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_kept"),
          sum(col("nt")).as("tokens_kept"),
          sum(col("doc_id")).as("id_sum"),
          min(col("qkey")).as("min_kept_key"))
        .orderBy(col("lang"))
    }),

    // Pack materialization: q51's assignment actually produced — one row
    // per (shard, pack) with the in-id-order concatenation. md5 of each
    // pack's text pins the exact byte layout of every training sequence
    // while keeping the gate output small.
    "q109_pack_texts" -> ((s, dir) =>
      Packing.materializePacks(
          t(s, dir, "documents")
            .select(col("doc_id"), col("text"),
              TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks")),
          "doc_id", "text", "n_toks", budget = 512L, numShards = 8)
        .select(col("shard"), col("pack"), col("n_docs"), col("pack_tokens"),
          md5(col("pack_text")).as("digest"))
        .orderBy(col("shard"), col("pack"))),

    // Incremental ingest dedup: corpus = "history" (doc_id % 3 != 0),
    // batch = the arriving day (doc_id % 3 == 0) where every EVEN batch
    // id carries a verbatim copy of the corpus doc at id+1 (id+1 ≡ 1
    // mod 3, so the copied text is always in the corpus); odd batch ids
    // keep their own text, which may still collide with history through
    // the corpus's organic exact duplicates — the oracle classifies by
    // joining RAW TEXT, so agreement is the collision check for both
    // the Bloom's xxhash64 and the verification md5.
    "q110_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 3 =!= 0)
      val batch = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("text"))
        .join(docs.select((col("doc_id") - 1).as("doc_id"),
          col("text").as("__next")), Seq("doc_id"))
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 0, col("__next"))
            .otherwise(col("text")).as("text"))
      Dedup.dedupAgainstCorpus(corpus, batch, "doc_id", "text")
        .groupBy(col("is_new"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy(col("is_new"))
    }),

    // IVF index append soundness: build on A (3/4 of the corpus),
    // append B (the rest), then probe with EXACT COPIES of the appended
    // vectors at nprobe=1. An identical vector assigns to the same cell
    // as its twin by construction, so the single probed cell must
    // contain the twin and top-1 must be a perfect match — any appended
    // vector that went to the wrong cell, or was lost, surfaces as a
    // violation row. A count check catches silent write loss. Empty
    // output = sound.
    "q112_ivf_append" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val a = emb.filter(col("vec_id") % 4 =!= 0)
      val b = emb.filter(col("vec_id") % 4 === 0)
      val path = ivfAppendDir
      Similarity.buildIvfIndex(a, "vec_id", "embedding", nlist = 16, path)
      Similarity.ivfAppend(path, b, "vec_id", "embedding")
      // qid shifted so the probe's self-exclusion (qid != id) can't
      // filter the twin
      val queries = b.select(
        (col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val matched = Similarity.ivfTopKIndexed(
          path, queries, "vec_id", "embedding", k = 1, nprobe = 1)
        .filter(col("rank") === 1 && col("sim") > 0.999999)
        .select((col("qid") - 1000000L).as("bid"))
      val missing = b.select(col("vec_id").as("bid"))
        .join(matched, Seq("bid"), "left_anti")
        .select(lit("no_perfect_match").as("kind"), col("bid").as("n"))
      val expected = a.count() + b.count()
      val countViol = s.read.parquet(s"$path/corpus")
        .groupBy().agg(count(lit(1)).as("c"))
        .filter(col("c") =!= expected)
        .select(lit("count_mismatch").as("kind"), col("c").as("n"))
      missing.unionByName(countViol).orderBy(col("kind"), col("n"))
    }),

    // Readability substrate: sentence/word/vowel-group counts (the
    // integer inputs of Flesch-Kincaid-style scores). Terminators
    // planted on the %3 stride so the sentence splitter sees real
    // multi-sentence docs; unplanted docs count as one sentence each.
    "q113_readability" -> ((s, dir) => {
      val planted = t(s, dir, "documents").withColumn("text",
        concat(col("text"),
          when(col("doc_id") % 3 === 0,
            lit(". Plus a short tail! Readable? Yes")).otherwise(lit(""))))
      TextAnalysis.readabilityCounts(planted, "doc_id", "text", Seq("lang"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_sentences")).as("sentences"),
          sum(col("n_words")).as("words"),
          sum(col("n_vowel_groups")).as("vowel_groups"))
        .orderBy(col("lang"))
    }),

    // Multi-epoch mixture: en×2, de×3, zh×1, fr×0 epochs, es absent —
    // the replication volumes AND the epoch tags (sum of 0..k-1 per
    // doc) are both pinned.
    "q114_epoch_mix" -> ((s, dir) =>
      Sampling.epochReplicate(t(s, dir, "documents"), "lang",
          Seq("en" -> 2, "de" -> 3, "zh" -> 1, "fr" -> 0))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("doc_id")).as("id_sum"),
          sum(col("epoch")).as("epoch_sum"))
        .orderBy(col("lang"))),

    // BPE substrate: corpus-wide top-30 adjacent character pairs.
    "q115_char_pairs" -> ((s, dir) =>
      TextAnalysis.charPairCounts(t(s, dir, "documents"), "text", topK = 30))
  )

  /** q102 fixture: per-8-id-group title variants at known edit
    * distances (see the q102 comment for the variant table).
    */
  private def editTitles(docs: DataFrame): DataFrame = {
    val g = call_function("div", col("doc_id"), lit(8L)).cast("string")
    val m = col("doc_id") % 8
    docs.select(col("doc_id"),
      when(m === 0, concat(lit("annual data report "), g, lit(" final")))
        .when(m === 1, concat(lit("annual data reprt "), g, lit(" final")))
        .when(m === 2, concat(lit("annual data rexort "), g, lit(" final")))
        .when(m === 3, concat(lit("annual data repoort "), g, lit(" final")))
        .when(m === 4, concat(lit("annual data rpeort "), g, lit(" final")))
        .when(m === 5, concat(lit("annual data report "), g, lit(" final")))
        .when(m === 6, concat(lit("quarterly summary "), g))
        .otherwise(concat(lit("quarterly sumary "), g))
        .as("title"))
  }

  /** q103/q104 fixture: src host from the doc id, outlinks planted into
    * the text — site{id%13} links site{(3·id+1)%13} always and
    * cdn{id%7}.net on the id%4 stride, so extraction (not edge synthesis)
    * feeds the graph operators.
    */
  private def plantedHostEdges(docs: DataFrame): DataFrame = {
    val planted = docs
      .withColumn("src_host", concat(lit("site"),
        (col("doc_id") % 13).cast("string"), lit(".example.org")))
      .withColumn("text", concat(
        col("text"),
        lit(" see https://site"), ((col("doc_id") * 3 + 1) % 13).cast("string"),
        lit(".example.org/x/"), col("doc_id").cast("string"),
        when(col("doc_id") % 4 === 0, concat(lit(" and https://cdn"),
          (col("doc_id") % 7).cast("string"), lit(".net")))
          .otherwise(lit(""))))
    LinkGraph.hostEdges(planted, "src_host", "text")
  }

  /** Shared q98/q100 gate body: plant a license passage at the head
    * (doc_id % 7) and tail (doc_id % 11) of otherwise-unique documents —
    * invisible to document- and line-level dedup, but every interior
    * 4-gram repeats corpus-wide — run the given span-dedup
    * implementation, and aggregate the cut per source.
    */
  private def spanDedupGate(
      s: SparkSession, dir: String,
      impl: DataFrame => DataFrame): DataFrame = {
    val passage =
      "redistribution and use in source and binary forms are permitted"
    val planted = t(s, dir, "documents").withColumn("text",
      concat_ws(" ",
        when(col("doc_id") % 7 === 0, lit(passage)),
        col("text"),
        when(col("doc_id") % 11 === 0, lit(passage))))
    impl(planted)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_dup_tokens") > 0, 1L).otherwise(0L))
          .as("n_docs_affected"),
        sum(col("n_dup_tokens")).as("n_dup_tokens"),
        sum(col("n_spans")).as("n_spans"),
        sum(length(col("clean_text")).cast("long")).as("clean_chars"),
        countDistinct(md5(col("clean_text"))).as("n_distinct_clean"))
      .orderBy(col("source"))
  }

  /** The q35 oracle: the ENTIRE IVF pipeline in DuckDB SQL, including all
    * 8 Lloyd iterations of the coarse quantizer. Replicability rests on
    * three engine properties: (1) the training sample is the id-ORDERED
    * first 4096 vectors, (2) per-cell sums fold in id order (SQL:
    * `list(v ORDER BY id)` then an ordered `list_reduce` — the same IEEE
    * accumulation sequence), (3) assignment ties break toward the smaller
    * cell (SQL: `row_number() OVER (ORDER BY d2, cell)`). The iteration
    * CTEs are generated by this loop — same shape as q104's unrolled
    * PageRank, just produced programmatically.
    */
  private val IvfOracleSql: String = {
    val d2 =
      """list_reduce(list_prepend(CAST(0 AS DOUBLE),
        [(s.v[i]-c.cv[i])*(s.v[i]-c.cv[i]) for i in range(1, 65)]),
        (acc, x) -> acc + x)"""
    val iters = (0 until 8).map { n =>
      s"""a$n AS (
           SELECT id, v, cell FROM (
             SELECT s.id, s.v, c.cell,
               row_number() OVER (PARTITION BY s.id
                 ORDER BY $d2 ASC, c.cell ASC) AS rn
             FROM samp s CROSS JOIN cents$n c)
           WHERE rn = 1),
         cents${n + 1} AS (
           SELECT c.cell,
             CASE WHEN g.vs IS NULL THEN c.cv
             ELSE [list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     [vv[i] for vv in g.vs]), (acc, x) -> acc + x) / len(g.vs)
                   for i in range(1, 65)]
             END AS cv
           FROM cents$n c LEFT JOIN (
             SELECT cell, list(v ORDER BY id) AS vs FROM a$n GROUP BY cell) g
           ON g.cell = c.cell)"""
    }.mkString(",\n         ")
    s"""WITH allv AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
         samp AS (
           SELECT id, v, row_number() OVER (ORDER BY id) AS rn
           FROM (SELECT id, v FROM allv ORDER BY id LIMIT 4096)),
         nn AS (SELECT count(*) AS n FROM samp),
         cents0 AS (
           SELECT cl.cell, s.v AS cv
           FROM (SELECT unnest(range(0, 16)) AS cell) cl
           JOIN nn ON true
           JOIN samp s ON s.rn = (cl.cell * nn.n) // 16 + 1),
         $iters,
         cassign AS (
           SELECT id, v, cell FROM (
             SELECT s.id, s.v, c.cell,
               row_number() OVER (PARTITION BY s.id
                 ORDER BY $d2 ASC, c.cell ASC) AS rn
             FROM allv s CROSS JOIN cents8 c)
           WHERE rn = 1),
         probes AS (
           SELECT qid, qvec, cell FROM (
             SELECT s.id AS qid, s.v AS qvec, c.cell,
               row_number() OVER (PARTITION BY s.id
                 ORDER BY $d2 ASC, c.cell ASC) AS rn
             FROM allv s CROSS JOIN cents8 c WHERE s.id < 5)
           WHERE rn <= 4),
         cand AS (
           SELECT p.qid, p.qvec, ca.id, ca.v AS vec
           FROM probes p JOIN cassign ca ON ca.cell = p.cell
           WHERE p.qid <> ca.id),
         sc AS (
           SELECT qid, id, list_cosine_similarity(qvec, vec) AS sim
           FROM cand),
         r AS (
           SELECT qid, id, sim,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id)
               AS INTEGER) AS rnk
           FROM sc WHERE sim IS NOT NULL)
         SELECT qid, id, round(sim, 4) AS sim, rnk
         FROM r WHERE rnk <= 10 ORDER BY qid, rnk"""
  }

  private val SpanDedupOracleSql: String =
        """WITH planted AS (
             SELECT doc_id, source,
               concat_ws(' ',
                 CASE WHEN doc_id % 7 = 0 THEN
                   'redistribution and use in source and binary forms are permitted' END,
                 text,
                 CASE WHEN doc_id % 11 = 0 THEN
                   'redistribution and use in source and binary forms are permitted' END)
                 AS text
             FROM documents),
           toks AS (
             SELECT doc_id, source,
               list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS tk
             FROM planted),
           grams AS (
             SELECT doc_id, pos,
               array_to_string(tk[pos : pos + 3], ' ') AS gram
             FROM (SELECT doc_id, tk,
                     unnest(range(1, len(tk) - 4 + 2)) AS pos
                   FROM toks WHERE len(tk) >= 4)),
           freq AS (
             SELECT gram FROM grams GROUP BY gram HAVING count(*) > 2),
           hits AS (
             SELECT doc_id, list_sort(list(pos)) AS ps
             FROM grams JOIN freq USING (gram) GROUP BY doc_id),
           cov AS (
             SELECT t.doc_id, t.source, t.tk,
               coalesce(h.ps, CAST([] AS BIGINT[])) AS ps,
               list_distinct(flatten(
                 [range(p, p + 4) for p in coalesce(h.ps, CAST([] AS BIGINT[]))]))
                 AS covered
             FROM toks t LEFT JOIN hits h USING (doc_id)),
           per_doc AS (
             SELECT doc_id, source,
               CAST(len(covered) AS BIGINT) AS n_dup,
               CAST(CASE WHEN len(ps) = 0 THEN 0
                 ELSE 1 + len([i for i in range(2, len(ps) + 1)
                               if ps[i] - ps[i - 1] > 4]) END AS BIGINT) AS n_spans,
               coalesce(array_to_string(
                 [tk[i] for i in range(1, len(tk) + 1)
                  if NOT list_contains(covered, i)], ' '), '') AS clean
             FROM cov)
           SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN n_dup > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_affected,
             CAST(sum(n_dup) AS BIGINT) AS n_dup_tokens,
             CAST(sum(n_spans) AS BIGINT) AS n_spans,
             CAST(sum(length(clean)) AS BIGINT) AS clean_chars,
             count(DISTINCT md5(clean)) AS n_distinct_clean
           FROM per_doc GROUP BY source ORDER BY source"""

  val oracles: Map[String, String] = Map(
    "q20_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(round(CAST(CAST(sum(len(list_filter(
             regexp_split_to_array(text, '\s+'), x -> x <> ''))) AS DOUBLE)
           / count(*) AS DECIMAL(38,10)), 4) AS DOUBLE) AS avg_tokens,
         CAST(round(CAST(CAST(sum(length(text)) AS DOUBLE)
           / count(*) AS DECIMAL(38,10)), 4) AS DOUBLE) AS avg_chars
         FROM documents GROUP BY lang ORDER BY lang""",
    "q21_quality" ->
      """WITH m AS (
           SELECT lang,
             len(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS nt,
             len(list_distinct(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> ''))) AS ndt,
             length(text) AS nc,
             length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
           FROM documents)
         SELECT lang, round(avg(
           least(1.0, nt / 20.0) * 0.4 +
           (CASE WHEN nt = 0 THEN 0.0 ELSE ndt * 1.0 / nt END) * 0.4 +
           (CASE WHEN nc = 0 THEN 1.0 ELSE np * 1.0 / nc END) * 0.2), 4)
           AS avg_quality
         FROM m GROUP BY lang ORDER BY lang""",
    "q22_langid" ->
      """WITH m AS (
           SELECT lang,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
               AS toks
           FROM documents),
         scored AS (
           SELECT lang,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE len(list_filter(toks, x -> x IN
                    ('the','a','of','to','and','is','in','that','it','for')))
                    * 1.0 / len(toks) END AS r
           FROM m)
         SELECT lang,
           CASE WHEN r >= 0.08 THEN 'en' ELSE 'und' END AS lang_pred,
           count(*) AS n
         FROM scored GROUP BY lang, lang_pred ORDER BY lang, lang_pred""",
    "q23_dedup_exact" ->
      """SELECT source, count(*) AS n_docs,
         count(DISTINCT md5(text)) AS n_unique
         FROM documents GROUP BY source ORDER BY source""",
    "q26_jaccard_pairs" ->
      """WITH d AS (
           SELECT lang, doc_id,
             list_distinct(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS sh
           FROM documents),
         pairs AS (
           SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.sh, b.sh)) * 1.0 /
               len(list_distinct(list_concat(a.sh, b.sh))) AS j
           FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id)
         SELECT lang, id_a, id_b, round(j, 4) AS jaccard
         FROM pairs WHERE j >= 0.5 ORDER BY lang, id_a, id_b""",
    "q27_knn_brute" ->
      """WITH q AS (
           SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
           FROM embeddings WHERE vec_id < 5),
         c AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
         s AS (
           SELECT qid, id, list_cosine_similarity(qvec, vec) AS sim
           FROM q, c WHERE qid <> id),
         r AS (
           SELECT qid, id, sim,
             CAST(row_number() OVER (
               PARTITION BY qid ORDER BY sim DESC, id) AS INTEGER) AS rnk
           FROM s)
         SELECT qid, id, round(sim, 4) AS sim, rnk
         FROM r WHERE rnk <= 10 ORDER BY qid, rnk""",
    "q36_emb_neardup" ->
      """WITH e AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 4) AS sim
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.v, b.v) >= 0.9
         ORDER BY id_a, id_b""",
    "q29_emb_stats" ->
      """SELECT label, count(*) AS n,
         round(avg(sqrt(list_sum(list_transform(
           CAST(embedding AS DOUBLE[]), x -> x * x)))), 4) AS avg_norm
         FROM embeddings GROUP BY label ORDER BY label""",
    "q30_multimodal_bytes" ->
      """SELECT source,
         CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         count(*) AS n
         FROM documents GROUP BY source ORDER BY source""",
    // The sampling oracles replicate Sampling.uniformKey exactly: top 32
    // bits of md5('salt:' || key) over 2^32 — the division by a power of
    // two is exact in IEEE double, so the threshold compares agree
    // bit-for-bit across engines.
    "q42_hash_split" ->
      """WITH u AS (
           SELECT *,
             CAST(concat('0x', substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
               / 4294967296.0 AS u
           FROM documents)
         SELECT CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split,
                count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM u GROUP BY 1 ORDER BY split""",
    "q43_stratified_sample" ->
      """WITH u AS (
           SELECT *,
             CAST(concat('0x', substr(md5(concat('strat:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
               / 4294967296.0 AS u
           FROM documents)
         SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM u
         WHERE u < CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 0.25 ELSE 0.1 END
         GROUP BY lang ORDER BY lang""",
    // DuckDB compares µs-truncated timestamps while Spark compares the raw
    // ns longs; equivalent here because every events.ts is µs-aligned
    // (verified at all SFs) and the window bound is a whole number of µs.
    "q44_range_join" ->
      """SELECT p.event_id AS p_id, count(*) AS n_clicks,
                min(c.event_id) AS min_click_id
         FROM events p JOIN events c
           ON c.ts >= p.ts AND c.ts < p.ts + INTERVAL 5 MINUTE
         WHERE p.event_type = 'purchase' AND c.event_type = 'click'
         GROUP BY p.event_id ORDER BY p_id""",
    "q46_tfidf" ->
      """WITH docs AS (SELECT * FROM documents WHERE doc_id < 100),
         toks AS (
           SELECT doc_id, unnest(list_filter(
             regexp_split_to_array(text, '\s+'), x -> x <> '')) AS term
           FROM docs),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM docs),
         scored AS (
           SELECT tf.doc_id, tf.term,
             tf.tf * ln(n.n_docs * 1.0 / dfreq.df) AS score
           FROM tf JOIN dfreq USING (term) CROSS JOIN n),
         ranked AS (
           SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term) AS rnk
           FROM scored)
         SELECT doc_id, rnk, term, round(score, 4) AS score
         FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""",
    "q45_curation_pipeline" ->
      """WITH m AS (
           SELECT doc_id, text,
             len(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS nt,
             len(list_distinct(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> ''))) AS ndt,
             length(text) AS nc,
             length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
           FROM documents),
         scored AS (
           SELECT doc_id, text,
             least(1.0, nt / 20.0) * 0.4 +
             (CASE WHEN nt = 0 THEN 0.0 ELSE ndt * 1.0 / nt END) * 0.4 +
             (CASE WHEN nc = 0 THEN 1.0 ELSE np * 1.0 / nc END) * 0.2 AS q
           FROM m),
         gated AS (SELECT * FROM scored WHERE q >= 0.75),
         deduped AS (
           SELECT * FROM gated
           QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1)
         SELECT
           CASE WHEN CAST(concat('0x', substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                  / 4294967296.0 < 0.9 THEN 'train' ELSE 'eval' END AS split,
           count(*) AS n, round(avg(q), 4) AS avg_quality
         FROM deduped GROUP BY 1 ORDER BY split""",
    // The gate checks for the hash-defined operators pin the expected
    // EMPTY relation: the Spark side emits the by-construction-impossible
    // rows (see the q38-q41 definitions), so any soundness bug surfaces as
    // a row/hash mismatch against these.
    "q47_sketch_bounds" ->
      """SELECT CAST(NULL AS VARCHAR) AS event_type WHERE false""",
    "q38_minhash_sound" ->
      """SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b
         WHERE false""",
    "q39_simhash_complete" ->
      """SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b
         WHERE false""",
    "q40_ann_lsh_sound" ->
      """SELECT CAST(NULL AS BIGINT) AS qid, CAST(NULL AS BIGINT) AS id,
         CAST(NULL AS DOUBLE) AS sim
         WHERE false""",
    "q41_ann_ivf_sound" ->
      """SELECT CAST(NULL AS BIGINT) AS qid, CAST(NULL AS BIGINT) AS id,
         CAST(NULL AS DOUBLE) AS sim
         WHERE false""",
    // The portable MinHash replicated end-to-end: per-shingle digest pair
    // (poly257/poly263 char folds, the q56 idiom), the 64-member family
    // minima, band collision as SLICE EQUALITY over the 16 x 4 signature
    // layout (the engine's murmur bucket of the same slice is injective up
    // to 2^-32), then exact distinct-set Jaccard >= 0.4 (q26's idiom).
    "q24_minhash_lsh" ->
      """WITH toks AS (
           SELECT doc_id AS id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         sh AS (
           SELECT id,
             list_distinct([array_to_string(l[i:i+1], ' ')
                            for i in range(1, len(l))]) AS sh
           FROM toks WHERE len(l) >= 2),
         hs AS (
           SELECT id, sh,
             [ { 'h1': list_reduce([CAST(unicode(s[j]) AS BIGINT)
                                    for j in range(1, len(s)+1)],
                                   (a, b) -> (a * 257 + b) % 2147483647),
                 'h2': list_reduce([CAST(unicode(s[j]) AS BIGINT)
                                    for j in range(1, len(s)+1)],
                                   (a, b) -> (a * 263 + b) % 2147483647) }
               for s in sh ] AS th
           FROM sh),
         sig AS (
           SELECT id, sh,
             [ list_min([ ((2*i+3) * t.h1 + (7*i*i+11) * t.h2 + 31*i + 7)
                          % 2147483647 for t in th ])
               for i in range(0, 64) ] AS sg
           FROM hs),
         cand AS (
           SELECT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
           FROM sig a JOIN sig b ON a.id < b.id
           WHERE len(list_filter(range(0, 16),
                 b2 -> a.sg[b2*4+1:b2*4+4] = b.sg[b2*4+1:b2*4+4])) > 0)
         SELECT id_a, id_b,
           round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE) /
                 (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))), 4)
             AS jaccard
         FROM cand
         WHERE CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE) /
               (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))) >= 0.4
         ORDER BY id_a, id_b""",
    // The portable SimHash: per-token digest pair, bit j from the parity
    // of family member j, fingerprint kept as a 64-element bit list (so
    // bit 63 never has to ride a signed BIGINT), Hamming by elementwise
    // compare over ALL pairs — no blocking needed because the engine's
    // chunk blocking is pigeonhole-complete at radius 3 (its output IS
    // the full relation).
    "q25_simhash" ->
      """WITH toks AS (
           SELECT doc_id AS id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         hs AS (
           SELECT id,
             [ { 'h1': list_reduce([CAST(unicode(t[j]) AS BIGINT)
                                    for j in range(1, len(t)+1)],
                                   (a, b) -> (a * 257 + b) % 2147483647),
                 'h2': list_reduce([CAST(unicode(t[j]) AS BIGINT)
                                    for j in range(1, len(t)+1)],
                                   (a, b) -> (a * 263 + b) % 2147483647) }
               for t in l ] AS th
           FROM toks),
         bits AS (
           SELECT id,
             [ CASE WHEN list_sum([ CASE WHEN
                   (((2*j+3) * t.h1 + (7*j*j+11) * t.h2 + 31*j + 7)
                    % 2147483647) % 2 = 1
                   THEN 1 ELSE -1 END for t in th ]) > 0 THEN 1 ELSE 0 END
               for j in range(0, 64) ] AS b
           FROM hs)
         SELECT a.id AS id_a, b.id AS id_b,
           CAST(list_sum([CASE WHEN a.b[i] <> b.b[i] THEN 1 ELSE 0 END
                          for i in range(1, 65)]) AS INTEGER) AS hamming
         FROM bits a JOIN bits b ON a.id < b.id
         WHERE list_sum([CASE WHEN a.b[i] <> b.b[i] THEN 1 ELSE 0 END
                         for i in range(1, 65)]) <= 3
         ORDER BY id_a, id_b""",
    // The portable hyperplane LSH: all 5120 plane components regenerated
    // from their "hp|42|g" digests, per-vector 8 x 10-bit sign keys via
    // ordered dot-product folds, candidates where any table's keys are
    // within one bit flip (radius-1 multiprobe), exact-cosine rerank
    // (q27's idiom).
    "q28_ann_lsh" ->
      """WITH pl AS (
           SELECT [CAST(list_reduce(
                     [CAST(unicode(('hp|42|' || CAST(g AS VARCHAR))[j]) AS BIGINT)
                      for j in range(1, len('hp|42|' || CAST(g AS VARCHAR))+1)],
                     (a, b) -> (a * 257 + b) % 2147483647) - 1073741823
                   AS DOUBLE)
                   for g in range(0, 5120)] AS p),
         v AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
         keys AS (
           SELECT id, vec,
             [ list_sum([ CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     [vec[i] * p[(t*10+j)*64 + i] for i in range(1, 65)]),
                     (a, x) -> a + x) > 0
                   THEN CAST(2 ** j AS BIGINT) ELSE 0 END
                 for j in range(0, 10) ])
               for t in range(0, 8) ] AS ks
           FROM v, pl),
         cand AS (
           SELECT q.id AS qid, c.id AS id, q.vec AS qvec, c.vec AS vec
           FROM keys q JOIN keys c ON q.id <> c.id
           WHERE q.id < 5
             AND len(list_filter(range(1, 9),
                   t -> bit_count(xor(q.ks[t], c.ks[t])) <= 1)) > 0),
         s AS (
           SELECT qid, id, list_cosine_similarity(qvec, vec) AS sim
           FROM cand),
         r AS (
           SELECT qid, id, sim,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id)
               AS INTEGER) AS rnk
           FROM s WHERE sim IS NOT NULL)
         SELECT qid, id, round(sim, 4) AS sim, rnk
         FROM r WHERE rnk <= 10 ORDER BY qid, rnk""",
    "q35_ann_ivf" -> IvfOracleSql,
    // Positional n-grams in DuckDB via list comprehension over the token
    // list; all outputs are exact integer sums (see the q48 def comment).
    "q48_repetition" ->
      """WITH t AS (
           SELECT doc_id, lang,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         w AS (
           SELECT doc_id, term, count(*) AS c
           FROM (SELECT doc_id, unnest(l) AS term FROM t)
           GROUP BY doc_id, term),
         ws AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                  count(*) AS n_distinct_words, max(c) AS max_word_count
           FROM w GROUP BY doc_id),
         b AS (
           SELECT doc_id, gram, count(*) AS c
           FROM (SELECT doc_id,
                   unnest([l[i] || ' ' || l[i+1] for i in range(1, len(l))]) AS gram
                 FROM t)
           GROUP BY doc_id, gram),
         bs AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                  count(*) AS n_distinct_bigrams
           FROM b GROUP BY doc_id),
         s AS (
           SELECT t.doc_id, t.lang,
                  ws.n_tokens, ws.n_distinct_words, ws.max_word_count,
                  coalesce(bs.n_bigrams, 0) AS n_bigrams,
                  coalesce(bs.n_distinct_bigrams, 0) AS n_distinct_bigrams
           FROM t JOIN ws USING (doc_id) LEFT JOIN bs USING (doc_id))
         SELECT lang, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                CAST(sum(n_tokens - n_distinct_words) AS BIGINT) AS total_dup_words,
                CAST(sum(n_bigrams - n_distinct_bigrams) AS BIGINT) AS total_dup_bigrams,
                CAST(sum(CASE WHEN max_word_count * 100 > n_tokens * 20
                           OR (n_bigrams - n_distinct_bigrams) * 100 > n_bigrams * 20
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
         FROM s GROUP BY lang ORDER BY lang""",
    "q49_heavy_ngrams" ->
      """WITH t AS (
           SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         g AS (
           SELECT unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
                          for i in range(1, len(l) - 1)]) AS gram
           FROM t)
         SELECT gram, count(*) AS n_occurrences
         FROM g GROUP BY gram
         HAVING count(*) >= 2
         ORDER BY n_occurrences DESC, gram
         LIMIT 20""",
    // Token counts replicate TextAnalysis.tokenCount (whitespace split,
    // empties removed); the pack assignment is the same integer window
    // formula as Packing.packSequences.
    "q51_seq_packing" ->
      """WITH d AS (
           SELECT doc_id, doc_id % 8 AS shard,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
               AS n_toks
           FROM documents),
         p AS (
           SELECT shard, n_toks,
             CAST((sum(n_toks) OVER w - n_toks) // 512 AS BIGINT) AS pack
           FROM d
           WINDOW w AS (PARTITION BY shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING)),
         packs AS (
           SELECT shard, pack, count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS pack_tokens,
             greatest(CAST(sum(n_toks) AS BIGINT) - 512, 0)
               AS overflow_tokens
           FROM p GROUP BY shard, pack)
         SELECT shard, count(*) AS n_packs,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(pack_tokens) AS BIGINT) AS total_tokens,
           max(pack_tokens) AS max_pack_tokens,
           CAST(sum(overflow_tokens) AS BIGINT) AS total_overflow
         FROM packs GROUP BY shard ORDER BY shard""",
    "q54_semdedup_sound" ->
      """SELECT CAST(NULL AS BIGINT) AS bad WHERE false""",
    "q59_ivf_index_parity" ->
      """SELECT CAST(NULL AS BIGINT) AS qid, CAST(NULL AS BIGINT) AS id,
         CAST(NULL AS DOUBLE) AS sim, CAST(NULL AS INTEGER) AS rank
         WHERE false""",
    // Same winnow CTE as q56, then the inverted-index self-join on
    // (lang, fingerprint) with the stop-fingerprint cap.
    "q58_passage_matches" ->
      """WITH toks AS (
           SELECT lang, doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         grams AS (
           SELECT lang, doc_id,
             [array_to_string(l[i:i+2], ' ') for i in range(1, len(l) - 1)] AS gs
           FROM toks),
         hashes AS (
           SELECT lang, doc_id,
             [list_reduce([CAST(unicode(g[j]) AS BIGINT)
                           for j in range(1, length(g)+1)],
                          (a, b) -> (a * 257 + b) % 2147483647)
              for g in gs] AS hs
           FROM grams),
         winnowed AS (
           SELECT lang, doc_id,
             CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
                  WHEN len(hs) <= 4 THEN [list_min(hs)]
                  ELSE [list_min(hs[i:i+3]) for i in range(1, len(hs) - 2)]
             END AS mins
           FROM hashes),
         fp AS (
           SELECT lang, doc_id, unnest(list_distinct(mins)) AS fp
           FROM winnowed),
         rare AS (
           SELECT lang, fp FROM fp GROUP BY lang, fp HAVING count(*) <= 100),
         keyed AS (
           SELECT f.lang, f.doc_id, f.fp
           FROM fp f JOIN rare r ON f.lang = r.lang AND f.fp = r.fp)
         SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
           count(*) AS n_shared
         FROM keyed a JOIN keyed b
           ON a.lang = b.lang AND a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY a.lang, id_a, id_b HAVING count(*) >= 2
         ORDER BY a.lang, id_a, id_b""",
    // Chunk explosion via generate_series; integer ceil-division with
    // DuckDB's // operator. Sums cast to BIGINT per the HUGEINT rule.
    "q57_chunking" ->
      """WITH toks AS (
           SELECT doc_id, lang,
             CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS BIGINT) AS n_toks
           FROM documents),
         chunks AS (
           SELECT doc_id, lang, n_toks, unnest(generate_series(
             CAST(0 AS BIGINT), (n_toks + 63) // 64 - 1)) AS chunk
           FROM toks WHERE n_toks > 0),
         sized AS (
           SELECT doc_id, lang, chunk,
             least(64, n_toks - chunk * 64) AS chunk_tokens
           FROM chunks)
         SELECT lang,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_chunks,
           CAST(sum(chunk_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN chunk_tokens = 64 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_full,
           CAST(max(chunk) AS BIGINT) AS max_chunk_idx
         FROM sized GROUP BY lang ORDER BY lang""",
    // Replicates the winnowing sketch end-to-end: the same polynomial
    // rolling hash over code points ((h*257 + cp) mod 2^31-1 — spaces
    // included between gram words; list_reduce's first-element seed equals
    // the fold-from-0 since 0*257+c = c), the same window-of-4 minima
    // (fewer than 4 gram hashes -> single global min), the same
    // distinctness. Integer sums cast to BIGINT per the HUGEINT rule.
    "q56_winnow_fingerprints" ->
      """WITH toks AS (
           SELECT lang, doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         grams AS (
           SELECT lang, doc_id,
             [array_to_string(l[i:i+2], ' ') for i in range(1, len(l) - 1)] AS gs
           FROM toks),
         hashes AS (
           SELECT lang, doc_id,
             [list_reduce([CAST(unicode(g[j]) AS BIGINT)
                           for j in range(1, length(g)+1)],
                          (a, b) -> (a * 257 + b) % 2147483647)
              for g in gs] AS hs
           FROM grams),
         winnowed AS (
           SELECT lang, doc_id,
             CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
                  WHEN len(hs) <= 4 THEN [list_min(hs)]
                  ELSE [list_min(hs[i:i+3]) for i in range(1, len(hs) - 2)]
             END AS mins
           FROM hashes),
         fp AS (
           SELECT lang, doc_id, list_distinct(mins) AS f FROM winnowed)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(len(f)) AS BIGINT) AS n_fingerprints,
           CAST(sum(coalesce(list_aggregate(f, 'sum'), 0)) AS BIGINT) AS fp_sum
         FROM fp GROUP BY lang ORDER BY lang""",
    // Components via recursive CTE: `reach` enumerates (node, label) for
    // every label reachable from the node; min per node = the component.
    // Pair relation is byte-identical to q26's oracle.
    "q53_dedup_clusters" ->
      """WITH RECURSIVE d AS (
           SELECT lang, doc_id,
             list_distinct(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS sh
           FROM documents),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
             len(list_distinct(list_concat(a.sh, b.sh))) >= 0.95),
         edges AS (
           SELECT id_a AS s, id_b AS t FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT DISTINCT s AS id, s AS label FROM edges
           UNION
           SELECT e.s AS id, r.label FROM edges e JOIN reach r ON r.id = e.t),
         comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
         sizes AS (
           SELECT doc.lang, c.component, count(*) AS sz
           FROM comp c JOIN documents doc ON c.id = doc.doc_id
           GROUP BY doc.lang, c.component)
         SELECT lang, CAST(sum(sz) AS BIGINT) AS n_docs_in_clusters,
           count(*) AS n_clusters, max(sz) AS max_cluster
         FROM sizes GROUP BY lang ORDER BY lang""",
    // Composed from the proven q48/q50/q42/q51 oracle stages.
    "q52_train_pipeline" ->
      """WITH t AS (
           SELECT doc_id, source,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         w AS (
           SELECT doc_id, term, count(*) AS c
           FROM (SELECT doc_id, unnest(l) AS term FROM t)
           GROUP BY doc_id, term),
         ws AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                  count(*) AS n_distinct_words, max(c) AS max_word_count
           FROM w GROUP BY doc_id),
         b AS (
           SELECT doc_id, gram, count(*) AS c
           FROM (SELECT doc_id,
                   unnest([l[i] || ' ' || l[i+1] for i in range(1, len(l))]) AS gram
                 FROM t)
           GROUP BY doc_id, gram),
         bs AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                  count(*) AS n_distinct_bigrams
           FROM b GROUP BY doc_id),
         clean AS (
           SELECT t.doc_id, t.l FROM t
           JOIN ws USING (doc_id) LEFT JOIN bs USING (doc_id)
           WHERE NOT (ws.max_word_count * 100 > ws.n_tokens * 20
             OR (coalesce(bs.n_bigrams, 0) - coalesce(bs.n_distinct_bigrams, 0)) * 100
                > coalesce(bs.n_bigrams, 0) * 20)),
         g4 AS (
           SELECT doc_id,
             unnest(list_distinct(
               [l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
                for i in range(1, len(l) - 2)])) AS gram
           FROM t),
         bench AS (SELECT DISTINCT gram FROM g4 WHERE doc_id % 17 = 0),
         contaminated AS (
           SELECT DISTINCT g4.doc_id FROM g4 JOIN bench USING (gram)
           WHERE g4.doc_id % 17 <> 0),
         decont AS (
           SELECT doc_id, len(l) AS n_toks FROM clean
           WHERE doc_id % 17 <> 0
             AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
         train AS (
           SELECT doc_id, n_toks, doc_id % 4 AS shard FROM decont
           WHERE CAST(concat('0x', substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                   / 4294967296.0 < 0.9),
         p AS (
           SELECT shard,
             CAST((sum(n_toks) OVER win - n_toks) // 512 AS BIGINT) AS pack,
             n_toks
           FROM train
           WINDOW win AS (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING)),
         packs AS (
           SELECT shard, pack, count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS pack_tokens
           FROM p GROUP BY shard, pack)
         SELECT shard, count(*) AS n_packs,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(pack_tokens) AS BIGINT) AS total_tokens
         FROM packs GROUP BY shard ORDER BY shard""",
    "q60_bloom_decontam_sound" ->
      """SELECT CAST(NULL AS BIGINT) AS id WHERE false""",
    "q62_exact_k_sample" ->
      """WITH u AS (
           SELECT doc_id, lang,
             CAST(concat('0x', substr(md5(concat('exactk:',
               CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
               / 4294967296.0 AS u
           FROM documents),
         r AS (
           SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rk
           FROM u)
         SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM r WHERE rk <= 40 GROUP BY lang ORDER BY lang""",
    "q63_normalized_dedup" ->
      """WITH n AS (
           SELECT doc_id, source,
             trim(regexp_replace(regexp_replace(lower(text),
               '[[:punct:]]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
           FROM documents),
         r AS (
           SELECT doc_id, source,
             row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rk
           FROM n)
         SELECT source, count(*) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM r WHERE rk = 1 GROUP BY source ORDER BY source""",
    "q61_quality_cut" ->
      """WITH m AS (
           SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS nt,
             len(list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> x <> ''))) AS ndt,
             length(text) AS nc,
             length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
           FROM documents),
         k AS (
           SELECT doc_id, lang,
             (CASE WHEN nt = 0 THEN 0
                   ELSE least(nt, 20) * 20 + (ndt * 400) // nt END)
             + (CASE WHEN nc = 0 THEN 200 ELSE (np * 200) // nc END) AS qkey
           FROM m),
         r AS (
           SELECT doc_id, lang, qkey,
             row_number() OVER (PARTITION BY lang
                                ORDER BY qkey DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
           FROM k)
         SELECT lang, count(*) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(min(qkey) AS BIGINT) AS min_kept_key
         FROM r WHERE rk * 4 <= n * 3
         GROUP BY lang ORDER BY lang""",
    "q50_decontam" ->
      """WITH t AS (
           SELECT doc_id, source,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         g AS (
           SELECT doc_id, source,
             unnest(list_distinct(
               [l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
                for i in range(1, len(l) - 2)])) AS gram
           FROM t),
         bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0),
         c AS (
           SELECT DISTINCT doc_id, source
           FROM g JOIN bench USING (gram)
           WHERE doc_id % 17 <> 0)
         SELECT source, count(*) AS n_contaminated
         FROM c GROUP BY source ORDER BY source""",
    // Same PII plant as the Spark side; the three patterns are verbatim
    // the operator's (Java-regex/RE2 common subset). DuckDB regexp_replace
    // needs the 'g' flag to match Spark's replace-all semantics.
    "q64_pii" ->
      """WITH planted AS (
           SELECT source,
             text ||
             CASE WHEN doc_id % 5 = 0
               THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
               ELSE '' END ||
             CASE WHEN doc_id % 7 = 0
               THEN ' host 10.' || CAST(doc_id % 250 AS VARCHAR) || '.0.' ||
                 CAST(doc_id % 200 AS VARCHAR)
               ELSE '' END ||
             CASE WHEN doc_id % 11 = 0
               THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
                 '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               ELSE '' END AS text
           FROM documents),
         s AS (
           SELECT source,
             len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             len(regexp_extract_all(text,
               '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b')) AS n_ips,
             len(regexp_extract_all(text,
               '\+?[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
             regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b', '<IP>', 'g'),
               '\+?[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS red
           FROM planted)
         SELECT source,
           CAST(sum(CASE WHEN n_emails + n_ips + n_phones > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_docs_with_pii,
           CAST(sum(n_emails) AS BIGINT) AS n_emails,
           CAST(sum(n_ips) AS BIGINT) AS n_ips,
           CAST(sum(n_phones) AS BIGINT) AS n_phones,
           CAST(sum(length(red)) AS BIGINT) AS redacted_chars,
           CAST(sum(
             len(regexp_extract_all(red,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) +
             len(regexp_extract_all(red,
               '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b')) +
             len(regexp_extract_all(red,
               '\+?[0-9]{3}-[0-9]{3}-[0-9]{4}'))) AS BIGINT) AS residual_pii
         FROM s GROUP BY source ORDER BY source""",
    // Replicates Sampling.deterministicShuffle exactly: u32 = top 32 md5
    // bits, shard = u32 * 8 // 2^32, pos = rank within shard by (u32, id).
    "q65_corpus_shuffle" ->
      """WITH keyed AS (
           SELECT doc_id,
             CAST(concat('0x', substr(md5(concat('shuffle:',
               CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) AS u32
           FROM documents),
         sharded AS (
           SELECT doc_id, u32, (u32 * 8) // 4294967296 AS shard FROM keyed),
         p AS (
           SELECT shard, doc_id,
             row_number() OVER (PARTITION BY shard ORDER BY u32, doc_id) - 1
               AS pos
           FROM sharded)
         SELECT shard, count(*) AS n,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(sum(pos * doc_id) AS BIGINT) AS order_checksum
         FROM p GROUP BY shard ORDER BY shard""",
    // Replicates Sampling.temperatureTargets + temperatureResample:
    // weight = floor(sqrt(n)), target = least(n, 2000*w // sum(w)),
    // kept = first target rows by (md5 u32, id) per source.
    "q66_temperature_mix" ->
      """WITH c AS (
           SELECT source, count(*) AS n FROM documents GROUP BY source),
         w AS (
           SELECT source, n,
             CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS weight
           FROM c),
         t AS (
           SELECT source, n, weight,
             least(n, (2000 * weight) //
               CAST((SELECT sum(weight) FROM w) AS BIGINT)) AS target_n
           FROM w),
         k AS (
           SELECT d.source, d.doc_id,
             row_number() OVER (PARTITION BY d.source ORDER BY
               CAST(concat('0x', substr(md5(concat('temp:',
                 CAST(d.doc_id AS VARCHAR))), 1, 8)) AS BIGINT),
               d.doc_id) AS rk
           FROM documents d),
         kept AS (
           SELECT k.source, k.doc_id
           FROM k JOIN t USING (source) WHERE rk <= target_n)
         SELECT source, count(*) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM kept GROUP BY source ORDER BY source""",
    // q50's gram CTE, but counting shared grams per doc instead of the
    // binary flag. Raw gram strings here vs hashed longs in the engine.
    "q67_contam_overlap" ->
      """WITH t AS (
           SELECT doc_id, source,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         g AS (
           SELECT doc_id, source,
             unnest(list_distinct(
               [l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
                for i in range(1, len(l) - 2)])) AS gram
           FROM t),
         bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0),
         ov AS (
           SELECT c.doc_id, c.source, count(*) AS n_grams,
             sum(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END)
               AS n_shared
           FROM (SELECT * FROM g WHERE doc_id % 17 <> 0) c
           LEFT JOIN bench ON c.gram = bench.gram
           GROUP BY c.doc_id, c.source
           HAVING sum(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END) > 0)
         SELECT source, count(*) AS n_contaminated,
           CAST(sum(n_grams) AS BIGINT) AS total_grams,
           CAST(sum(n_shared) AS BIGINT) AS total_shared,
           CAST(max((n_shared * 100) // n_grams) AS BIGINT) AS max_overlap_pct
         FROM ov GROUP BY source ORDER BY source""",
    // q57's chunk CTE extended with the chunk TEXT (inclusive-end list
    // slice), then the survivor window over its md5. DuckDB slices
    // truncate past the end exactly like Spark's slice(start, length).
    "q69_chunk_dedup" ->
      """WITH toks AS (
           SELECT doc_id, lang,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         sized AS (
           SELECT doc_id, lang, l, CAST(len(l) AS BIGINT) AS nt
           FROM toks WHERE len(l) > 0),
         chunks AS (
           SELECT doc_id, lang, l, nt, unnest(generate_series(
             CAST(0 AS BIGINT), (nt + 63) // 64 - 1)) AS chunk
           FROM sized),
         ct AS (
           SELECT doc_id, lang, chunk,
             md5(array_to_string(l[(chunk*64+1):(chunk*64+64)], ' ')) AS h,
             least(64, nt - chunk * 64) AS chunk_tokens
           FROM chunks),
         r AS (
           SELECT lang, chunk_tokens,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk) AS rk
           FROM ct)
         SELECT lang, count(*) AS n_chunks,
           CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique_chunks,
           CAST(sum(CASE WHEN rk = 1 THEN chunk_tokens ELSE 0 END) AS BIGINT)
             AS tokens_kept,
           CAST(sum(chunk_tokens) AS BIGINT) AS total_tokens
         FROM r GROUP BY lang ORDER BY lang""",
    "q70_sanitize" ->
      """WITH planted AS (
           SELECT source, text ||
             CASE WHEN doc_id % 3 = 0
               THEN chr(7) || 'alert' || chr(27) ELSE '' END ||
             CASE WHEN doc_id % 4 = 0
               THEN chr(8203) || 'zw' || chr(173) ELSE '' END AS text
           FROM documents),
         s AS (
           SELECT source, length(text) AS lc,
             length(regexp_replace(regexp_replace(text,
               '[\t\n\x0B\f\r\x{1C}-\x{1F}\x{0085}]', ' ', 'g'),
               '[\p{Cc}\p{Cf}]', '', 'g')) AS ls
           FROM planted)
         SELECT source,
           CAST(sum(CASE WHEN lc > ls THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_affected,
           CAST(sum(lc - ls) AS BIGINT) AS n_chars_removed,
           CAST(sum(ls) AS BIGINT) AS clean_chars
         FROM s GROUP BY source ORDER BY source""",
    "q71_blockwords" ->
      """WITH m AS (
           SELECT lang,
             len(list_filter(
               list_filter(regexp_split_to_array(lower(text), '\s+'),
                 x -> x <> ''),
               x -> x IN ('merge', 'batch', 'spark'))) AS nb
           FROM documents)
         SELECT lang,
           CAST(sum(CASE WHEN nb > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged_docs,
           CAST(sum(nb) AS BIGINT) AS total_blockwords
         FROM m GROUP BY lang ORDER BY lang""",
    // Per-doc entropy H = log2(n) - sum(c*log2 c)/n over 1-based char
    // indexing; rounded at 4 before min/max and at 3 after avg, exactly
    // like the Spark side.
    "q72_char_entropy" ->
      """WITH chars AS (
           SELECT doc_id, lang,
             unnest([text[i] for i in range(1, length(text) + 1)]) AS ch
           FROM documents WHERE length(text) > 0),
         cc AS (
           SELECT doc_id, lang, ch, count(*) AS c
           FROM chars GROUP BY doc_id, lang, ch),
         ent AS (
           SELECT doc_id, lang, CAST(sum(c) AS BIGINT) AS n_chars,
             round(log2(CAST(sum(c) AS DOUBLE)) -
               sum(c * log2(CAST(c AS DOUBLE))) / sum(c), 4) AS entropy_bits
           FROM cc GROUP BY doc_id, lang)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(entropy_bits), 3) AS avg_entropy_bits,
           min(entropy_bits) AS min_entropy_bits,
           max(entropy_bits) AS max_entropy_bits
         FROM ent GROUP BY lang ORDER BY lang""",
    // The expected metadata comes straight from the doc_id arithmetic the
    // synthetic headers were built from — agreement proves the byte-level
    // construct -> parse round trip is the identity.
    "q73_binary_meta" ->
      """SELECT source, count(*) AS n,
           CAST(sum(doc_id % 1800 + 100) AS BIGINT) AS width_sum,
           CAST(sum(doc_id % 997 + 50) AS BIGINT) AS height_sum,
           CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 44100 ELSE 16000 END)
             AS BIGINT) AS rate_sum,
           CAST(sum(doc_id % 2 + 1) AS BIGINT) AS channel_sum
         FROM documents GROUP BY source ORDER BY source""",
    // The JSONL round trip is the identity on valid rows, so the oracle
    // aggregates the original table directly; the dead-letter row is the
    // 7 planted lines. '___corrupt' sorts before 'src*' in both engines.
    "q79_jsonl" ->
      """SELECT source, count(*) AS n,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM documents GROUP BY source
         UNION ALL
         SELECT '___corrupt' AS source, CAST(7 AS BIGINT) AS n,
           CAST(0 AS BIGINT) AS id_sum
         ORDER BY source""",
    // brute-force cross cosine (LSH can only restrict candidates, never
    // add; at threshold 0.95 the relation is the planted identity pairs)
    "q93_emb_decontam" ->
      """WITH e AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
         r AS (
           SELECT vec_id + 100000 AS vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id % 13 = 0),
         p AS (
           SELECT e.vec_id AS id_a, r.vec_id AS id_b,
             list_cosine_similarity(e.v, r.v) AS sim
           FROM e CROSS JOIN r)
         SELECT count(*) AS n_pairs,
           CAST(sum(id_a) AS BIGINT) AS src_id_sum,
           CAST(sum(id_b - 100000 - id_a) AS BIGINT) AS offset_check,
           round(sum(round(sim, 4)), 1) AS sim_sum
         FROM p WHERE sim >= 0.95""",
    // the q58 winnowing CTE run twice: once over full corpus docs, once
    // over the sliced reference passages (l[5:14], 1-based inclusive ==
    // Spark slice(toks, 5, 10)); stop-fingerprint cap on the corpus side
    "q91_ref_passages" ->
      """WITH toks AS (
           SELECT lang, doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
           FROM documents),
         grams AS (
           SELECT lang, doc_id,
             [array_to_string(l[i:i+2], ' ') for i in range(1, len(l) - 1)] AS gs
           FROM toks),
         hashes AS (
           SELECT lang, doc_id,
             [list_reduce([CAST(unicode(g[j]) AS BIGINT)
                           for j in range(1, length(g)+1)],
                          (a, b) -> (a * 257 + b) % 2147483647)
              for g in gs] AS hs
           FROM grams),
         winnowed AS (
           SELECT lang, doc_id,
             CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
                  WHEN len(hs) <= 4 THEN [list_min(hs)]
                  ELSE [list_min(hs[i:i+3]) for i in range(1, len(hs) - 2)]
             END AS mins
           FROM hashes),
         fp AS (
           SELECT lang, doc_id, unnest(list_distinct(mins)) AS fp
           FROM winnowed),
         rtoks AS (
           SELECT lang, doc_id, l[5:14] AS l
           FROM toks WHERE doc_id % 23 = 0 AND len(l) >= 14),
         rgrams AS (
           SELECT lang, doc_id,
             [array_to_string(l[i:i+2], ' ') for i in range(1, len(l) - 1)] AS gs
           FROM rtoks),
         rhashes AS (
           SELECT lang, doc_id,
             [list_reduce([CAST(unicode(g[j]) AS BIGINT)
                           for j in range(1, length(g)+1)],
                          (a, b) -> (a * 257 + b) % 2147483647)
              for g in gs] AS hs
           FROM rgrams),
         rwinnowed AS (
           SELECT lang, doc_id,
             CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
                  WHEN len(hs) <= 4 THEN [list_min(hs)]
                  ELSE [list_min(hs[i:i+3]) for i in range(1, len(hs) - 2)]
             END AS mins
           FROM rhashes),
         rfp AS (
           SELECT lang, doc_id, unnest(list_distinct(mins)) AS fp
           FROM rwinnowed),
         rare AS (
           SELECT lang, fp FROM fp GROUP BY lang, fp HAVING count(*) <= 100),
         keyed AS (
           SELECT f.lang, f.doc_id, f.fp
           FROM fp f JOIN rare r ON f.lang = r.lang AND f.fp = r.fp),
         pairs AS (
           SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) AS n_shared
           FROM keyed a JOIN rfp b
             ON a.lang = b.lang AND a.fp = b.fp
           GROUP BY a.lang, id_a, id_b HAVING count(*) >= 2)
         SELECT lang, count(*) AS n_pairs,
           count(DISTINCT id_a) AS n_corpus_flagged,
           count(DISTINCT id_b) AS n_refs_matched,
           CAST(sum(n_shared) AS BIGINT) AS shared_total
         FROM pairs GROUP BY lang ORDER BY lang""",
    // chr(239) = U+00EF (i-diaeresis); [[:punct:]] is RE2's spelling of
    // Java \p{Punct}; whitespace class explicit on both sides
    "q90_char_classes" ->
      """WITH planted AS (
           SELECT source, doc_id, text ||
             CASE WHEN doc_id % 3 = 0
               THEN ' na' || chr(239) || 've 3.14!' ELSE '' END AS text
           FROM documents),
         m AS (
           SELECT source,
             length(text) AS c,
             length(text) - length(regexp_replace(text,
               '[A-Za-z]', '', 'g')) AS l,
             length(text) - length(regexp_replace(text,
               '[0-9]', '', 'g')) AS d,
             length(text) - length(regexp_replace(text,
               '[[:punct:]]', '', 'g')) AS p,
             length(text) - length(regexp_replace(text,
               '[ \t\n\x0B\f\r]', '', 'g')) AS w,
             length(text) - length(regexp_replace(text,
               '[^\x00-\x7F]', '', 'g')) AS na
           FROM planted)
         SELECT source,
           CAST(sum(c) AS BIGINT) AS chars,
           CAST(sum(l) AS BIGINT) AS letters,
           CAST(sum(d) AS BIGINT) AS digits,
           CAST(sum(p) AS BIGINT) AS punct,
           CAST(sum(w) AS BIGINT) AS ws,
           CAST(sum(na) AS BIGINT) AS non_ascii,
           CAST(sum(CASE WHEN na > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_non_ascii
         FROM m GROUP BY source ORDER BY source""",
    // brute-force R-S Jaccard within each lang block — the operator's
    // prefix/length/positional filters must reproduce this exactly
    "q88_sim_decontam" ->
      """WITH c AS (
           SELECT doc_id, lang,
             list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS s
           FROM documents),
         b AS (
           SELECT doc_id, lang,
             list_distinct(list_filter(
               string_split_regex(text || ' canary', '\s+'),
               x -> x <> '')) AS s
           FROM documents WHERE doc_id % 17 = 0),
         p AS (
           SELECT c.lang, c.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(c.s, b.s)) * 1.0 /
               (len(c.s) + len(b.s) - len(list_intersect(c.s, b.s))) AS j
           FROM c JOIN b ON c.lang = b.lang
           WHERE len(c.s) > 0 AND len(b.s) > 0)
         SELECT lang, count(*) AS n_pairs,
           count(DISTINCT id_a) AS n_flagged,
           CAST(sum(CAST(round(j, 4) AS DECIMAL(10,4))) AS DOUBLE)
             AS sim_sum
         FROM p WHERE j >= 0.9
         GROUP BY lang ORDER BY lang""",
    // the same four regex passes + six literal replaces, &amp; last;
    // DuckDB regexp_replace takes RE2 inline flags in the pattern and
    // 'g' for global. The whitespace class is explicit ([ \t\n\x0B\f\r])
    // on BOTH sides — Java \s includes VT, RE2 \s does not
    "q87_strip_markup" ->
      """WITH planted AS (
           SELECT source, text ||
             CASE WHEN doc_id % 3 = 0
               THEN ' <p class="m">Tom &amp; Jerry</p>' ELSE '' END ||
             CASE WHEN doc_id % 4 = 0
               THEN ' <script>var x = 1 &lt; 2;</script><b>bold</b>'
               ELSE '' END ||
             CASE WHEN doc_id % 5 = 0
               THEN ' <!-- note --> five&nbsp;&#39;quoted&#39;'
               ELSE '' END AS text
           FROM documents),
         cleaned AS (
           SELECT source, text,
             trim(regexp_replace(
               replace(replace(replace(replace(replace(replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text,
                         '(?is)<script\b[^>]*>.*?</script[ \t\n\x0B\f\r]*>',
                         ' ', 'g'),
                       '(?is)<style\b[^>]*>.*?</style[ \t\n\x0B\f\r]*>',
                       ' ', 'g'),
                     '(?s)<!--.*?-->', ' ', 'g'),
                   '<[^>]+>', ' ', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                 '&#39;', CAST(chr(39) AS VARCHAR)), '&nbsp;', ' '),
                 '&amp;', '&'),
               '[ \t\n\x0B\f\r]+', ' ', 'g')) AS clean
           FROM planted)
         SELECT source,
           CAST(sum(CASE WHEN clean <> text THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_changed,
           CAST(sum(length(text) - length(clean)) AS BIGINT)
             AS n_chars_removed,
           CAST(sum(length(clean)) AS BIGINT) AS clean_chars
         FROM cleaned GROUP BY source ORDER BY source""",
    // same quality-key CTE as q61; the budget cut is the maximal prefix
    // of the (qkey DESC, doc_id) order whose running token sum fits
    "q85_token_budget" ->
      """WITH m AS (
           SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS nt,
             len(list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> x <> ''))) AS ndt,
             length(text) AS nc,
             length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
           FROM documents),
         k AS (
           SELECT doc_id, lang, nt,
             (CASE WHEN nt = 0 THEN 0
                   ELSE least(nt, 20) * 20 + (ndt * 400) // nt END)
             + (CASE WHEN nc = 0 THEN 200 ELSE (np * 200) // nc END) AS qkey
           FROM m),
         c AS (
           SELECT doc_id, lang, qkey, nt,
             sum(nt) OVER (ORDER BY qkey DESC, doc_id) AS cum
           FROM k)
         SELECT lang, count(*) AS n_kept,
           CAST(sum(nt) AS BIGINT) AS tokens_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(min(qkey) AS BIGINT) AS min_kept_key
         FROM c WHERE cum <= 50000
         GROUP BY lang ORDER BY lang""",
    // bigrams via the 1-based list comprehension (i = 1..len-1 pairs
    // l[i] with l[i+1]); tokens are \s+-split so the first space of a
    // bigram string always separates its two words
    "q84_bigram_logprob" ->
      """WITH toks AS (
           SELECT doc_id, lang,
             list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '') AS l
           FROM documents),
         vocab AS (
           SELECT count(DISTINCT t) AS v
           FROM (SELECT unnest(l) AS t FROM toks)),
         bis AS (
           SELECT doc_id, lang,
             unnest([l[i] || ' ' || l[i+1] for i in range(1, len(l))]) AS bg
           FROM toks WHERE len(l) >= 2),
         bgc AS (SELECT bg, count(*) AS c_bg FROM bis GROUP BY bg),
         lfc AS (
           SELECT split_part(bg, ' ', 1) AS w1, count(*) AS c_left
           FROM bis GROUP BY w1),
         scored AS (
           SELECT doc_id, lang, count(*) AS n_bigrams,
             round(avg(log2((c_bg + 1) * 1.0 /
               (c_left + (SELECT v FROM vocab)))), 4) AS avg_log2_prob
           FROM bis
             JOIN bgc USING (bg)
             JOIN lfc ON split_part(bis.bg, ' ', 1) = lfc.w1
           GROUP BY doc_id, lang)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(n_bigrams) AS BIGINT) AS total_bigrams,
           round(avg(avg_log2_prob), 3) AS avg_score,
           min(avg_log2_prob) AS min_score,
           max(avg_log2_prob) AS max_score
         FROM scored GROUP BY lang ORDER BY lang""",
    // chr() code points: 769 = U+0301 combining acute, 778 = U+030A
    // combining ring, 776 = U+0308 combining diaeresis. Both engines
    // count length in code points, so the fold removes exactly one char
    // per combined pair.
    "q83_nfc_normalize" ->
      """WITH planted AS (
           SELECT source, text ||
             CASE WHEN doc_id % 3 = 0 THEN ' cafe' || chr(769)
                  ELSE '' END ||
             CASE WHEN doc_id % 4 = 0
                  THEN ' A' || chr(778) || 'ngstro' || chr(776) || 'm'
                  ELSE '' END AS text
           FROM documents),
         s AS (
           SELECT source, length(text) AS lc,
             length(nfc_normalize(text)) AS ls
           FROM planted)
         SELECT source,
           CAST(sum(CASE WHEN lc > ls THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_changed,
           CAST(sum(lc - ls) AS BIGINT) AS n_marks_folded,
           CAST(sum(ls) AS BIGINT) AS clean_chars
         FROM s GROUP BY source ORDER BY source""",
    "q82_cms_heavy_sound" ->
      """SELECT CAST(NULL AS VARCHAR) AS token,
         CAST(NULL AS BIGINT) AS true_n, CAST(NULL AS BIGINT) AS est_n
         WHERE false""",
    // digest equality == text equality inside EACH engine, so the status
    // classification agrees even though it never compares digests across
    // engines (md5 is standard anyway)
    "q81_corpus_diff" ->
      """WITH old AS (
           SELECT doc_id, md5(text) AS od
           FROM documents WHERE doc_id % 7 <> 0),
         cur AS (
           SELECT doc_id,
             md5(CASE WHEN doc_id % 3 = 0 THEN text || ' [rev2]'
                      ELSE text END) AS cd
           FROM documents WHERE doc_id % 5 <> 0)
         SELECT CASE WHEN od IS NULL THEN 'added'
                     WHEN cd IS NULL THEN 'removed'
                     WHEN od <> cd THEN 'changed'
                     ELSE 'unchanged' END AS status,
           count(*) AS n
         FROM old FULL OUTER JOIN cur USING (doc_id)
         GROUP BY status ORDER BY status""",
    "q78_zorder" ->
      """WITH pts AS (
           SELECT source, CAST(doc_id % 1000 AS BIGINT) AS x,
             CAST((doc_id * 7) % 1000 AS BIGINT) AS y
           FROM documents),
         s1 AS (SELECT source,
             ((x | (x << 16)) & 281470681808895) AS x1,
             ((y | (y << 16)) & 281470681808895) AS y1 FROM pts),
         s2 AS (SELECT source,
             ((x1 | (x1 << 8)) & 71777214294589695) AS x2,
             ((y1 | (y1 << 8)) & 71777214294589695) AS y2 FROM s1),
         s3 AS (SELECT source,
             ((x2 | (x2 << 4)) & 1085102592571150095) AS x3,
             ((y2 | (y2 << 4)) & 1085102592571150095) AS y3 FROM s2),
         s4 AS (SELECT source,
             ((x3 | (x3 << 2)) & 3689348814741910323) AS x4,
             ((y3 | (y3 << 2)) & 3689348814741910323) AS y4 FROM s3),
         s5 AS (SELECT source,
             ((x4 | (x4 << 1)) & 6148914691236517205) AS x5,
             ((y4 | (y4 << 1)) & 6148914691236517205) AS y5 FROM s4),
         zv AS (SELECT source, (x5 | (y5 << 1)) AS z FROM s5)
         SELECT source, count(*) AS n,
           CAST(sum(z) AS BIGINT) AS z_sum,
           CAST(min(z) AS BIGINT) AS z_min,
           CAST(max(z) AS BIGINT) AS z_max
         FROM zv GROUP BY source ORDER BY source""",
    "q77_corpus_profile" ->
      """WITH m AS (
           SELECT source, text,
             len(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS nt
           FROM documents)
         SELECT source, count(*) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS total_tokens,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           count(DISTINCT md5(text)) AS n_unique_texts,
           CAST(min(nt) AS BIGINT) AS min_tokens,
           CAST(max(nt) AS BIGINT) AS max_tokens
         FROM m GROUP BY source ORDER BY source""",
    // The q61 quality-key CTE -> integer weight tier -> one uniform draw
    // per (doc, j<=wt) -> max per doc -> global top-100 by (key desc, id).
    "q76_weighted_sample" ->
      """WITH m AS (
           SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS nt,
             len(list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> x <> ''))) AS ndt,
             length(text) AS nc,
             length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
           FROM documents),
         w AS (
           SELECT doc_id, lang,
             ((CASE WHEN nt = 0 THEN 0
                    ELSE least(nt, 20) * 20 + (ndt * 400) // nt END)
              + (CASE WHEN nc = 0 THEN 200 ELSE (np * 200) // nc END)) // 250
               + 1 AS wt
           FROM m),
         d AS (
           SELECT doc_id, lang,
             unnest(generate_series(CAST(1 AS BIGINT), CAST(wt AS BIGINT)))
               AS j
           FROM w),
         draws AS (
           SELECT doc_id, lang,
             max(CAST(concat('0x', substr(md5(concat('wsample:',
               CAST(doc_id AS VARCHAR), ':', CAST(j AS VARCHAR))), 1, 8))
               AS BIGINT)) AS kdraw
           FROM d GROUP BY doc_id, lang),
         topk AS (
           SELECT doc_id, lang FROM draws
           ORDER BY kdraw DESC, doc_id LIMIT 100)
         SELECT lang, count(*) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM topk GROUP BY lang ORDER BY lang""",
    "q74_unigram_logprob" ->
      """WITH toks AS (
           SELECT doc_id, lang,
             unnest(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS term
           FROM documents),
         freqs AS (SELECT term, count(*) AS tf FROM toks GROUP BY term),
         tot AS (SELECT count(*) AS n FROM toks),
         scored AS (
           SELECT doc_id, lang, count(*) AS n_tokens,
             round(avg(log2(tf * 1.0 / (SELECT n FROM tot))), 4)
               AS avg_log2_prob
           FROM toks JOIN freqs USING (term)
           GROUP BY doc_id, lang)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(avg_log2_prob), 3) AS avg_score,
           min(avg_log2_prob) AS min_score,
           max(avg_log2_prob) AS max_score
         FROM scored GROUP BY lang ORDER BY lang""",
    "q75_url_domains" ->
      """WITH planted AS (
           SELECT doc_id, text ||
             CASE WHEN doc_id % 6 = 0
               THEN ' see https://site' || CAST(doc_id % 13 AS VARCHAR) ||
                 '.example.org/p/' || CAST(doc_id AS VARCHAR)
               ELSE '' END ||
             CASE WHEN doc_id % 9 = 0
               THEN ' ref http://cdn' || CAST(doc_id % 7 AS VARCHAR) || '.net'
               ELSE '' END AS text
           FROM documents),
         u AS (
           SELECT doc_id,
             unnest(regexp_extract_all(text,
               'https?://([A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+)(/[A-Za-z0-9._/%-]*)?',
               1)) AS domain
           FROM planted)
         SELECT domain, count(*) AS n_refs,
           count(DISTINCT doc_id) AS n_docs
         FROM u GROUP BY domain
         ORDER BY n_refs DESC, domain LIMIT 20""",
    "q68_token_hist" ->
      """WITH m AS (
           SELECT lang,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
               AS nt
           FROM documents)
         SELECT lang,
           CASE WHEN nt >= 400 THEN '000400_inf'
                WHEN nt >= 200 THEN '000200_000400'
                WHEN nt >= 100 THEN '000100_000200'
                WHEN nt >= 50 THEN '000050_000100'
                ELSE '000000_000050' END AS bucket,
           count(*) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS total_tokens
         FROM m GROUP BY lang, bucket ORDER BY lang, bucket""",
    // Line frequencies counted on RAW line strings where the engine
    // counts md5 digests — agreement doubles as the collision check.
    // string_agg skips the NULLed (dropped) lines and orders by the
    // original position, exactly array_join(filter(...)); fully-emptied
    // docs coalesce to '' on both sides.
    "q94_line_dedup" ->
      """WITH planted AS (
           SELECT doc_id, source,
             concat_ws(chr(10),
               CASE WHEN doc_id % 5 = 0
                 THEN 'subscribe to our newsletter for daily updates' END,
               text,
               CASE WHEN doc_id % 9 = 0
                 THEN 'all rights reserved by the site owner' END) AS text
           FROM documents),
         lines AS (
           SELECT doc_id, source,
             unnest(string_split(text, chr(10))) AS line,
             generate_subscripts(string_split(text, chr(10)), 1) AS pos
           FROM planted),
         freq AS (
           SELECT line FROM lines GROUP BY line HAVING count(*) > 2),
         marked AS (
           SELECT l.doc_id, l.source, l.line, l.pos,
             (f.line IS NOT NULL) AS dropped
           FROM lines l LEFT JOIN freq f USING (line)),
         per_doc AS (
           SELECT doc_id, source,
             CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed,
             coalesce(string_agg(CASE WHEN NOT dropped THEN line END,
               chr(10) ORDER BY pos), '') AS clean
           FROM marked GROUP BY doc_id, source)
         SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_affected,
           CAST(sum(n_removed) AS BIGINT) AS n_lines_removed,
           CAST(sum(length(clean)) AS BIGINT) AS clean_chars,
           count(DISTINCT md5(clean)) AS n_distinct_clean
         FROM per_doc GROUP BY source ORDER BY source""",
    // Every canonicalization step replicated: fragment strip, scheme/host
    // lowercase, default-port strip, trailing-slash trim, utm_* filter +
    // parameter sort. regexp_extract returns '' on no match in both
    // engines; list_sort ASC == sort_array on ASCII.
    "q95_url_canonical" ->
      """WITH u AS (
           SELECT source,
             CASE WHEN doc_id % 4 = 0
                 THEN 'https://WWW.Example.COM:443/Products/' ||
                   CAST(doc_id % 10 AS VARCHAR) || '/?utm_source=mail&b=2&a=1#frag'
               WHEN doc_id % 4 = 1
                 THEN 'https://www.example.com/Products/' ||
                   CAST(doc_id % 10 AS VARCHAR) || '?a=1&b=2'
               WHEN doc_id % 4 = 2
                 THEN 'HTTP://Site.ORG:8080/a/b?z=' ||
                   CAST(doc_id % 5 AS VARCHAR) || '&utm_campaign=x'
               ELSE 'http://site.org:80/plain/' END AS url
           FROM documents),
         f AS (
           SELECT source, url, regexp_replace(url, '#.*$', '') AS nofrag
           FROM u),
         parts AS (
           SELECT source, url,
             lower(regexp_extract(nofrag,
               '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             lower(regexp_extract(regexp_extract(nofrag,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
               '^([^:]*)', 1)) AS host,
             regexp_extract(regexp_extract(nofrag,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
               ':([0-9]+)$', 1) AS port,
             regexp_replace(regexp_extract(nofrag,
               '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
               '/$', '') AS path,
             list_filter(string_split(
               regexp_extract(nofrag, '\?([^#]*)', 1), '&'),
               x -> x <> '' AND NOT starts_with(x, 'utm_')) AS params
           FROM f),
         canon AS (
           SELECT source, url,
             scheme || '://' || host ||
             CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                    OR (scheme = 'https' AND port = '443')
               THEN '' ELSE ':' || port END ||
             path ||
             CASE WHEN len(params) = 0 THEN ''
               ELSE '?' || array_to_string(list_sort(params), '&') END AS canon
           FROM parts)
         SELECT source, count(*) AS n_urls,
           count(DISTINCT url) AS n_distinct_raw,
           count(DISTINCT canon) AS n_distinct_canonical
         FROM canon GROUP BY source ORDER BY source""",
    // q53's recursive-CTE components + q42's md5 assignment, keyed on
    // coalesce(component, doc_id).
    "q96_leakage_split" ->
      """WITH RECURSIVE d AS (
           SELECT lang, doc_id,
             list_distinct(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS sh
           FROM documents),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
             len(list_distinct(list_concat(a.sh, b.sh))) >= 0.95),
         edges AS (
           SELECT id_a AS s, id_b AS t FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT DISTINCT s AS id, s AS label FROM edges
           UNION
           SELECT e.s AS id, r.label FROM edges e JOIN reach r ON r.id = e.t),
         comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
         keyed AS (
           SELECT doc.doc_id,
             CAST(concat('0x', substr(md5(concat('leak:',
               CAST(coalesce(c.component, doc.doc_id) AS VARCHAR))), 1, 8))
               AS BIGINT) / 4294967296.0 AS u
           FROM documents doc LEFT JOIN comp c ON c.id = doc.doc_id)
         SELECT CASE WHEN u < 0.8 THEN 'train'
                     WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM keyed GROUP BY 1 ORDER BY split""",
    // Expected label recomputed from doc_id directly — construct -> sniff
    // must be the identity (1-byte junk payloads sniff as 'unknown').
    "q97_filetype_sniff" ->
      """SELECT source,
           CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
             WHEN 2 THEN 'jpeg' WHEN 3 THEN 'pdf' WHEN 4 THEN 'zip'
             ELSE 'unknown' END AS kind,
           count(*) AS n
         FROM documents GROUP BY source, kind ORDER BY source, kind""",
    // Gram frequencies counted on RAW k-gram strings where the engine
    // counts md5 digests (q98) / 2^64 rolling-polynomial hashes (q100) —
    // agreement doubles as the collision check for BOTH hash functions.
    // Positions are 1-based here, 0-based in the engine; every output is
    // a count or a reassembled string, so the base never surfaces. A new
    // span starts where the gap between consecutive sorted starts
    // exceeds k (== k is adjacent coverage and merges).
    "q98_span_dedup" -> SpanDedupOracleSql,
    "q100_span_dedup_fast" -> SpanDedupOracleSql,
    // The codec replicated bit-for-bit: CAST(FLOAT[] AS DOUBLE[]) widens
    // exactly, list_max of abs is exact selection, scale is ONE IEEE
    // division, q = floor(x/scale + 0.5) is exact, err recomputes q
    // inline (identical double ops). The error ratio surfaces as an
    // exact integer — floor(err/scale*10000 + 0.5) — because round-to-
    // DECIMAL diverged across engines on a half-way-boundary double
    // (driver round-6 hash mismatch); floor of IEEE ops is bit-portable.
    "q99_embed_quant" ->
      """WITH e AS (
           SELECT label,
             CASE WHEN vec_id % 250 = 0
               THEN list_transform(CAST(embedding AS DOUBLE[]), x -> 0.0)
               ELSE CAST(embedding AS DOUBLE[]) END AS v
           FROM embeddings),
         q AS (
           SELECT label, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
           FROM e),
         r AS (
           SELECT label, scale,
             CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
               ELSE list_transform(v,
                 x -> CAST(floor(x / scale + 0.5) AS INTEGER)) END AS qvec,
             CASE WHEN scale = 0 THEN 0.0
               ELSE list_max(list_transform(v,
                 x -> abs(x - floor(x / scale + 0.5) * scale))) END AS err
           FROM q)
         SELECT label, count(*) AS n_vecs,
           CAST(sum(list_sum(qvec)) AS BIGINT) AS sum_q,
           max(list_max(qvec)) AS max_q,
           min(list_min(qvec)) AS min_q,
           CAST(sum(CASE WHEN err > scale * 0.5000001 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_violations,
           max(CASE WHEN scale > 0
             THEN CAST(floor(err / scale * 10000 + 0.5) AS BIGINT) END)
             AS max_err_ratio_e4,
           CAST(sum(CASE WHEN scale = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_vecs
         FROM r GROUP BY label ORDER BY label""",
    // Both stages replicated: the q99 codec per side, integer dot
    // products via list comprehensions (exact int64 — CAST before the
    // product so 127*127 terms sum wide), the scale-free approximate
    // cosine as one double expression, candidate cut at k*4 by
    // (ascore DESC, id), exact rerank on the float vectors.
    "q101_quantized_rerank" ->
      """WITH cq AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec,
             list_max(list_transform(CAST(embedding AS DOUBLE[]),
               x -> abs(x))) / 127.0 AS scale
           FROM embeddings),
         c AS (
           SELECT id, vec,
             CASE WHEN scale = 0 THEN list_transform(vec, x -> 0)
               ELSE list_transform(vec,
                 x -> CAST(floor(x / scale + 0.5) AS INTEGER)) END AS qv
           FROM cq),
         cn AS (
           SELECT id, vec, qv,
             CAST(list_sum([CAST(qv[i] AS BIGINT) * qv[i]
               for i in range(1, len(qv) + 1)]) AS BIGINT) AS n2
           FROM c),
         qn AS (
           SELECT id AS qid, vec AS qvec, qv AS qqv, n2 AS qn2
           FROM cn WHERE id < 5),
         s AS (
           SELECT q.qid, v.id,
             CAST(list_sum([CAST(v.qv[i] AS BIGINT) * q.qqv[i]
               for i in range(1, len(v.qv) + 1)]) AS DOUBLE) /
               (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(q.qn2 AS DOUBLE)))
               AS ascore
           FROM qn q, cn v
           WHERE q.qid <> v.id AND v.n2 > 0 AND q.qn2 > 0),
         cand AS (
           SELECT qid, id,
             row_number() OVER (PARTITION BY qid ORDER BY ascore DESC, id)
               AS arank
           FROM s),
         exact AS (
           SELECT cand.qid, cand.id,
             list_cosine_similarity(v.vec, q.qvec) AS sim
           FROM cand
           JOIN cn v ON v.id = cand.id
           JOIN qn q ON q.qid = cand.qid
           WHERE cand.arank <= 40),
         r AS (
           SELECT qid, id, sim,
             CAST(row_number() OVER (
               PARTITION BY qid ORDER BY sim DESC, id) AS INTEGER) AS rnk
           FROM exact WHERE sim IS NOT NULL)
         SELECT qid, id, round(sim, 4) AS sim, rnk
         FROM r WHERE rnk <= 10 ORDER BY qid, rnk""",
    // The FULL brute-force levenshtein relation — the only prefilter is
    // the length band |len(a)-len(b)| <= 1, sound because one edit moves
    // length by at most one. Agreement proves the engine's
    // symmetric-delete blocking lost no pair.
    "q102_edit_dedup" ->
      """WITH t AS (
           SELECT doc_id,
             CASE doc_id % 8
               WHEN 0 THEN 'annual data report ' ||
                 CAST(doc_id // 8 AS VARCHAR) || ' final'
               WHEN 1 THEN 'annual data reprt ' ||
                 CAST(doc_id // 8 AS VARCHAR) || ' final'
               WHEN 2 THEN 'annual data rexort ' ||
                 CAST(doc_id // 8 AS VARCHAR) || ' final'
               WHEN 3 THEN 'annual data repoort ' ||
                 CAST(doc_id // 8 AS VARCHAR) || ' final'
               WHEN 4 THEN 'annual data rpeort ' ||
                 CAST(doc_id // 8 AS VARCHAR) || ' final'
               WHEN 5 THEN 'annual data report ' ||
                 CAST(doc_id // 8 AS VARCHAR) || ' final'
               WHEN 6 THEN 'quarterly summary ' ||
                 CAST(doc_id // 8 AS VARCHAR)
               ELSE 'quarterly sumary ' || CAST(doc_id // 8 AS VARCHAR)
             END AS title
           FROM documents),
         p AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             levenshtein(a.title, b.title) AS dist
           FROM t a JOIN t b
             ON a.doc_id < b.doc_id
            AND abs(length(a.title) - length(b.title)) <= 1)
         SELECT CAST(dist AS BIGINT) AS dist,
           count(*) AS n_pairs,
           CAST(sum(id_a) AS BIGINT) AS a_sum,
           CAST(sum(id_b) AS BIGINT) AS b_sum
         FROM p WHERE dist <= 1 GROUP BY dist ORDER BY dist""",
    // Extraction, the distinct edge relation, and both authority joins
    // replicated; hosts that appear only as sources report zeros via the
    // node-list left joins.
    "q103_host_authority" ->
      """WITH planted AS (
           SELECT
             'site' || CAST(doc_id % 13 AS VARCHAR) || '.example.org'
               AS src,
             text || ' see https://site' ||
               CAST((doc_id * 3 + 1) % 13 AS VARCHAR) ||
               '.example.org/x/' || CAST(doc_id AS VARCHAR) ||
               CASE WHEN doc_id % 4 = 0
                 THEN ' and https://cdn' || CAST(doc_id % 7 AS VARCHAR) ||
                   '.net'
                 ELSE '' END AS text
           FROM documents),
         e AS (
           SELECT DISTINCT src, dst FROM (
             SELECT lower(src) AS src,
               lower(unnest(regexp_extract_all(text,
                 '(?i)https?://([A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+)(/[A-Za-z0-9._/%-]*)?',
                 1))) AS dst
             FROM planted)
           WHERE dst <> '' AND src <> dst),
         nodes AS (
           SELECT src AS host FROM e UNION SELECT dst AS host FROM e),
         indeg AS (
           SELECT dst AS host, count(*) AS in_hosts FROM e GROUP BY dst),
         r2 AS (
           SELECT host, count(*) AS reach2 FROM (
             SELECT DISTINCT e2.dst AS host, e1.src AS origin
             FROM e e1 JOIN e e2 ON e1.dst = e2.src
             WHERE e1.src <> e2.dst)
           GROUP BY host)
         SELECT n.host,
           CAST(COALESCE(indeg.in_hosts, 0) AS BIGINT) AS in_hosts,
           CAST(COALESCE(r2.reach2, 0) AS BIGINT) AS reach2
         FROM nodes n
         LEFT JOIN indeg ON indeg.host = n.host
         LEFT JOIN r2 ON r2.host = n.host
         ORDER BY n.host""",
    // The SAME three integer-PageRank iterations unrolled: ranks in
    // micro-units, `//` everywhere Spark uses `div` — the whole
    // quantized diffusion is pinned, not a rounded summary.
    "q104_host_pagerank" ->
      """WITH planted AS (
           SELECT
             'site' || CAST(doc_id % 13 AS VARCHAR) || '.example.org'
               AS src,
             text || ' see https://site' ||
               CAST((doc_id * 3 + 1) % 13 AS VARCHAR) ||
               '.example.org/x/' || CAST(doc_id AS VARCHAR) ||
               CASE WHEN doc_id % 4 = 0
                 THEN ' and https://cdn' || CAST(doc_id % 7 AS VARCHAR) ||
                   '.net'
                 ELSE '' END AS text
           FROM documents),
         e AS (
           SELECT DISTINCT src, dst FROM (
             SELECT lower(src) AS src,
               lower(unnest(regexp_extract_all(text,
                 '(?i)https?://([A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+)(/[A-Za-z0-9._/%-]*)?',
                 1))) AS dst
             FROM planted)
           WHERE dst <> '' AND src <> dst),
         nodes AS (
           SELECT src AS host FROM e UNION SELECT dst AS host FROM e),
         outdeg AS (SELECT src AS host, count(*) AS od FROM e GROUP BY src),
         r0 AS (SELECT host, CAST(1000000 AS BIGINT) AS rank FROM nodes),
         c1 AS (
           SELECT e.dst AS host, CAST(sum(r0.rank // od.od) AS BIGINT) AS s
           FROM e JOIN r0 ON r0.host = e.src
           JOIN outdeg od ON od.host = e.src GROUP BY e.dst),
         r1 AS (
           SELECT n.host,
             CAST(150000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT)
               AS rank
           FROM nodes n LEFT JOIN c1 ON c1.host = n.host),
         c2 AS (
           SELECT e.dst AS host, CAST(sum(r1.rank // od.od) AS BIGINT) AS s
           FROM e JOIN r1 ON r1.host = e.src
           JOIN outdeg od ON od.host = e.src GROUP BY e.dst),
         r2 AS (
           SELECT n.host,
             CAST(150000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT)
               AS rank
           FROM nodes n LEFT JOIN c2 ON c2.host = n.host),
         c3 AS (
           SELECT e.dst AS host, CAST(sum(r2.rank // od.od) AS BIGINT) AS s
           FROM e JOIN r2 ON r2.host = e.src
           JOIN outdeg od ON od.host = e.src GROUP BY e.dst),
         r3 AS (
           SELECT n.host,
             CAST(150000 + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT)
               AS rank
           FROM nodes n LEFT JOIN c3 ON c3.host = n.host)
         SELECT host, rank AS pr FROM r3 ORDER BY pr DESC, host""",
    // Same tokenization as q68 (\s+ split, empties dropped) lowercased;
    // status from pre-coalesce side nullity, frequency classes by
    // multiplication (no division to round), hapax floor on the larger
    // side.
    "q105_vocab_drift" ->
      """WITH o AS (
           SELECT token, count(*) AS old_n FROM (
             SELECT unnest(list_filter(
               string_split_regex(lower(text ||
                 CASE WHEN doc_id % 6 = 0 THEN ' legacyterm' ELSE '' END ||
                 CASE WHEN doc_id % 20 = 4 THEN ' cycletag' ELSE '' END ||
                 CASE WHEN doc_id % 20 = 14
                   THEN ' fadetag fadetag fadetag' ELSE '' END),
               '\s+'), x -> x <> '')) AS token
             FROM documents WHERE doc_id % 10 < 8)
           GROUP BY token),
         c AS (
           SELECT token, count(*) AS new_n FROM (
             SELECT unnest(list_filter(
               string_split_regex(lower(text ||
                 CASE WHEN doc_id % 5 = 0 THEN ' neoterm neoterm' ELSE '' END ||
                 CASE WHEN doc_id % 20 = 4
                   THEN ' cycletag cycletag cycletag' ELSE '' END ||
                 CASE WHEN doc_id % 20 = 14 THEN ' fadetag' ELSE '' END),
               '\s+'), x -> x <> '')) AS token
             FROM documents WHERE doc_id % 10 >= 2)
           GROUP BY token),
         j AS (
           SELECT
             CASE WHEN o.token IS NULL THEN 'added'
                  WHEN c.token IS NULL THEN 'removed'
                  WHEN c.new_n >= 2 * o.old_n THEN 'grown'
                  WHEN 2 * c.new_n <= o.old_n THEN 'shrunk'
                  ELSE 'stable' END AS status,
             COALESCE(o.old_n, 0) AS old_n,
             COALESCE(c.new_n, 0) AS new_n
           FROM o FULL OUTER JOIN c ON o.token = c.token)
         SELECT status, count(*) AS n_tokens,
           CAST(sum(old_n) AS BIGINT) AS old_total,
           CAST(sum(new_n) AS BIGINT) AS new_total
         FROM j WHERE greatest(old_n, new_n) >= 2
         GROUP BY status ORDER BY status""",
    // CASE ladder + LEAST clip, `//` for the utilization — every column
    // an exact integer.
    "q106_length_buckets" ->
      """WITH m AS (
           SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS BIGINT) AS nt
           FROM documents),
         b AS (
           SELECT nt,
             CASE WHEN nt <= 16 THEN 16 WHEN nt <= 32 THEN 32
                  WHEN nt <= 64 THEN 64 ELSE 96 END AS bucket,
             LEAST(nt, CASE WHEN nt <= 16 THEN 16 WHEN nt <= 32 THEN 32
                  WHEN nt <= 64 THEN 64 ELSE 96 END) AS kept
           FROM m)
         SELECT CAST(bucket AS BIGINT) AS bucket,
           count(*) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS token_total,
           CAST(sum(bucket - kept) AS BIGINT) AS padded_tokens,
           CAST(sum(nt - kept) AS BIGINT) AS truncated_tokens,
           CAST(sum(kept) AS BIGINT) * 100 //
             (count(*) * CAST(bucket AS BIGINT)) AS utilization_pct
         FROM b GROUP BY bucket ORDER BY bucket""",
    // q96's recursive components + q85's integer quality key; survivors
    // are rank 1 per coalesce(component, doc_id) by (qkey DESC, doc_id)
    // — singletons are their own component and always survive.
    "q107_best_survivor" ->
      """WITH RECURSIVE d AS (
           SELECT lang, doc_id,
             list_distinct(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS sh
           FROM documents),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
             len(list_distinct(list_concat(a.sh, b.sh))) >= 0.95),
         edges AS (
           SELECT id_a AS s, id_b AS t FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT DISTINCT s AS id, s AS label FROM edges
           UNION
           SELECT e.s AS id, r.label FROM edges e JOIN reach r ON r.id = e.t),
         comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
         m AS (
           SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS nt,
             len(list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> x <> ''))) AS ndt,
             length(text) AS nc,
             length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
           FROM documents),
         k AS (
           SELECT doc_id, lang,
             (CASE WHEN nt = 0 THEN 0
                   ELSE least(nt, 20) * 20 + (ndt * 400) // nt END)
             + (CASE WHEN nc = 0 THEN 200 ELSE (np * 200) // nc END) AS qkey
           FROM m),
         rk AS (
           SELECT k.lang, k.doc_id, k.qkey,
             row_number() OVER (
               PARTITION BY coalesce(c.component, k.doc_id)
               ORDER BY k.qkey DESC, k.doc_id) AS rk
           FROM k LEFT JOIN comp c ON c.id = k.doc_id)
         SELECT lang, count(*) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(sum(qkey) AS BIGINT) AS qkey_sum
         FROM rk WHERE rk = 1 GROUP BY lang ORDER BY lang""",
    // The per-group form of q85's prefix rule: one window partitioned by
    // lang, budgets joined from the recipe VALUES — zero-budget and
    // absent groups fall out identically on both engines.
    "q108_token_mix" ->
      """WITH m AS (
           SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS nt,
             len(list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> x <> ''))) AS ndt,
             length(text) AS nc,
             length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
           FROM documents),
         k AS (
           SELECT doc_id, lang, nt,
             (CASE WHEN nt = 0 THEN 0
                   ELSE least(nt, 20) * 20 + (ndt * 400) // nt END)
             + (CASE WHEN nc = 0 THEN 200 ELSE (np * 200) // nc END) AS qkey
           FROM m),
         b (lang, budget) AS (
           VALUES ('en', 6000), ('de', 2000), ('zh', 5000), ('fr', 0)),
         c AS (
           SELECT k.doc_id, k.lang, k.qkey, k.nt, b.budget,
             sum(k.nt) OVER (
               PARTITION BY k.lang ORDER BY k.qkey DESC, k.doc_id) AS cum
           FROM k JOIN b ON b.lang = k.lang)
         SELECT lang, count(*) AS n_kept,
           CAST(sum(nt) AS BIGINT) AS tokens_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(min(qkey) AS BIGINT) AS min_kept_key
         FROM c WHERE cum <= budget
         GROUP BY lang ORDER BY lang""",
    // q51's window assignment + ordered string_agg: the md5 digest pins
    // every pack's exact byte layout (separator placement included).
    "q109_pack_texts" ->
      """WITH d AS (
           SELECT doc_id, text, doc_id % 8 AS shard,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
               AS n_toks
           FROM documents),
         p AS (
           SELECT shard, doc_id, text, n_toks,
             CAST((sum(n_toks) OVER w - n_toks) // 512 AS BIGINT) AS pack
           FROM d
           WINDOW w AS (PARTITION BY shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING))
         SELECT shard, pack, count(*) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS pack_tokens,
           md5(string_agg(text, ' ' ORDER BY doc_id)) AS digest
         FROM p GROUP BY shard, pack ORDER BY shard, pack""",
    // Classification on RAW TEXT (no hash anywhere): the engine's
    // xxhash64-Bloom + md5-verify composition must land on exactly this
    // relation — agreement doubles as the collision check.
    "q110_incremental_dedup" ->
      """WITH batch AS (
           SELECT a.doc_id,
             CASE WHEN a.doc_id % 2 = 0 THEN b.text ELSE a.text END AS text
           FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
           WHERE a.doc_id % 3 = 0),
         ct AS (
           SELECT DISTINCT text FROM documents WHERE doc_id % 3 <> 0),
         c AS (
           SELECT batch.doc_id, ct.text IS NULL AS is_new
           FROM batch LEFT JOIN ct ON ct.text = batch.text)
         SELECT is_new, count(*) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM c GROUP BY is_new ORDER BY is_new""",
    "q112_ivf_append" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS n
         WHERE false""",
    // The same three RE2-common patterns; both engines trim only 0x20,
    // so blank segments classify identically.
    "q113_readability" ->
      """WITH planted AS (
           SELECT lang, text ||
             CASE WHEN doc_id % 3 = 0
               THEN '. Plus a short tail! Readable? Yes' ELSE '' END AS text
           FROM documents),
         m AS (
           SELECT lang,
             len(list_filter(string_split_regex(text, '[.!?]+'),
               x -> trim(x) <> '')) AS ns,
             len(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS nw,
             len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS nv
           FROM planted)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(ns) AS BIGINT) AS sentences,
           CAST(sum(nw) AS BIGINT) AS words,
           CAST(sum(nv) AS BIGINT) AS vowel_groups
         FROM m GROUP BY lang ORDER BY lang""",
    // range(k) = [0..k-1] (empty at 0) replicates the explode exactly;
    // epoch_sum pins the tag values, not just the volumes.
    "q114_epoch_mix" ->
      """WITH e (lang, epochs) AS (
           VALUES ('en', 2), ('de', 3), ('zh', 1), ('fr', 0)),
         r AS (
           SELECT d.lang, d.doc_id,
             unnest(range(e.epochs)) AS epoch
           FROM documents d JOIN e ON e.lang = d.lang)
         SELECT lang, count(*) AS n_rows,
           count(DISTINCT doc_id) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(sum(epoch) AS BIGINT) AS epoch_sum
         FROM r GROUP BY lang ORDER BY lang""",
    // 1-indexed substring walk, identical tie-break (n DESC, pair ASC).
    "q115_char_pairs" ->
      """WITH p AS (
           SELECT unnest([substr(text, i, 2)
             for i in range(1, length(text))]) AS pair
           FROM documents WHERE length(text) >= 2)
         SELECT pair, count(*) AS n
         FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 30"""
  )
}
