package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: token counting, quality
  * scoring, heuristic language ID, and document fingerprinting. All pure
  * Column expressions (codegen'd); nothing leaves the executor.
  */
object TextAnalysis {

  /** Whitespace tokens with empties removed. */
  def tokens(textCol: Column): Column =
    filter(split(textCol, "\\s+"), t => t =!= "")

  /** Token count — whitespace segmentation. */
  def tokenCount(textCol: Column): Column = size(tokens(textCol))

  /** BPE-ish subword count estimate: word-piece regex segmentation
    * (letters / digits / single punctuation marks), the usual cheap proxy
    * when no tokenizer model is shippable.
    */
  def subwordCount(textCol: Column): Column =
    size(filter(
      split(textCol, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
      t => t =!= "" && t =!= " "))

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")

  /** Fraction of tokens in the stopword list. */
  def stopwordRatio(textCol: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(textCol)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(stopwords.map(_.asInstanceOf[Any]): _*)))
        .cast("double") / size(toks))
  }

  /** Punctuation-character fraction of the raw text. */
  def punctRatio(textCol: Column): Column =
    when(length(textCol) === 0, lit(0.0)).otherwise(
      (length(textCol) - length(regexp_replace(textCol, "[\\p{Punct}]", "")))
        .cast("double") / length(textCol))

  /** Type-token ratio (distinct tokens / tokens) — repetition proxy. */
  def typeTokenRatio(textCol: Column): Column = {
    val toks = tokens(textCol)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(array_distinct(toks)).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: length saturation + lexical
    * diversity + low punctuation noise. Deterministic, documented weights.
    */
  def qualityScore(textCol: Column): Column =
    least(lit(1.0), tokenCount(textCol).cast("double") / 20) * 0.4 +
      typeTokenRatio(textCol) * 0.4 +
      (lit(1.0) - punctRatio(textCol)) * 0.2

  /** Canonical normalized form for dedup keys — the CCNet-style
    * "lowercase dedup" preprocessing: lowercase, punctuation folded to
    * spaces, whitespace collapsed and trimmed. Catches trivially
    * reformatted copies (case, punctuation, spacing) that byte-exact
    * dedup misses. Every step is a codegen'd built-in with an exact
    * DuckDB replication, so normalized-dedup results stay
    * oracle-checkable.
    */
  def normalizeText(textCol: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(textCol), "[\\p{Punct}]", " "), "\\s+", " "))

  /** Integer quality key in [0, 1000] — the RANKING analogue of
    * [[qualityScore]] (same three components: length saturation 0-400,
    * lexical diversity 0-400, low punctuation 0-200) scaled to integers
    * with integral division, so an order or percentile cut over it is
    * bit-stable across engines (a float score can flip a rank comparison
    * in the last ulp between two engines' expression evaluators; an
    * integer can't). DuckDB replication: `//` where this uses `div`.
    */
  def qualityKeyInt(textCol: Column): Column = {
    val toks = tokens(textCol)
    val nt = size(toks).cast("long")
    val ndt = size(array_distinct(toks)).cast("long")
    val nc = length(textCol).cast("long")
    val np = length(regexp_replace(textCol, "[\\p{Punct}]", "")).cast("long")
    when(nt === 0, lit(0L))
      .otherwise(least(nt, lit(20L)) * 20L + call_function("div", ndt * 400L, nt)) +
      when(nc === 0, lit(200L)).otherwise(call_function("div", np * 200L, nc))
  }

  /** Heuristic language ID by stopword-list hit ratio: scores each
    * candidate list, returns the best label or 'und' when nothing clears
    * `minRatio`. N-gram-free variant suited to whitespace languages; the
    * per-language lists are the model.
    */
  def langId(
      textCol: Column,
      profiles: Map[String, Seq[String]] = Map(
        "en" -> Seq("the", "a", "of", "to", "and", "is", "in", "that", "it", "for"),
        "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
        "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu", "mit", "den"),
        "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est", "que")),
      minRatio: Double = 0.08): Column = {
    val toks = tokens(textCol)
    val n = size(toks)
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val r = when(n === 0, lit(0.0)).otherwise(
        size(filter(toks, t => t.isin(words.map(_.asInstanceOf[Any]): _*)))
          .cast("double") / n)
      struct(r.as("score"), lit(lang).as("lang"))
    }
    // greatest() requires >= 2 args; a single-profile model degenerates to
    // its own score struct.
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    when(best.getField("score") >= minRatio, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** 64-bit rolling fingerprint of the token sequence (order-sensitive,
    * unlike SimHash): acc' = rotl5(acc) XOR h(t), folded left-to-right.
    * Pure bit ops — wraps silently, so it stays safe under ANSI mode where
    * a multiplicative rolling hash would raise ARITHMETIC_OVERFLOW.
    */
  def fingerprint64(textCol: Column): Column =
    aggregate(
      tokens(textCol),
      lit(0L),
      (acc, t) =>
        shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59))
          .bitwiseXOR(xxhash64(t)))

  /** Winnowed LOCAL fingerprints (MOSS winnowing over word k-grams):
    * where [[fingerprint64]] identifies a whole document, these detect
    * SHARED PASSAGES — any common token run of length >= k + window - 1
    * between two documents is guaranteed at least one common fingerprint,
    * at a ~2/(window+1) sampling rate of the gram hashes. Corpus-level
    * passage matching is then an equi-join on (fingerprint) — sketch
    * values through the shuffle, never text. Engine-portable polynomial
    * hash (see HashExprs.WinnowedFingerprints; q56 replicates it in SQL).
    */
  def winnowedFingerprints(textCol: Column, k: Int = 3, window: Int = 4): Column =
    graft.functions.HashExprs.winnowedFingerprints(tokens(textCol), k, window)

  /** Top-k characteristic terms per document by tf-idf: score(d, t) =
    * tf(d, t) * ln(N / df(t)), ties broken alphabetically. The classic
    * inverted-index pipeline shape re-expressed relationally:
    * explode -> (doc, term) counts -> term document frequencies -> scalar
    * N broadcast -> per-doc top-k.
    *
    * Scale: two hash aggregations (both map-side partial) and a window
    * whose partial top-k Spark prunes before the exchange
    * (WindowGroupLimit). Shuffles carry (id, term, tf) triples — term
    * strings travel once, texts never. N rides a scalar subquery
    * (Dataset.scalar, Spark 4.1): the count subplan executes once and its
    * value is injected into the scoring expression — no driver-side
    * collect in THIS plan's construction, no crossJoin, and therefore no
    * one-row BroadcastNestedLoopJoin; the library's no-nested-loop
    * invariant (PlanShapeSpec) stays uniform.
    */
  def tfidfTopTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val toks = df.select(
      col(idCol).as("id"),
      explode(tokens(col(textCol))).as("term"))
    // persisted: tf feeds both the df aggregation and the scoring join —
    // without it the tokenize+explode+aggregate subplan (the expensive
    // stage) runs twice. Sketch-sized (id, term, tf) triples, same
    // lifetime contract as the Dedup/Similarity persists (released by
    // CacheScope.scoped when the caller bounds it).
    val tf = toks.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .transform(graft.CacheScope.persisted)
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("n_docs")).scalar()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .withColumn(
        "score",
        col("tf") * log(nDocs.cast("double") / col("df")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("id"), col("rnk"), col("term"), round(col("score"), 4).as("score"))
  }

  /** Control/format-character sanitation — the encoding-hygiene stage of
    * a web-corpus pipeline (stray BEL/ESC from broken scrapes, zero-width
    * and soft-hyphen format characters that poison tokenization and
    * dedup keys). Whitespace/line-structure control characters (tab, LF,
    * VT, FF, CR, the FS-US separators 0x1C-0x1F, and NEL U+0085 — the
    * Unicode-mandated line terminator EBCDIC conversions emit) become a
    * SPACE first — deleting them would glue the tokens on either side of
    * every line break into words that never existed — then the remaining
    * Cc/Cf strip outright. Both classes are in the Java-regex/RE2 common
    * subset (\x{..} hex escapes included), so a SQL oracle runs the same
    * two patterns. Codegen'd per-row projection, no shuffle.
    */
  def sanitizeText(textCol: Column): Column =
    regexp_replace(
      regexp_replace(textCol, "[\\t\\n\\x0B\\f\\r\\x{1C}-\\x{1F}\\x{0085}]", " "),
      "[\\p{Cc}\\p{Cf}]", "")

  /** Count of word-list tokens in the lowercased text — the C4-style
    * blocklist gate (the list is the model; membership is exact token
    * equality, not substring, so "class" never trips a "ass" entry).
    */
  def blockwordCount(textCol: Column, words: Seq[String]): Column =
    size(filter(tokens(lower(textCol)),
      t => t.isin(words.map(_.toLowerCase).map(_.asInstanceOf[Any]): _*)))
      .cast("long")

  /** Per-document character-distribution Shannon entropy (bits/char) —
    * the cheap perplexity proxy: binary junk and repeated-char spam sit
    * far from natural-language entropy (~4 bits/char for English) in
    * either direction, so a [min,max] entropy gate removes both.
    *
    * Relational formulation: explode characters -> (id, char) counts ->
    * H = log2(n) - sum(c*log2 c)/n per id (the algebraic rearrangement
    * of -sum(p log2 p) that needs only per-char counts). Two
    * map-side-combined hash aggs; the exchange carries (id, single-char,
    * count). Zero-length documents have no characters and are absent
    * from the output — left-join and coalesce if a 0.0 row is needed.
    */
  def charEntropyStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(split(col(textCol), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("id"), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(
        sum(col("c")).as("n_chars"),
        count(lit(1)).as("n_distinct_chars"),
        sum(col("c") * log2(col("c"))).as("__clogc"))
      .withColumn("entropy_bits",
        round(log2(col("n_chars")) - col("__clogc") / col("n_chars"), 4))
      .drop("__clogc")

  /** Corpus-unigram log-probability scoring — the relational skeleton of
    * the CCNet/KenLM perplexity filter with the corpus's own unigram
    * distribution as the model: score(d) = avg over tokens t of
    * log2(tf(t) / N). Documents far below the language's typical score
    * are gibberish/rare-token spam; far above are stopword soup — both
    * prune with a two-sided cut, same as an LM-perplexity gate.
    *
    * Plan: one (term, tf) aggregation joined back to the exploded tokens
    * (terms travel once, texts never); corpus token total N rides a
    * scalar subquery (no crossJoin/BNL — the library invariant). The
    * token frame persists (CacheScope contract) because it feeds the
    * frequency table, the total, and the scoring join.
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(
        col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .transform(graft.CacheScope.persisted)
    val freqs = toks.groupBy(col("term")).agg(count(lit(1)).as("tf"))
    val total = toks.agg(count(lit(1)).as("n")).scalar()
    toks.join(freqs, "term")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(log2(col("tf").cast("double") / total.cast("double"))), 4)
          .as("avg_log2_prob"))
  }

  /** Character-class profile — the encoding audit a multilingual corpus
    * runs before tokenizer training (how much of each source is letters
    * vs digits vs punctuation; which slices carry non-ASCII and need
    * script-aware handling). Each count is length(text) minus the length
    * with that class removed — pure codegen'd projections, all integer,
    * every class in the Java-regex/RE2 common subset ([[:punct:]] is the
    * oracle spelling of \p{Punct}; whitespace is the explicit class —
    * Java \s has VT, RE2 \s does not; non-ASCII is the complement of
    * \x00-\x7F). Returns (id, carryCols..., n_chars, n_letters,
    * n_digits, n_punct, n_ws, n_non_ascii) — `carryCols` pass through so
    * a per-group rollup needs no join back to the source frame.
    */
  def charClasses(
      df: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String] = Nil): DataFrame = {
    def n(cls: String): Column =
      (length(col(textCol)) -
        length(regexp_replace(col(textCol), cls, ""))).cast("long")
    df.select(
      (col(idCol).as("id") +: carryCols.map(col)) ++ Seq(
        length(col(textCol)).cast("long").as("n_chars"),
        n("[A-Za-z]").as("n_letters"),
        n("[0-9]").as("n_digits"),
        n("[\\p{Punct}]").as("n_punct"),
        n("[ \\t\\n\\x0B\\f\\r]").as("n_ws"),
        n("[^\\x00-\\x7F]").as("n_non_ascii")): _*)
  }

  /** Corpus-wide adjacent character-pair frequencies — the first
    * iteration of BPE merge-table training (the most frequent adjacent
    * pair is the first merge), and a cheap byte-level corpus signature.
    * Pairs are raw adjacencies including spaces; a word-boundary-aware
    * variant just pre-splits the text. Pairs are built map-side by an
    * indexed substring walk (no self-join), so only the DISTINCT pair
    * vocabulary — at most |alphabet|² rows — ever shuffles, with
    * map-side combine; top-k plans as TakeOrderedAndProject.
    */
  def charPairCounts(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    val pairs = when(length(col(textCol)) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(col(textCol)) - 1),
        i => col(textCol).substr(i, lit(2))))
    df.select(explode(pairs).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)
  }

  /** Sentence / word / vowel-group counts — the integer substrate of
    * readability scoring (Flesch-Kincaid and friends are fixed affine
    * maps over exactly these three ratios; vowel-group runs are the
    * classic cheap syllable proxy). Emitting the COUNTS rather than a
    * float score keeps the operator oracle-exact and lets the consumer
    * pick the formula; all three are RE2-common regex counts, so a SQL
    * oracle runs the SAME patterns. A text with no sentence terminators
    * counts as one sentence (its whole body). Map-side projection.
    */
  def readabilityCounts(
      df: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String] = Nil): DataFrame =
    df.select(
      (col(idCol).as("id") +: carryCols.map(col)) ++ Seq(
        size(filter(split(col(textCol), "[.!?]+"), s => trim(s) =!= ""))
          .cast("long").as("n_sentences"),
        tokenCount(col(textCol)).cast("long").as("n_words"),
        regexp_count(col(textCol), lit("[aeiouyAEIOUY]+"))
          .cast("long").as("n_vowel_groups")): _*)

  /** HTML/markup stripping — the text-extraction stage between a raw web
    * crawl and every operator above (quality scores, n-grams and dedup
    * keys are garbage when half the "tokens" are tag soup). Four passes,
    * all in the Java-regex/RE2 common subset so a SQL oracle runs the
    * SAME patterns: (1) script/style elements drop WITH their contents
    * (code is not prose — each tag matched against its own closer, never
    * cross-paired), (2) comments drop, (3) remaining tags become spaces
    * (deleting them would glue "...</p><p>..." into one word), (4) the
    * five ubiquitous entities unescape — &amp; LAST, or "&amp;lt;" would
    * double-unescape — then whitespace collapses and trims. The
    * whitespace class is written EXPLICITLY ([ \t\n\x0B\f\r]) because
    * Java's \s includes vertical tab while RE2's does not — a bare \s
    * here would silently diverge from the SQL oracle on VT-bearing
    * text. Codegen'd per-row projection, no shuffle.
    *
    * Deliberately NOT a full HTML5 parser (no entity table, no nesting
    * recovery): this is the deterministic, engine-portable 95% that
    * boilerplate-removal pipelines (C4, CCNet) actually run before
    * heuristic extraction.
    */
  def stripMarkup(textCol: Column): Column = {
    val ws = "[ \\t\\n\\x0B\\f\\r]" // explicit: Java \s has VT, RE2 \s doesn't
    val noScript = regexp_replace(textCol,
      s"(?is)<script\\b[^>]*>.*?</script$ws*>", " ")
    val noStyle = regexp_replace(noScript,
      s"(?is)<style\\b[^>]*>.*?</style$ws*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        call_function("replace", c, lit(from), lit(to))
      }
    trim(regexp_replace(unescaped, s"$ws+", " "))
  }

  /** Corpus-bigram log-probability scoring with add-k smoothing — one
    * Markov order above [[unigramLogProb]], and the smallest model that
    * catches word-salad (every token common, every ADJACENT PAIR rare):
    * score(d) = avg over bigrams (w1,w2) of
    * log2((C(w1 w2) + k) / (C(w1 ·) + k·V)), V = corpus vocabulary.
    * With integer k both numerator and denominator are exact integers,
    * so any engine reproduces the ratios bit-for-bit before the log.
    *
    * Plan: bigrams are built MAP-SIDE from the token array (zip_with of
    * the array against its own shift — no positional self-join, no
    * extra shuffle); the bigram frame persists (CacheScope contract)
    * because it feeds the bigram counts, the left-context counts, and
    * the scoring joins; V rides a scalar subquery (no crossJoin/BNL).
    * Only (id, bigram) strings travel — document text never shuffles.
    */
  def bigramLogProb(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 1): DataFrame = {
    require(k >= 1, s"add-k smoothing needs k >= 1, got $k")
    val bis = df
      .select(col(idCol).as("id"), tokens(col(textCol)).as("l"))
      .filter(size(col("l")) >= 2)
      .select(col("id"), explode(zip_with(
        slice(col("l"), lit(1), size(col("l")) - 1),
        slice(col("l"), lit(2), size(col("l")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .transform(graft.CacheScope.persisted(_))
    val bgCounts = bis.groupBy(col("bg")).agg(count(lit(1)).as("c_bg"))
    val leftCounts = bis.groupBy(col("w1")).agg(count(lit(1)).as("c_left"))
    val vocab = df
      .select(explode(tokens(col(textCol))).as("t"))
      .agg(count_distinct(col("t")).as("v")).scalar()
    bis.join(bgCounts, "bg").join(leftCounts, "w1")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(log2(
          (col("c_bg") + lit(k.toLong)).cast("double") /
            (col("c_left") + lit(k.toLong) * vocab).cast("double"))), 4)
          .as("avg_log2_prob"))
  }

  /** Trigram "stupid backoff" language-model scoring of a held-out
    * split against counts from a training split (Brants et al. 2007,
    * "Large Language Models in Machine Translation" — the backoff form
    * built for exactly this setting: counts at corpus scale, no
    * normalization pass). Per held-out trigram (w1 w2 w3):
    *
    *   S = c3(w1 w2 w3) / c2(w1 w2)            if the trigram was seen
    *     = α · c2(w2 w3) / c1(w2)              else if the tail bigram was
    *     = α² · (c1(w3) + 1) / (N + V)         else (add-one unigram floor,
    *                                            so unseen words stay finite)
    *
    * scored as log2(S), averaged per document. Unlike the in-corpus
    * bigram scorer ([[bigramLogProb]]), training on one split and
    * scoring another makes every backoff tier actually fire — which is
    * the quality-filtering use: held-out perplexity under a corpus LM
    * is the classic CCNet/KenLM quality signal. The per-tier hit counts
    * are part of the output relation, so the gate pins the branch
    * decisions as integers, not just the blended float.
    *
    * All ratios are exact-integer over exact-integer and every float
    * expression tree (α·(a/b), α·α·(a/b)) is mirrored verbatim in the
    * oracle, the q84 precedent. Plan/scale: held-out trigrams build
    * MAP-SIDE (zip_with of the token array against its own shifts — no
    * positional self-join); count tables are vocabulary-sized; N and V
    * ride scalar subqueries (no crossJoin/BNL). The five count joins
    * shuffle (id, ngram-string) frames only — text never moves.
    */
  def trigramBackoffLogProb(
      train: DataFrame, heldOut: DataFrame,
      idCol: String, textCol: String,
      alpha: Double = 0.4): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"backoff alpha must be in (0,1), got $alpha")
    def toks(df: DataFrame): DataFrame =
      df.select(col(idCol).as("id"), tokens(col(textCol)).as("l"))
    def grams(df: DataFrame, n: Int): DataFrame = {
      val sliced = (0 until n).map(i =>
        slice(col("l"), lit(i + 1), size(col("l")) - (n - 1)))
      val joined = sliced.reduceLeft((a, b) =>
        zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
      toks(df).filter(size(col("l")) >= n)
        .select(col("id"), explode(joined).as("g"))
    }
    val c1 = grams(train, 1).groupBy(col("g").as("w")).agg(count(lit(1)).as("c1"))
    val c2 = grams(train, 2).groupBy(col("g").as("bg")).agg(count(lit(1)).as("c2"))
    val c3 = grams(train, 3).groupBy(col("g").as("tg")).agg(count(lit(1)).as("c3"))
    val nTokens = grams(train, 1).agg(count(lit(1)).cast("double").as("n")).scalar()
    val vocab = c1.agg(count(lit(1)).cast("double").as("v")).scalar()
    val tris = grams(heldOut, 3)
      .withColumn("w3", substring_index(col("g"), " ", -1))
      .withColumn("ctx", substring_index(col("g"), " ", 2))
      .withColumn("tail", substring_index(col("g"), " ", -2))
    val a = lit(alpha)
    val score =
      when(col("c3").isNotNull,
        log2(col("c3").cast("double") / col("c2_ctx")))
      .when(col("c2_tail").isNotNull,
        log2(a * (col("c2_tail").cast("double") / col("c1_w2"))))
      .otherwise(
        log2(a * a * ((coalesce(col("c1_w3"), lit(0L)) + lit(1L)).cast("double") /
          (nTokens + vocab))))
    val tier =
      when(col("c3").isNotNull, lit("tri"))
        .when(col("c2_tail").isNotNull, lit("bi"))
        .otherwise(lit("uni"))
    tris
      .join(c3.withColumnRenamed("tg", "g"), Seq("g"), "left")
      .join(c2.select(col("bg").as("ctx"), col("c2").as("c2_ctx")), Seq("ctx"), "left")
      .join(c2.select(col("bg").as("tail"), col("c2").as("c2_tail")), Seq("tail"), "left")
      .join(c1.select(col("w").as("w1w2"), col("c1").as("c1_w2"))
        .withColumnRenamed("w1w2", "w2key"),
        col("w2key") === substring_index(col("tail"), " ", 1), "left")
      .join(c1.select(col("w").as("w3"), col("c1").as("c1_w3")), Seq("w3"), "left")
      .withColumn("lp", score)
      .withColumn("tier", tier)
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_trigrams"),
        sum(when(col("tier") === "tri", 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("tier") === "bi", 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("tier") === "uni", 1L).otherwise(0L)).as("n_uni"),
        round(avg(col("lp")), 4).as("avg_log2_prob"))
  }

  private val BpeSep = "\u001f"

  /** One BPE merge round — merge (a, b) applied corpus-wide as the
    * canonical LEFT-TO-RIGHT NON-OVERLAPPING rule, as a single codegen'd
    * aggregate() string fold over a U+001F-separated accumulator (see
    * [[bpeMerges]] for why the fold IS the merge). Shared by training
    * ([[bpeMerges]]) and encoding ([[bpeEncode]]) so the two can never
    * drift.
    */
  private def mergeFold(l: Column, a: String, b: String): Column =
    when(size(l) <= 1, l).otherwise(split(
      aggregate(
        slice(l, lit(2), size(l) - 1),
        element_at(l, 1),
        (acc, x) =>
          when((acc === lit(a) || acc.endsWith(lit(BpeSep + a))) && x === lit(b),
            concat(acc, lit("_"), lit(b)))
            .otherwise(concat(acc, lit(BpeSep), x))),
      lit(BpeSep)))

  /** Apply a TRAINED merge table to a corpus — the tokenizer-SERVICE
    * half of BPE: [[bpeMerges]] elects merges once (on a sample at
    * 100 TB); this operator applies them, in training order, to every
    * document. The whole table applies as ONE codegen'd expression
    * ([[graft.functions.BpeExprs.BpeEncodeApply]]): plan size is O(1)
    * in the merge count, so a production-scale table (32k merges) costs
    * the same analyzer/codegen work as a toy one — the chained
    * one-fold-per-merge form this replaced was linear in plan nodes and
    * capped at 64 rounds by codegen method limits
    * ([[bpeEncodeChained]], kept as the spec cross-check). Encoding is
    * a PURE MAP — no shuffle, no UDF, no driver round-trips — which is
    * exactly what lets it run inline in a 100 TB ingest pass. U+001F is
    * folded to a space before tokenizing (the training-side guarantee,
    * applied identically so trained merges see the same token stream).
    * Returns (id, tokens): the merged symbol array per document (empty
    * texts keep their empty arrays — encoding drops nothing).
    */
  def bpeEncode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "merge table must be non-empty")
    val base = tokens(translate(col(textCol), BpeSep, " "))
    df.select(
      col(idCol).as("id"),
      graft.functions.BpeExprs.bpeEncode(base, merges).as("tokens"))
  }

  /** The pre-round-15 chained-fold encode: `merges.length` nested
    * [[mergeFold]] expressions, one per training round, each bound once
    * with the one-element-array transform (the cdcChunks defense —
    * without it round k re-evaluates round k-1 ~5x, 5^n total).
    * SUPERSEDED by [[bpeEncode]]'s single-expression form for
    * production but kept package-private as the independent semantic
    * model: [[graft.functions.BpeExprs]] must stay fold-for-fold equal
    * to it, and the spec pins that equality on every corpus shape.
    * Cap note: the historical cap claimed 64 rounds, but nested
    * higher-order functions cost one analyzer Resolution pass per
    * nesting level and the analyzer's own iteration cap (100) trips
    * near ~40 rounds (BpeBench measured chain64 failing resolution) —
    * the honest cap is 32, one more reason the expression form is the
    * production path.
    */
  private[graft] def bpeEncodeChained(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty && merges.length <= 32,
      s"merge table must have 1..32 rounds (each is a chained fold " +
        s"expression costing an analyzer pass), got ${merges.length}")
    val base = tokens(translate(col(textCol), BpeSep, " "))
    val encoded = merges.foldLeft(base) { case (l, (a, b)) =>
      element_at(transform(array(l), x => mergeFold(x, a, b)), 1)
    }
    df.select(col(idCol).as("id"), encoded.as("tokens"))
  }

  /** BPE-style tokenizer merge training, word-level: `rounds` iterations
    * of (count adjacent pairs) -> (pick the most frequent pair, ties to
    * the lexicographically smaller) -> (merge every LEFT-TO-RIGHT
    * NON-OVERLAPPING occurrence corpus-wide, the canonical BPE rule —
    * "a a a" under merge (a,a) yields [a_a, a], one application, not
    * two). Sennrich et al. 2016's algorithm, run on whitespace tokens
    * instead of characters so the merge table is inspectable at corpus
    * scale; the merged symbol is `a + "_" + b`.
    *
    * The merge is a sequential fold, which SQL and Spark both lack as a
    * primitive over arrays-with-replacement — so it runs as ONE
    * `aggregate()` lambda per document over a string accumulator: the
    * last emitted token is `acc`'s suffix after the U+001F separator,
    * and appending "_b" to the accumulator IS the merge of its last
    * token. U+001F is NOT regex whitespace, so a raw corpus token could
    * contain it and corrupt the fold (spurious endsWith matches, token
    * fragmentation at the final split) — tokenization here therefore
    * FOLDS U+001F to a space first, guaranteeing the separator cannot
    * occur inside any token; the oracle applies the identical
    * replace(chr(31) -> ' ') so both engines tokenize the same stream.
    * Entirely codegen'd builtins, no UDF. A corpus token that already
    * contains '_' can collide with a merged symbol's name; both engines
    * treat the string identically, so determinism holds (documented
    * limitation of readable merge names).
    *
    * Per round: pair counting is a map-side zip_with explode + one
    * vocabulary-sized hash aggregate; the argmax is ONE collected row
    * (bounded driver step, `rounds` total — the Dedup.connectedComponents
    * precedent); the fold is map-side. Output: one row per round —
    * (round, pair_a, pair_b, pair_count, tokens_after), where
    * pair_count is the adjacent-occurrence count that won the round
    * (overlaps included) and tokens_after the corpus token total after
    * applying the merge — TOGETHER they pin the non-overlap semantics
    * (tokens_after > tokens_before - pair_count exactly when overlaps
    * collapsed).
    */
  def bpeMerges(
      df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"rounds must be in [1, 16] (each costs a driver round-trip), got $rounds")
    val spark = df.sparkSession
    var cur = df
      .select(tokens(translate(col(textCol), BpeSep, " ")).as("l"))
      .filter(size(col("l")) > 0)
      .transform(graft.CacheScope.persisted(_))
    // tokens_after never pays its own action: it rides an observe()
    // metric on each merged frame, filled for free when the NEXT
    // round's pair scan materializes that frame — only the final round
    // needs one explicit count() to flush its observation (2 actions
    // per round -> rounds + 1 total).
    val merges = (1 to rounds).map { r =>
      val top = cur.filter(size(col("l")) >= 2)
        .select(explode(zip_with(
          slice(col("l"), lit(1), size(col("l")) - 1),
          slice(col("l"), lit(2), size(col("l")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      require(top.nonEmpty, s"corpus ran out of adjacent pairs at round $r")
      val (a, b, cnt) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      val obs = org.apache.spark.sql.Observation(s"bpe_tokens_r$r")
      val next = cur.select(mergeFold(col("l"), a, b).as("l"))
        .observe(obs, sum(size(col("l")).cast("long")).as("t"))
        .transform(graft.CacheScope.persisted(_))
      cur = next
      (r, a, b, cnt, obs)
    }
    cur.count() // flush the final round's observation
    val stats = merges.map { case (r, a, b, cnt, obs) =>
      (r, a, b, cnt, obs.get("t").asInstanceOf[Long])
    }
    import spark.implicits._
    stats.toDF("round", "pair_a", "pair_b", "pair_count", "tokens_after")
  }

  /** Persist a trained BPE merge table as an ESTATE ARTIFACT — the
    * production half of the [[bpeMerges]]/[[bpeEncode]] pair: training
    * elects merges once (on a sample, at 100 TB), but every ingest pass
    * from then on must encode with the SAME table, by generation — an
    * in-session Seq dies with the session and silently retrains on the
    * next one (vocabulary drift between pipeline runs is a
    * train-corpus-poisoning bug, not a tuning knob). Layout follows the
    * index estates: `<path>/merges` parquet (round, pair_a, pair_b,
    * pair_count, tokens_after — the training provenance rides along),
    * `<path>/stats` one row (n_merges), written under the
    * [[StableRead]] commit bracket so the artifact carries a manifest
    * generation and probes/loads can run against live republishes.
    * Refuses a malformed table loudly BEFORE writing (contiguous
    * 1..n rounds, no duplicate pairs — [[graft.operators.Fsck.bpeFsck]]
    * audits the same invariants at rest).
    */
  def bpeSave(
      spark: org.apache.spark.sql.SparkSession,
      merges: DataFrame,
      path: String): Unit = {
    val rows = merges
      .select(col("round").cast("long"), col("pair_a"), col("pair_b"),
        col("pair_count").cast("long"), col("tokens_after").cast("long"))
      .orderBy(col("round"))
      .collect() // vocabulary-sized by construction (<= rounds rows)
    require(rows.nonEmpty, "bpeSave: empty merge table")
    val ranks = rows.map(_.getLong(0)).toSeq
    require(ranks == (1L to rows.length.toLong),
      s"bpeSave: rounds must be contiguous 1..n, got ${ranks.mkString(",")}")
    val pairs = rows.map(r => (r.getString(1), r.getString(2))).toSeq
    require(pairs.distinct.size == pairs.size,
      "bpeSave: duplicate merge pair — the table is not a valid BPE history")
    StableRead.withMaintenanceMarker(spark, path) {
      import spark.implicits._
      // tmp + swap/rename (Sinks.landTable): a re-save over a LIVE
      // artifact must not overwrite committed files in place. The two
      // landings are one-row tables on disjoint paths — overlap their
      // fixed per-action scheduler/commit overhead (the round-18
      // write-path trim; the writer context propagates through
      // concurrently, so the swap notes attribute to this bracket)
      graft.operators.Retrieval.concurrently(
        () => graft.sinks.Sinks.landTable(
          rows.map(r => (r.getLong(0), r.getString(1), r.getString(2),
              r.getLong(3), r.getLong(4))).toSeq
            .toDF("round", "pair_a", "pair_b", "pair_count", "tokens_after")
            .coalesce(1),
          path, "merges"),
        () => graft.sinks.Sinks.landTable(
          Seq(rows.length.toLong).toDF("n_merges").coalesce(1),
          path, "stats"))
    }
  }

  /** Load a [[bpeSave]] artifact as the merge Seq [[bpeEncode]] takes,
    * in training order. Validates what a silent corruption would break:
    * contiguous ranks (a missing round re-orders every later merge),
    * no duplicate pairs, and the stats scalar matching the table (a
    * torn republish). Fails loudly — an encoder running on a corrupt
    * table poisons every document it touches.
    */
  def bpeLoad(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] = {
    val rows = spark.read.parquet(s"$path/merges")
      .select(col("round").cast("long"), col("pair_a"), col("pair_b"))
      .orderBy(col("round"))
      .collect()
    require(rows.nonEmpty, s"bpeLoad: empty merge table at $path")
    val ranks = rows.map(_.getLong(0)).toSeq
    require(ranks == (1L to rows.length.toLong),
      s"bpeLoad: non-contiguous rounds at $path (${ranks.mkString(",")})")
    val pairs = rows.map(r => (r.getString(1), r.getString(2))).toSeq
    require(pairs.distinct.size == pairs.size,
      s"bpeLoad: duplicate merge pair at $path")
    val n = spark.read.parquet(s"$path/stats")
      .select(col("n_merges")).collect()(0).getLong(0)
    require(n == pairs.size,
      s"bpeLoad: stats claim $n merges, table holds ${pairs.size} at $path")
    pairs
  }

  /** URL references per document: full matches and their host domains,
    * extracted with one RE2-compatible pattern (provenance/outlink
    * analysis for web corpora — link-farm detection, per-domain corpus
    * composition). The host must be dotted labels ending alphanumeric —
    * a greedy `[A-Za-z0-9.-]+` would absorb a sentence-final period
    * ("see http://b.net.") and fragment the per-domain counts — and the
    * path, when present, must start with '/'. Returns (id, url, domain)
    * exploded rows; aggregate for per-domain stats. Map-side regexp
    * scan, no shuffle here.
    */
  def urlRefs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pat = "https?://([A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)+)(/[A-Za-z0-9._/%-]*)?"
    df.select(
        col(idCol).as("id"),
        explode(regexp_extract_all(col(textCol), lit(pat), lit(0))).as("url"))
      .withColumn("domain",
        regexp_extract(col("url"), pat, 1))
  }

  /** URL canonicalization — the CCNet/RefinedWeb pre-dedup step that
    * collapses the many spellings of one resource before URL-keyed dedup
    * or per-domain accounting: scheme and host lowercase (path stays
    * case-sensitive per RFC 3986 §6.2.2.1), fragment dropped, default
    * ports stripped (http:80 / https:443; others kept), one trailing
    * slash trimmed from the path, query parameters with tracking keys
    * (`utm_*`) removed and the rest SORTED so parameter order can't split
    * a dedup key. Every step is a codegen'd built-in (regexp_extract /
    * sort_array / array_join) in the Java-regex/RE2 common subset, so a
    * SQL oracle replicates the whole pipeline verbatim (q95). Map-side
    * projection, no shuffle.
    */
  def canonicalizeUrl(urlCol: Column): Column = {
    val noFrag = regexp_replace(urlCol, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val host = lower(regexp_extract(hostPort, "^([^:]*)", 1))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portPart = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"),
      lit("")).otherwise(concat(lit(":"), port))
    val path = regexp_replace(
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/$", "")
    val params = filter(
      split(regexp_extract(noFrag, "\\?([^#]*)", 1), "&"),
      p => p =!= "" && !p.startsWith("utm_"))
    val queryPart = when(size(params) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(sort_array(params), "&")))
    concat(scheme, lit("://"), host, portPart, path, queryPart)
  }

  /** Token-length histogram per group: integer bucket edges (ascending)
    * label each document with the half-open range its token count falls
    * in, then count and total per (group, bucket) — the corpus-profiling
    * step that sizes context-window budgets and flags truncation loss
    * before a training run. Labels are lexicographically ordered by
    * construction (zero-padded lower edge) so a plain ORDER BY walks the
    * buckets in range order. Integer comparisons only — any engine
    * reproduces the assignment exactly. One map-side-combined hash agg;
    * cardinality = groups x buckets.
    */
  def tokenHistogram(
      df: DataFrame, groupCol: String, textCol: String,
      edges: Seq[Int]): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted && edges.distinct == edges,
      s"edges must be ascending and distinct, got $edges")
    val nt = tokenCount(col(textCol)).cast("long")
    def lab(lo: Int, hi: Option[Int]): String =
      f"$lo%06d_${hi.map(h => f"$h%06d").getOrElse("inf")}"
    val bucket = edges.zip(edges.drop(1).map(Some(_)) :+ None).foldRight(
      lit(lab(0, Some(edges.head))): Column) { case ((lo, hi), rest) =>
      val cond = hi match {
        case Some(h) => nt >= lo && nt < h
        case None    => nt >= lo
      }
      when(cond, lab(lo, hi)).otherwise(rest)
    }
    df.groupBy(col(groupCol), bucket.as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(nt).as("total_tokens"))
  }

  /** One-call corpus profile per group — the integer core of a dataset
    * card: doc/token/char volume, exact-duplicate rate (via distinct
    * content digests), and the token-count spread. Single hash
    * aggregation; every column is an exact integer so the numbers are
    * engine-portable. Pair with [[tokenHistogram]] and
    * [[charEntropyStats]] for the full card.
    */
  def corpusProfile(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast("long")).as("total_tokens"),
        sum(length(col(textCol)).cast("long")).as("total_chars"),
        countDistinct(md5(col(textCol))).as("n_unique_texts"),
        min(tokenCount(col(textCol)).cast("long")).as("min_tokens"),
        max(tokenCount(col(textCol)).cast("long")).as("max_tokens"))

  /** In-engine Naive-Bayes quality classifier — the CCNet/fastText-style
    * "train a cheap linear model on a trusted slice, score the crawl"
    * stage, with multinomial NB as the model so training is nothing but
    * counting (two hash aggregations) and the whole thing stays
    * oracle-replicable.
    *
    * Train: docs with `idCol < seedMax` are the seed; label = [[
    * qualityScore]] >= threshold (the q45 gate rule, so the float
    * boundary is the already-proven one). Per-term class counts with
    * add-one smoothing over the seed vocabulary V give
    * w(t) = ln((c⁺+1)/(T⁺+V)) − ln((c⁻+1)/(T⁻+V)); the class prior is
    * ln(n⁺/n⁻).
    *
    * Score: every doc with `idCol >= seedMax` gets
    * score = prior + Σ_occurrences w(t). Terms outside the seed
    * vocabulary are IGNORED (inner join — the standard unseen-term
    * treatment for NB scoring; smoothing only covers terms some class
    * saw). Docs whose tokens are all unseen produce no row — they carry
    * no evidence either way. pred = score > 0.
    *
    * Plan/scale: seed counting is two vocabulary-sized hash aggregations;
    * the weight table is vocabulary-sized and joins the exploded target
    * tokens (term strings travel once; texts never shuffle — the q74
    * shape). The five training scalars (class doc/token totals, V) are
    * one-row bounded collects so degenerate seeds (a class with zero
    * docs) fail loudly here instead of emitting NaN scores downstream.
    */
  def nbQualityScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      seedMax: Long,
      threshold: Double = 0.75): DataFrame = {
    require(seedMax > 0, s"seedMax must be positive, got $seedMax")
    val labeled = df
      .filter(col(idCol) < seedMax)
      .select(
        col(idCol).as("id"),
        col(textCol).as("text"),
        (qualityScore(col(textCol)) >= threshold).as("pos"))
    val docRow = labeled
      .agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("n_neg"))
      .collect()(0)
    val (nPos, nNeg) = (docRow.getLong(0), docRow.getLong(1))
    require(
      nPos > 0 && nNeg > 0,
      s"NB training needs both classes in the seed; got pos=$nPos neg=$nNeg " +
        s"(seedMax=$seedMax, threshold=$threshold)")
    val counts = labeled
      .select(col("pos"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("cpos"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("cneg"))
      .transform(graft.CacheScope.persisted)
    val totRow = counts
      .agg(
        sum(col("cpos")).as("tp"),
        sum(col("cneg")).as("tn"),
        count(lit(1)).as("v"))
      .collect()(0)
    val (totPos, totNeg, vocab) =
      (totRow.getLong(0), totRow.getLong(1), totRow.getLong(2))
    val prior = math.log(nPos.toDouble / nNeg.toDouble)
    val weights = counts.select(
      col("term"),
      (log((col("cpos") + lit(1L)).cast("double") / lit((totPos + vocab).toDouble)) -
        log((col("cneg") + lit(1L)).cast("double") / lit((totNeg + vocab).toDouble)))
        .as("w"))
    df.filter(col(idCol) >= seedMax)
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .join(weights, "term")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("w")).as("sum_w"))
      .select(
        col("id"),
        col("n_terms"),
        (lit(prior) + col("sum_w")).as("score"),
        (lit(prior) + col("sum_w") > lit(0.0)).as("pred"))
  }

  /** Char-n-gram multinomial Naive-Bayes language classifier — the CCNet
    * language-ID stage as a TRAINED model rather than the [[langId]]
    * stopword heuristic: every per-language curation operator downstream
    * consumes a `lang` column; this is the operator that produces one
    * from a labeled slice.
    *
    * Train (docs with `idCol < seedMax`, label = `langCol`): per-gram
    * per-class counts with add-one smoothing over the seed's gram
    * vocabulary V give w(g, c) = ln((count(g, c) + 1) / (T_c + V)); the
    * class prior is ln(n_c / N_seed). Classes are the seed's distinct
    * labels (bounded driver collect — a label set is small by nature).
    *
    * Score (docs with `idCol >= seedMax`): score(d, c) = prior_c +
    * Σ_{gram occurrences g of d} w(g, c); the prediction is the argmax
    * class, margin = best − runner-up (the abstention signal a pipeline
    * thresholds on). Grams outside the seed vocabulary are IGNORED
    * (inner join — the [[nbQualityScores]] unseen-term treatment), so a
    * doc whose grams are all unseen, or shorter than n chars, yields no
    * row: it carries no evidence for any class.
    *
    * Grams are the n-char substrings at every position (whitespace
    * included — word-boundary n-grams are exactly what separates
    * languages sharing an alphabet), by CHARACTER offset in both engines
    * so multibyte corpora classify identically.
    *
    * Plan/scale: the [[nbQualityScores]] shape widened to k classes —
    * training is ONE vocabulary-sized hash aggregation (one count column
    * per class), the class totals and V are one bounded collect, and the
    * weight table unpivots to (gram, class, w) — every vocab gram carries
    * ALL k class weights, so each scored doc has all k score rows and the
    * argmax/margin window is total. Gram strings travel once into each
    * aggregation; texts never shuffle. The argmax is a per-doc window
    * over exactly k rows.
    */
  /** The n-char substring grams of `textCol` at every position, exploded
    * with `keep` carried — shared by training, in-session scoring, and
    * model-file scoring so the three can never tokenize differently.
    */
  private def charGrams(
      frame: DataFrame, textCol: String, n: Int, keep: Column): DataFrame =
    frame
      .filter(length(col(textCol)) >= n)
      .select(
        keep,
        explode(transform(
          sequence(lit(1), length(col(textCol)) - (n - 1)),
          i => col(textCol).substr(i, lit(n)))).as("gram"))

  /** Score documents against a trained (weights, priors) NB model — the
    * shared back half of [[langIdScores]] and [[langIdScoresIndexed]].
    * `priors` must be sorted by class label (the argmax tie-break order).
    */
  private def scoreLangId(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame, // (gram, lang, w)
      priors: Seq[(String, Double)],
      n: Int): DataFrame = {
    val priorCol = priors.foldRight(lit(Double.NaN): Column) {
      case ((l, p), rest) => when(col("lang") === l, lit(p)).otherwise(rest)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("score").desc, col("lang"))
    charGrams(docs, textCol, n, col(idCol).as("id"))
      // the weight table is SEED-bounded (seed vocabulary x classes),
      // constant in the corpus size — broadcast it so the corpus-sized
      // gram stream never shuffles for the scoring join
      .join(broadcast(weights), "gram")
      .groupBy(col("id"), col("lang"))
      .agg(count(lit(1)).as("n_grams"), sum(col("w")).as("sw"))
      .withColumn("score", priorCol + col("sw"))
      .withColumn("rnk", row_number().over(w))
      .withColumn("runner_up", lead(col("score"), 1).over(w))
      .filter(col("rnk") === 1)
      .select(
        col("id"),
        col("lang").as("pred"),
        col("n_grams"),
        col("score"),
        (col("score") - col("runner_up")).as("margin"))
  }

  /** Train the char-n-gram NB model over the `idCol < seedMax` labeled
    * seed: returns (weights (gram, lang, w), priors sorted by class
    * label — the argmax tie-break order). The ONE training path behind
    * both [[langIdScores]] (in-session) and [[saveLangIdModel]]
    * (persisted) — shared exactly the way [[scoreLangId]] shares the
    * scoring back half, so a smoothing or prior change can never drift
    * one form from the other and break the q144/q151 same-relation
    * contract. Per-class gram-count columns are POSITIONALLY named
    * (c_0, c_1, ...): a class label containing '.', spaces, or
    * backticks never reaches a column name. The seed's gram counts are
    * a bounded hash aggregate (seed vocabulary x classes); the totals
    * read is one vocabulary-row reduction to a single driver row.
    */
  private def trainLangId(
      df: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      seedMax: Long,
      n: Int): (DataFrame, Seq[(String, Double)]) = {
    require(seedMax > 0, s"seedMax must be positive, got $seedMax")
    require(n >= 1 && n <= 8, s"gram length must be in [1, 8], got $n")
    val labeled = df.filter(col(idCol) < seedMax)
    val classRows = labeled
      .groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("nd"))
      .orderBy(col("lang"))
      .collect()
    require(classRows.length >= 2,
      s"language-ID training needs >= 2 classes in the seed, got " +
        s"${classRows.length} (seedMax=$seedMax)")
    val langs = classRows.map(_.getString(0)).toSeq
    val nSeed = classRows.map(_.getLong(1)).sum
    val priors = classRows
      .map(r => r.getString(0) -> math.log(r.getLong(1).toDouble / nSeed))
      .toSeq
    val countCols = langs.zipWithIndex.map { case (l, i) =>
      sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"c_$i") }
    val counts = charGrams(labeled, textCol, n, col(langCol).as("lang"))
      .groupBy(col("gram"))
      .agg(countCols.head, countCols.tail: _*)
      .transform(graft.CacheScope.persisted)
    val totCols =
      langs.indices.map(i => sum(col(s"c_$i")).as(s"t_$i")) :+
        count(lit(1)).as("v")
    val totRow = counts.agg(totCols.head, totCols.tail: _*).collect()(0)
    val vocab = totRow.getLong(langs.length)
    val weights = counts
      .select(
        col("gram"),
        explode(array(langs.zipWithIndex.map { case (l, i) => struct(
          lit(l).as("lang"),
          log((col(s"c_$i") + lit(1L)).cast("double") /
            lit((totRow.getLong(i) + vocab).toDouble)).as("w")) }: _*)).as("lw"))
      .select(col("gram"), col("lw.lang").as("lang"), col("lw.w").as("w"))
    (weights, priors)
  }

  def langIdScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      seedMax: Long,
      n: Int = 3): DataFrame = {
    val (weights, priors) = trainLangId(df, idCol, textCol, langCol, seedMax, n)
    scoreLangId(
      df.filter(col(idCol) >= seedMax), idCol, textCol, weights, priors, n)
  }

  /** Persist a trained language-ID model — the train-once/score-many
    * shape the persisted indexes already have (buildBm25Index /
    * buildIvfIndex), for MODELS: at 100 TB the labeled seed is scanned
    * once and the (vocabulary x classes) weight table plus the priors
    * land on disk; every later corpus pass scores against the files.
    * Layout: `weights/` (gram, lang, w), `meta/` (lang, prior, n — one
    * row per class, n duplicated for self-description). Doubles round-
    * trip parquet bit-exactly, so indexed scoring equals in-session
    * scoring bit-for-bit (spec + the q151 gate pin it against q144's
    * verbatim oracle).
    */
  def saveLangIdModel(
      df: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      seedMax: Long,
      path: String,
      n: Int = 3): Unit = {
    val spark = df.sparkSession
    val (weights, priors) = trainLangId(df, idCol, textCol, langCol, seedMax, n)
    // tmp + swap/rename (Sinks.landTable): never overwrite a live
    // artifact's committed files in place
    graft.sinks.Sinks.landTable(weights, path, "weights")
    import spark.implicits._
    graft.sinks.Sinks.landTable(
      priors.map { case (l, p) => (l, p, n) }
        .toDF("lang", "prior", "n")
        .coalesce(1),
      path, "meta")
  }

  /** Score a corpus against a [[saveLangIdModel]] model: identical
    * output relation to [[langIdScores]] over the same seed (the gram
    * length is recovered from the model files, never trusted to a
    * caller — a drifted n would silently mis-tokenize). The weight
    * table is vocabulary-sized and broadcasts; scoring is the shared
    * [[scoreLangId]] back half, so the two paths cannot diverge.
    */
  def langIdScoresIndexed(
      path: String,
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val meta = spark.read.parquet(s"$path/meta")
      .select(col("lang"), col("prior"), col("n"))
      .collect()
      .sortBy(_.getString(0))
    require(meta.nonEmpty, s"langIdScoresIndexed: empty model at $path")
    val n = meta.head.getInt(2)
    val priors = meta.map(r => r.getString(0) -> r.getDouble(1)).toSeq
    scoreLangId(
      docs, idCol, textCol,
      spark.read.parquet(s"$path/weights"), priors, n)
  }

  /** Per-document analysis frame: id + all text metrics. */
  def analyze(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      tokenCount(col(textCol)).as("n_tokens"),
      subwordCount(col(textCol)).as("n_subwords"),
      length(col(textCol)).as("n_chars"),
      round(stopwordRatio(col(textCol)), 6).as("stopword_ratio"),
      round(typeTokenRatio(col(textCol)), 6).as("type_token_ratio"),
      round(punctRatio(col(textCol)), 6).as("punct_ratio"),
      round(qualityScore(col(textCol)), 6).as("quality"),
      langId(col(textCol)).as("lang_pred"),
      fingerprint64(col(textCol)).as("fingerprint"))
}
