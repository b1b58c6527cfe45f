package graft

import graft.operators.{Sessionize, TextAnalysis}
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token and subword counts") {
    val df = Seq("the quick  brown fox", "", "a,b.c").toDF("text")
    val toks = df.select(TextAnalysis.tokenCount(col("text"))).as[Int].collect()
    assert(toks.toSeq === Seq(4, 0, 1))
    val sub = Seq("hello, world!").toDF("text")
      .select(TextAnalysis.subwordCount(col("text"))).as[Int].head()
    assert(sub === 4) // hello , world !
  }

  test("quality score bounded in [0,1] and ranks clean text above noise") {
    val df = Seq(
      "the quick brown fox jumps over a lazy dog and runs far away from here today quietly then sleeps well tonight",
      "!!! ??? ... !!! ??? ###",
      "spam spam spam spam spam spam")
      .toDF("text")
    val scores = df.select(
      TextAnalysis.qualityScore(col("text"))).as[Double].collect()
    scores.foreach(s => assert(s >= 0.0 && s <= 1.0 + 1e-9))
    assert(scores(0) > scores(1))
    assert(scores(0) > scores(2)) // repetition penalized via type-token
  }

  test("langId picks the best profile or und") {
    val df = Seq(
      "the cat is on the mat and it is happy",
      "el gato y la casa de que en un",
      "zzz qqq xxx www").toDF("text")
    val out = df.select(TextAnalysis.langId(col("text"))).as[String].collect()
    assert(out.toSeq === Seq("en", "es", "und"))
  }

  test("fingerprint is order-sensitive and deterministic") {
    val df = Seq("alpha beta gamma", "gamma beta alpha", "alpha beta gamma")
      .toDF("text")
    val fps = df.select(TextAnalysis.fingerprint64(col("text"))).as[Long].collect()
    assert(fps(0) === fps(2))
    assert(fps(0) !== fps(1))
  }

  test("analyze emits full metric frame") {
    val out = TextAnalysis.analyze(
      Seq((1L, "the quick brown fox")).toDF("doc_id", "text"), "doc_id", "text")
    assert(out.columns.toSeq === Seq(
      "doc_id", "n_tokens", "n_subwords", "n_chars", "stopword_ratio",
      "type_token_ratio", "punct_ratio", "quality", "lang_pred", "fingerprint"))
    assert(out.count() === 1)
  }
  test("winnowed fingerprints: known value, edge cases, SQL parity") {
    // 7 tokens -> 5 word-3-grams -> 2 windows of 4 -> 1 distinct min;
    // the expected value is computed independently by the DuckDB
    // formulation (the q56 oracle SQL) on the same string
    val df = Seq(
      (1L, "aa bb cc dd ee ff gg"),
      (2L, "aa bb"), // fewer than k tokens -> no grams -> empty
      (3L, "xx yy zz")) // exactly k -> 1 gram -> single global min
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextAnalysis.winnowedFingerprints(col("text"), 3, 4).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) === Seq(375103723L))
    assert(out(2L) === Seq.empty)
    assert(out(3L).length === 1)
    // SQL registration parity
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("wf_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, winnow_fingerprints(
           filter(split(text, '\\s+'), t -> t != ''), 3, 4) AS fps
         FROM wf_docs""")
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaSql === out)
  }

  test("winnowing guarantee: a shared run of k+w-1 tokens shares a fingerprint") {
    // two documents sharing a 6-token passage (k=3, w=4 -> guarantee
    // threshold k+w-1 = 6) embedded in unrelated text must share at least
    // one fingerprint; two fully unrelated documents share none
    val shared = "p1 p2 p3 p4 p5 p6"
    val df = Seq(
      (1L, s"u1 u2 u3 $shared u4 u5"),
      (2L, s"v1 v2 $shared v3 v4 v5"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"))
      .toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
        TextAnalysis.winnowedFingerprints(col("text"), 3, 4).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
      .view.mapValues(_.toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      "documents sharing a >= k+w-1 token run must share a fingerprint")
    assert(fps(1L).intersect(fps(3L)).isEmpty)
    assert(fps(2L).intersect(fps(3L)).isEmpty)
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("gap splits sessions per key") {
    val events = Seq(
      (1L, 0L), (1L, 50L), (1L, 1000L), (1L, 1040L), // user 1: 2 sessions
      (2L, 0L)) // user 2: 1 session
      .toDF("user_id", "ts")
    val out = Sessionize.stats(events, "user_id", "ts", Seq("ts"), gap = 100L)
      .as[(Long, Long, Long)].collect().toMap2
    assert(out(1L) === ((2L, 4L)))
    assert(out(2L) === ((1L, 1L)))
  }

  test("tfidf top terms: worked example") {
    // 4 docs; "rare" only in doc 1, "the" in all 4
    val docs = Seq(
      (1L, "the rare term the"),
      (2L, "the common words"),
      (3L, "the common stuff"),
      (4L, "the words stuff")).toDF("id", "text")
    val out = graft.operators.TextAnalysis.tfidfTopTerms(docs, "id", "text", 2)
      .orderBy("id", "rnk")
      .as[(Long, Int, String, Double)].collect()
    // doc 1: "rare" and "term" both score 1*ln(4/1); tie -> alphabetical
    assert(out.filter(_._1 == 1L).map(_._3).toSeq === Seq("rare", "term"))
    val lnQuarter = math.rint(math.log(4.0) * 10000) / 10000
    assert(out.find(r => r._1 == 1L && r._3 == "rare").get._4 === lnQuarter)
    // "the" has df = 4 -> idf ln(1) = 0: never a top term despite tf 2
    assert(!out.exists(_._3 == "the"))
    // every doc gets exactly k rows when it has >= k distinct terms
    assert(out.groupBy(_._1).forall(_._2.length == 2))
  }

  test("tokenHistogram: boundary values land in the upper bucket, labels sort in range order") {
    val docs = Seq(
      (1L, "en", (1 to 4).map(_ => "w").mkString(" ")),   // 4 -> [0,5)
      (2L, "en", (1 to 5).map(_ => "w").mkString(" ")),   // 5 -> [5,10) boundary
      (3L, "en", (1 to 9).map(_ => "w").mkString(" ")),   // 9 -> [5,10)
      (4L, "en", (1 to 10).map(_ => "w").mkString(" ")),  // 10 -> [10,inf)
      (5L, "de", ""),                                     // 0 tokens -> [0,5)
      (6L, "de", (1 to 25).map(_ => "w").mkString(" "))   // 25 -> [10,inf)
    ).toDF("doc_id", "lang", "text")
    val out = graft.operators.TextAnalysis
      .tokenHistogram(docs, "lang", "text", Seq(5, 10))
      .orderBy("lang", "bucket")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("de", "000000_000005", 1L, 0L),
      ("de", "000010_inf", 1L, 25L),
      ("en", "000000_000005", 1L, 4L),
      ("en", "000005_000010", 2L, 14L),
      ("en", "000010_inf", 1L, 10L)), out.toString)
    // lexicographic label order == numeric range order
    val labels = out.map(_._2).distinct.sorted
    assert(labels == Seq("000000_000005", "000005_000010", "000010_inf"),
      labels.toString)
  }

  test("sanitizeText strips Cc/Cf; whitespace controls become spaces, not glue") {
    val out = Seq(
      (1L, "plain text stays"),
      (2L, "bell\u0007 esc\u001B null\u0000"),
      (3L, "zw\u200B soft\u00AD rtl\u200F"),
      (4L, "tab\tand\nnewline\rend")  // line structure -> spaces, no gluing
    ).toDF("id", "text")
      .select($"id", graft.operators.TextAnalysis.sanitizeText($"text").as("t"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "plain text stays")
    assert(out(2L) == "bell esc null")
    assert(out(3L) == "zw soft rtl")
    assert(out(4L) == "tab and newline end",
      s"line-break controls must not glue tokens: '${out(4L)}'")
  }

  test("blockwordCount is exact token membership, not substring") {
    val out = Seq(
      (1L, "the Spark merge path"),       // spark (cased), merge -> 2
      (2L, "sparkle merges remerge"),     // substrings only -> 0
      (3L, "batch batch BATCH"),          // 3
      (4L, "")
    ).toDF("id", "text")
      .select($"id", graft.operators.TextAnalysis.blockwordCount(
        $"text", Seq("merge", "batch", "spark")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 0L, 3L -> 3L, 4L -> 0L), out.toString)
  }

  test("charEntropyStats matches hand-computed entropies") {
    val out = graft.operators.TextAnalysis.charEntropyStats(
      Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd"), (4L, "")).toDF("id", "text"),
      "id", "text")
      .select($"id", $"n_chars", $"n_distinct_chars", $"entropy_bits")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4L, 1L, 0.0)))     // single symbol: 0 bits
    assert(out(2L) == ((2L, 4L, 2L, 1.0)))     // two equiprobable: 1 bit
    assert(out(3L) == ((3L, 4L, 4L, 2.0)))     // four equiprobable: 2 bits
    assert(!out.contains(4L), "empty doc must be absent")
  }

  test("unigramLogProb: hand-computed scores against the corpus model") {
    // corpus tokens: a a a b  => N=4, tf(a)=3, tf(b)=1
    val docs = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val log2_3q = math.rint(math.log(3.0 / 4) / math.log(2) * 10000) / 10000
    val log2_1q = math.rint(math.log(1.0 / 4) / math.log(2) * 10000) / 10000
    assert(out(1L) == ((3L, log2_3q)), out.toString)  // avg of log2(3/4)
    assert(out(2L) == ((1L, log2_1q)), out.toString)  // log2(1/4) = -2
    assert(out(2L)._2 == -2.0)
  }

  test("stripMarkup: tags/script/comments out, entities unescaped once") {
    def strip(s: String): String =
      Seq(Tuple1(s)).toDF("t")
        .select(graft.operators.TextAnalysis.stripMarkup($"t"))
        .as[String].head()
    // script and style drop WITH contents; tags become separators
    assert(strip("<p>a</p><script>var x=1;</script><b>b</b>") == "a b")
    assert(strip("x<style type=\"a\">p{color:red}</style>y") == "x y")
    // comments drop; tag-as-separator prevents word gluing
    assert(strip("one<!-- hidden -->two</p><p>three") == "one two three")
    // the five entities, ampersand unescaped LAST (no double-unescape)
    assert(strip("Tom &amp; Jerry &lt;3 &quot;hi&quot; &#39;q&#39;") ==
      "Tom & Jerry <3 \"hi\" 'q'")
    assert(strip("literal &amp;lt; stays") == "literal &lt; stays")
    // whitespace collapses and trims
    assert(strip("  a \n\n b  ") == "a b")
    // markup-free text is the identity (modulo whitespace)
    assert(strip("plain text") == "plain text")
  }

  test("bigramLogProb: hand-computed add-one scores; short docs drop out") {
    // corpus bigrams: "a b"x3 (doc1 twice, doc2 once), "b a"x1
    // left counts: a->3, b->1; vocab V = {a,b,c} = 3
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .bigramLogProb(docs, "doc_id", "text", k = 1)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def r4(x: Double) = math.rint(x * 10000) / 10000
    val ab = math.log((3.0 + 1) / (3 + 3)) / math.log(2) // log2(4/6)
    val ba = math.log((1.0 + 1) / (1 + 3)) / math.log(2) // -1
    assert(out(1L) == ((3L, r4((2 * ab + ba) / 3))), out.toString)
    assert(out(2L) == ((1L, r4(ab))), out.toString)
    assert(!out.contains(3L), "single-token doc has no bigrams")
  }

  test("bigramLogProb: word salad scores below natural order") {
    // "x y" repeated is high-probability under the corpus's own model;
    // the same tokens in scrambled unseen orders score strictly lower
    val docs = Seq(
      (1L, "x y x y x y x y"), (2L, "x y x y x y x y"),
      (3L, "y y x x y x x y")).toDF("doc_id", "text")
    val scores = graft.operators.TextAnalysis
      .bigramLogProb(docs, "doc_id", "text", k = 1)
      .select("id", "avg_log2_prob").as[(Long, Double)].collect().toMap
    assert(scores(3L) < scores(1L), scores.toString)
  }

  test("urlRefs extracts full urls and domains; url-free docs drop out") {
    // note doc 1's sentence-final period after b.net: the domain class
    // must not absorb it (a greedy [A-Za-z0-9.-]+ counts "b.net." and
    // "b.net" as different domains and fragments provenance stats)
    val docs = Seq(
      (1L, "see https://a.example.org/x/y and http://b.net. trailing"),
      (2L, "no links here"),
      (3L, "dup https://a.example.org/z")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.urlRefs(docs, "doc_id", "text")
      .select("id", "url", "domain")
      .as[(Long, String, String)].collect().toSet
    assert(out == Set(
      (1L, "https://a.example.org/x/y", "a.example.org"),
      (1L, "http://b.net", "b.net"),
      (3L, "https://a.example.org/z", "a.example.org")), out.toString)
  }

  test("charClasses: hand-computed counts incl. non-ASCII and VT") {
    // "Ab 1.x<e-acute><VT>" -> chars 8, letters 3 (A,b,x), digits 1,
    // punct 1 (.), ws 2 (space + VT), non-ascii 1 (é)
    val df = Seq((1L, "Ab 1.x\u00E9\u000B"), (2L, ""))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.charClasses(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 8L, 3L, 1L, 1L, 2L, 1L),
      (2L, 0L, 0L, 0L, 0L, 0L, 0L)), got.toString)
  }

  test("gapStats: exact consecutive gaps, keys with one event drop out") {
    val events = Seq(
      ("A", 100L, 1L), ("A", 130L, 2L), ("A", 190L, 3L), // gaps 30, 60
      ("B", 500L, 4L) // single event -> no gaps -> absent
    ).toDF("event_type", "ts", "event_id")
    val got = Sessionize.gapStats(events, "event_type", "ts",
        Seq("ts", "event_id"))
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("A", 2L, 30L, 60L, 90L, 45.0)))
  }

  test("gapStats: equal-ts events tie-break on the second order column") {
    val events = Seq(
      ("A", 100L, 2L), ("A", 100L, 1L), ("A", 101L, 3L)
    ).toDF("event_type", "ts", "event_id")
    // order: (100,1), (100,2), (101,3) -> gaps 0, 1
    val got = Sessionize.gapStats(events, "event_type", "ts",
        Seq("ts", "event_id"))
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("A", 2L, 0L, 1L, 1L, 0.5)))
  }

  test("session ids are 1-based and monotone in time") {
    val events = Seq((1L, 0L), (1L, 500L), (1L, 510L), (1L, 2000L))
      .toDF("user_id", "ts")
    val ids = Sessionize.withSessionId(events, "user_id", "ts", Seq("ts"), 100L)
      .orderBy("ts").select("session_id").as[Long].collect()
    assert(ids.toSeq === Seq(1L, 2L, 2L, 3L))
  }

  implicit private class Tup3Ops(val s: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] =
      s.map { case (k, a, b) => k -> ((a, b)) }.toMap
  }

  test("canonicalizeUrl normalizes scheme/host/port/path/query/fragment") {
    val cases = Seq(
      // default port + trailing slash + utm + fragment + case all collapse
      "https://WWW.Example.COM:443/Products/3/?utm_source=m&b=2&a=1#frag" ->
        "https://www.example.com/Products/3?a=1&b=2",
      // the clean spelling is its own fixed point
      "https://www.example.com/Products/3?a=1&b=2" ->
        "https://www.example.com/Products/3?a=1&b=2",
      // non-default port survives; utm_ param drops; scheme/host lowercase
      "HTTP://Site.ORG:8080/a/b?z=1&utm_campaign=x" ->
        "http://site.org:8080/a/b?z=1",
      // http default port + trailing slash
      "http://site.org:80/plain/" -> "http://site.org/plain",
      // bare root slash trims away entirely
      "http://site.org/" -> "http://site.org",
      // params sort; trailing '&' yields an empty segment that drops;
      // path CASE is preserved (RFC 3986: only scheme+host case-fold)
      "https://h.io:8443/P?b=1&a=2&utm_x=9&" -> "https://h.io:8443/P?a=2&b=1",
      // no query, no port — identity
      "http://a.b/path" -> "http://a.b/path")
    val out = cases.map(_._1).toDF("url")
      .select(TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq
    assert(out === cases.map(_._2))
  }

  test("canonicalizeUrl is idempotent on the test spellings") {
    val raw = Seq(
      "https://WWW.Example.COM:443/Products/3/?utm_source=m&b=2&a=1#frag",
      "HTTP://Site.ORG:8080/a/b?z=1&utm_campaign=x",
      "http://site.org:80/plain/").toDF("url")
    val once = raw.select(TextAnalysis.canonicalizeUrl(col("url")).as("c"))
    val twice = once.select(TextAnalysis.canonicalizeUrl(col("c")).as("c"))
    assert(once.as[String].collect().toSeq === twice.as[String].collect().toSeq)
  }

  test("charPairCounts: hand-computed adjacency table with tie-break") {
    val d = Seq((1L, "abab"), (2L, "ab"), (3L, "x")).toDF("doc_id", "text")
    // pairs: "abab" -> ab, ba, ab; "ab" -> ab; "x" -> none
    val out = TextAnalysis.charPairCounts(d, "text", topK = 5)
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("ab", 3L), ("ba", 1L)))
  }

  test("readabilityCounts: hand-computed sentences, words, vowel groups") {
    val d = Seq(
      // "One fish." | " Two red fish!" | " Wow?" -> 3 sentences, 6 words
      // vowel runs: O-e | i | T-o | e | i | o  ... counted by hand below
      (1L, "One fish. Two red fish! Wow?"),
      (2L, "no terminators here"),  // 1 sentence
      (3L, "!!!"),                  // only terminators: 0 sentences
      (4L, "xyz")                   // y counts as a vowel group
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readabilityCounts(d, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      // doc 1 vowel runs: One(O,e) fish(i) Two(o) red(e) fish(i) Wow(o)
      (1L, 3L, 6L, 7L),
      // doc 2: no(o) terminators(e,i,a,o) here(e,e) = 7 runs
      (2L, 1L, 3L, 7L),
      (3L, 0L, 1L, 0L),   // "!!!" is one \s+-token, no sentences, no vowels
      (4L, 1L, 1L, 1L)))  // y counts as a vowel group
  }

  test("trigram stupid backoff: every tier fires and matches hand arithmetic") {
    // train "a b c a b c": N=6 tokens, V=3; c1(a,b,c)=2 each;
    // c2("a b")=2, ("b c")=2, ("c a")=1; c3("a b c")=2, ("b c a")=1, ("c a b")=1
    val train = Seq((100L, "a b c a b c")).toDF("doc_id", "text")
    val held = Seq(
      (1L, "a b c d"), // "a b c": tri log2(2/2)=0; "b c d": uni tier
      (2L, "x a b"),   // "x a b": tail "a b" seen -> bi log2(0.4*(2/2))
      (3L, "a b")      // <3 tokens: no trigram row at all
    ).toDF("doc_id", "text")
    val out = TextAnalysis.trigramBackoffLogProb(train, held, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val uniLp = math.log(0.4 * 0.4 * ((0.0 + 1) / (6.0 + 3.0))) / math.log(2.0)
    val biLp = math.log(0.4 * (2.0 / 2.0)) / math.log(2.0)
    assert(out.map(t => (t._1, t._2, t._3, t._4, t._5)) ===
      Seq((1L, 2L, 1L, 0L, 1L), (2L, 1L, 0L, 1L, 0L)))
    assert(math.abs(out(0)._6 - r4((0.0 + uniLp) / 2)) < 1e-9)
    assert(math.abs(out(1)._6 - r4(biLp)) < 1e-9)
  }

  test("bpe merges: hand-walked rounds, overlap collapse, lexicographic ties") {
    // round 1 pairs: (a,a)=3 [two overlapping in doc 1], (a,b)=2 ->
    //   merge (a,a): [a a a]->[a_a a], [a a b]->[a_a b], [a b] unchanged
    //   tokens_after = 2+2+2 = 6 (pair_count 3 but only 2 applications)
    // round 2 pairs all count 1: (a,b) < (a_a,a) < (a_a,b) -> (a,b) wins
    //   merge: [a b]->[a_b]; tokens_after = 5
    val docs = Seq("a a a", "a a b", "a b").toDF("text")
    val out = TextAnalysis.bpeMerges(docs, "text", rounds = 2)
      .as[(Int, String, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1, "a", "a", 3L, 6L), (2, "a", "b", 1L, 5L)))
    intercept[IllegalArgumentException](
      TextAnalysis.bpeMerges(docs, "text", rounds = 0))
    intercept[IllegalArgumentException](
      TextAnalysis.bpeMerges(docs, "text", rounds = 17))
  }

  test("trigram backoff rejects a degenerate alpha") {
    val d = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      TextAnalysis.trigramBackoffLogProb(d, d, "doc_id", "text", alpha = 1.0))
  }

  test("bpeEncode applies trained merges in order with non-overlap semantics") {
    val docs = Seq(
      (1L, "a a b"),     // merge1 (a,a): [a_a, b]; merge2 (a,b): no site left
      (2L, "a b a a"),   // [a, b, a_a] -> [a_b, a_a]
      (3L, "x"),         // untouched singleton
      (4L, "")           // empty stays empty
    ).toDF("id", "text")
    val out = TextAnalysis.bpeEncode(docs, "id", "text",
        Seq(("a", "a"), ("a", "b")))
      .orderBy("id").select("tokens").as[Seq[String]].collect().toSeq
    assert(out === Seq(
      Seq("a_a", "b"), Seq("a_b", "a_a"), Seq("x"), Seq.empty))
    // training order matters: reversing the merges flips which rule
    // claims doc 1's "a a b" (greedy non-overlap is order-dependent)
    val rev = TextAnalysis.bpeEncode(docs, "id", "text",
        Seq(("a", "b"), ("a", "a")))
      .orderBy("id").select("tokens").as[Seq[String]].collect().toSeq
    assert(rev.head === Seq("a", "a_b"))
    intercept[IllegalArgumentException](
      TextAnalysis.bpeEncode(docs, "id", "text", Seq.empty))
    // round trip with training: encoding with bpeMerges' elected table
    // reproduces the training chain's final token total
    val trained = TextAnalysis.bpeMerges(docs, "text", rounds = 2)
      .orderBy("round")
      .select("pair_a", "pair_b", "tokens_after")
      .as[(String, String, Long)].collect().toSeq
    val enc = TextAnalysis.bpeEncode(docs, "id", "text",
        trained.map(t => (t._1, t._2)))
      .select(sum(size(col("tokens")))).as[Long].head()
    assert(enc === trained.last._3)
  }

  test("persisted language-ID model scores bit-identically to in-session training") {
    val docs = Seq(
      (0L, "aaa aaa aaa", "a"), (1L, "aaa aab", "a"),
      (2L, "bbb bbb bbb", "b"), (3L, "bba bbb", "b"),
      (10L, "aaa aab aaa", "?"), (11L, "bbb bba", "?"),
      (12L, "aaa bbb", "?")
    ).toDF("id", "text", "lang")
    val inSession = TextAnalysis.langIdScores(
        docs, "id", "text", "lang", seedMax = 10L)
      .collect().map(_.toString).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("langid-spec").toString
    TextAnalysis.saveLangIdModel(
      docs, "id", "text", "lang", seedMax = 10L, dir)
    val indexed = TextAnalysis.langIdScoresIndexed(
        dir, docs.filter($"id" >= 10L), "id", "text")
      .collect().map(_.toString).sorted.toSeq
    // bit-identical, scores included: doubles round-trip parquet exactly
    assert(indexed.nonEmpty && indexed === inSession)
    // a missing model fails loudly at the meta read, not with silent
    // all-unscored output
    intercept[Exception](
      TextAnalysis.langIdScoresIndexed(s"$dir/nope", docs, "id", "text")
        .collect())
  }

  test("langIdScores: argmax + margin on a separable corpus; unseen docs drop") {
    val docs = Seq(
      (0L, "aaa aaa aaa", "a"), (1L, "aaa aaa", "a"),
      (2L, "bbb bbb bbb", "b"), (3L, "bbb bbb", "b"),
      (10L, "aaa aaa aaa aaa", "?"), (11L, "bbb bbb", "?"),
      (12L, "zzz zzz", "?"), // every gram unseen -> carries no evidence
      (13L, "ab", "?")       // shorter than n=3 -> no grams at all
    ).toDF("id", "text", "lang")
    val out = TextAnalysis.langIdScores(docs, "id", "text", "lang", seedMax = 10L)
      .orderBy("id")
      .select("id", "pred", "n_grams", "score", "margin")
      .as[(Long, String, Long, Double, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) === Seq((10L, "a"), (11L, "b")),
      s"wrong predictions: $out")
    assert(out.forall(_._5 > 0.0), s"non-positive margin: $out")
    // n_grams counts matched OCCURRENCES once per doc (not once per class):
    // "aaa aaa aaa aaa" has 13 trigrams, all seen in the seed
    assert(out.head._3 === 13L)
    // a single-class seed must fail loudly, not train a degenerate model
    intercept[IllegalArgumentException](
      TextAnalysis.langIdScores(
        docs.filter($"lang" =!= "b"), "id", "text", "lang", seedMax = 10L))
    intercept[IllegalArgumentException](
      TextAnalysis.langIdScores(docs, "id", "text", "lang", seedMax = 0L))
  }
}
