package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog near the river bank today"
  private val docB = "the quick brown fox jumps over the lazy cat near the river bank today"
  private val docC = "completely unrelated text about database engines and query optimizers"

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exact duplicates grouped by digest") {
    val out = Dedup.exactDuplicates(
      docs(1L -> docA, 2L -> docA, 3L -> docC), "doc_id", "text")
      .select("n_copies", "ids").as[(Long, Seq[Long])].collect()
    assert(out.toSeq === Seq((2L, Seq(1L, 2L))))
  }

  test("exactDuplicates bounds a viral duplicate group to maxIds") {
    // 100k copies of one boilerplate page: the group row must carry the
    // full count but only the maxIds smallest ids — never the full roster
    val viral = spark.range(100000)
      .select(col("id").as("doc_id"), lit(docA).as("text"))
      .union(docs(200000L -> docC))
    val out = Dedup.exactDuplicates(viral, "doc_id", "text", maxIds = 16)
      .select("n_copies", "ids").as[(Long, Seq[Long])].collect()
    assert(out.length === 1)
    assert(out(0)._1 === 100000L)
    assert(out(0)._2 === (0L until 16L))
  }

  test("winnowedPassageMatches finds the planted copied passage only") {
    // docs 1 and 2 share a 7-token contiguous passage (>= k+window-1 = 6
    // guarantees a shared fingerprint) inside otherwise-unrelated text;
    // doc 3 is fully unrelated. Only the (1,2) pair may match.
    val passage = "copied run one two three four five"
    val out = Dedup.winnowedPassageMatches(
      docs(
        1L -> s"intro words here $passage closing remark",
        2L -> s"different opening $passage other tail text",
        3L -> docC),
      "doc_id", "text", minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
  }

  test("connectedComponents releases only its own caches, never a caller's") {
    // regression: the old cleanup diffed GLOBAL persistent-RDD state, so a
    // caller's persist whose RDD first materialized during the call (cache
    // registration is lazy) was swept — every later action silently
    // recomputed the caller's subplan. The accumulator counts real
    // executions of the caller's map: it must not grow after the call.
    spark.sharedState.cacheManager.clearCache()
    val acc = spark.sparkContext.longAccumulator("cc_caller_recompute")
    val base = (1L to 12L).toDF("id").as[Long]
      .map { i => acc.add(1); i }.toDF("id").persist()
    // a 12-node chain derived from the caller's frame; driverCutoff=0
    // forces the distributed path (the one that runs the cache sweep)
    val pairs = base.filter(col("id") < 12)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val nComponents = Dedup.connectedComponents(
      pairs, "id_a", "id_b", maxIter = 20, driverCutoff = 0L)
      .select("component").distinct().count()
    assert(nComponents === 1)
    val afterCall = acc.value
    base.count() // must be served from the caller's still-live cache
    assert(acc.value === afterCall,
      "caller's persisted frame was recomputed: its cache was swept")
    base.unpersist()
  }

  test("dedupExact keeps deterministic survivor") {
    val out = Dedup.dedupExact(
      docs(2L -> docA, 1L -> docA, 3L -> docC), "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 3L))
  }

  test("dedupExactNormalized collapses case/punct/space variants only") {
    val out = Dedup.dedupExactNormalized(
      docs(
        1L -> "Hello, world! Foo",
        2L -> "hello   world foo",   // same after normalization
        3L -> "HELLO WORLD... foo",  // same after normalization
        4L -> "hello world bar"),    // genuinely different
      "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 4L))
  }

  test("shingles: word n-grams, distinct") {
    val sh = docs(1L -> "a b a b c").select(
      Dedup.shingles(col("text"), 2).as("sh")).as[Seq[String]].head()
    assert(sh.toSet === Set("a b", "b a", "b c"))
  }

  test("minhash signature is deterministic and length numHashes") {
    val d = docs(1L -> docA, 2L -> docA)
      .select(Dedup.minhashSignature(
        Dedup.shingles(col("text"), 2), 32).as("sig"))
      .as[Seq[Long]].collect()
    assert(d(0).length === 32)
    assert(d(0) === d(1)) // same text -> same signature
    assert(d(0).forall(v => v >= 0 && v < 2147483647L))
  }

  test("minhash LSH finds near-duplicate pair, not unrelated pair") {
    val out = Dedup.minhashNearDuplicates(
      docs(1L -> docA, 2L -> docB, 3L -> docC), "doc_id", "text",
      shingleSize = 2, numHashes = 64, bands = 16, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
  }

  test("incremental minhash dedup: batch-vs-corpus equals the cross slice of the self-join") {
    // corpus = A, C; new batch = B (near-dup of A), D (unrelated)
    val docD = "completely different content about astronomy and telescopes orbiting mars"
    val corpus = docs(1L -> docA, 3L -> docC)
    val batch = docs(2L -> docB, 4L -> docD)
    val inc = Dedup.minhashNearDuplicatesAgainst(
      batch, corpus, "doc_id", "text",
      shingleSize = 2, numHashes = 64, bands = 16, threshold = 0.3)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(inc === Set((2L, 1L)))
    // identical parameters, full self-join: restricted to (batch x corpus)
    // pairs it must agree with the incremental form
    val full = Dedup.minhashNearDuplicates(
      docs(1L -> docA, 2L -> docB, 3L -> docC, 4L -> docD), "doc_id", "text",
      shingleSize = 2, numHashes = 64, bands = 16, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val crossSlice = full.collect {
      case (a, b) if Set(2L, 4L)(a) && Set(1L, 3L)(b) => (a, b)
      case (a, b) if Set(2L, 4L)(b) && Set(1L, 3L)(a) => (b, a)
    }
    assert(inc === crossSlice)
  }

  test("minhash similarity approximates true jaccard") {
    // A vs B share most 2-shingles; signature agreement rate ~ jaccard.
    val sigs = docs(1L -> docA, 2L -> docB)
      .select(Dedup.minhashSignature(
        Dedup.shingles(col("text"), 2), 128).as("sig"))
      .as[Seq[Long]].collect()
    val est = sigs(0).zip(sigs(1)).count { case (a, b) => a == b } / 128.0
    val shA = docA.split(" ").sliding(2).map(_.mkString(" ")).toSet
    val shB = docB.split(" ").sliding(2).map(_.mkString(" ")).toSet
    val truth = shA.intersect(shB).size.toDouble / shA.union(shB).size
    assert(math.abs(est - truth) < 0.2) // 128 hashes -> ~±0.09 stderr
  }

  test("simhash: identical docs -> distance 0; near docs close; far docs far") {
    val fps = docs(1L -> docA, 2L -> docA, 3L -> docB, 4L -> docC)
      .select(Dedup.simhash64(col("text")).as("fp")).as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(0), fps(1)) === 0)
    assert(ham(fps(0), fps(2)) < ham(fps(0), fps(3)))
  }

  test("simhash near-duplicates via chunk blocking") {
    val out = Dedup.simhashNearDuplicates(
      docs(1L -> docA, 2L -> docA, 3L -> docC), "doc_id", "text",
      maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(out.toSeq === Seq((1L, 2L, 0)))
  }

  test("simhash chunk blocking has exact recall at radius > 3") {
    // maxHamming+1 chunks guarantee every pair within the radius shares a
    // chunk (pigeonhole) — under the old fixed 4x16 layout, pairs at
    // distance 4..8 whose differing bits touch all four chunks were
    // silently dropped. Compare against brute-force Hamming on small N.
    val vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split(" ")
    val rng = new scala.util.Random(11)
    val corpus = (0 until 60).map { i =>
      val toks = Seq.fill(12)(vocab(rng.nextInt(vocab.length)))
      (i.toLong, toks.mkString(" "))
    }
    val df = corpus.toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), Dedup.simhash64(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    val radius = 8
    val expected = (for {
      a <- fps.keys; b <- fps.keys if a < b
      if java.lang.Long.bitCount(fps(a) ^ fps(b)) <= radius
    } yield (a, b)).toSet
    val found = Dedup.simhashNearDuplicates(df, "doc_id", "text", maxHamming = radius)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture must contain pairs within the radius")
    assert(found === expected)
  }

  test("hash sketches skip null array elements instead of throwing") {
    GraftExtensions.register(spark)
    val withNull = spark.sql(
      """SELECT minhash_sig(array('a', NULL, 'b'), 8) AS sig,
        |       simhash64(array('a', NULL, 'b')) AS fp,
        |       hashed_sorted_set(array('a', NULL, 'b')) AS hs""".stripMargin)
      .collect().head
    val noNull = spark.sql(
      """SELECT minhash_sig(array('a', 'b'), 8) AS sig,
        |       simhash64(array('a', 'b')) AS fp,
        |       hashed_sorted_set(array('a', 'b')) AS hs""".stripMargin)
      .collect().head
    assert(withNull.getSeq[Long](0) === noNull.getSeq[Long](0))
    assert(withNull.getLong(1) === noNull.getLong(1))
    assert(withNull.getSeq[Long](2) === noNull.getSeq[Long](2))
  }

  test("jaccardPairs computes exact token-set jaccard within block") {
    val a = "x y z"
    val b = "x y w" // jaccard = 2/4 = 0.5
    val out = Dedup.jaccardPairs(
      Seq((1L, a, "en"), (2L, b, "en"), (3L, "q r s", "de"))
        .toDF("doc_id", "text", "lang"),
      "doc_id", "text", Seq("lang"), shingleSize = 1, threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq((1L, 2L, 0.5)))
  }

  test("jaccardJoin equals the brute-force R-S relation exactly") {
    val rng = new scala.util.Random(23)
    val vocab = (0 until 30).map(i => s"w$i")
    // random corpora with heavy vocab overlap -> rich similarity spectrum
    def mkDocs(n: Int, base: Long) = (0 until n).map { i =>
      val k = 4 + rng.nextInt(8)
      (base + i, Seq.fill(k)(vocab(rng.nextInt(vocab.size))).mkString(" "),
        if (i % 2 == 0) "en" else "de")
    }
    val leftRows = mkDocs(40, 1000L)
    // right side: perturbed copies of some left docs (one token appended /
    // first token dropped — guaranteed high-Jaccard pairs) plus randoms
    val rightRows = leftRows.take(8).zipWithIndex.map { case ((_, s, lang), i) =>
      val s2 = if (i % 2 == 0) s + " extra"
               else s.split(" ").drop(1).mkString(" ")
      (3000L + i, s2, lang)
    } ++ mkDocs(7, 2000L)
    val left = leftRows.toDF("doc_id", "text", "lang")
    val right = rightRows.toDF("doc_id", "text", "lang")
    val t = 0.5
    val got = Dedup.jaccardJoin(left, right, "doc_id", "text",
        Seq("lang"), 1, t)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    // brute force over the token sets
    def sets(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, String, String)].collect()
      .map { case (id, s, lang) =>
        (id, lang, s.split("\\s+").filter(_.nonEmpty).toSet) }
    val brute = (for {
      (ia, la, sa) <- sets(left)
      (ib, lb, sb) <- sets(right)
      if la == lb && sa.nonEmpty && sb.nonEmpty
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= t
    } yield (ia, ib, math.rint(j * 10000) / 10000)).toSet
    assert(got == brute,
      s"missing=${brute -- got}\nextra=${got -- brute}")
    assert(brute.nonEmpty, "fixture produced no qualifying pairs")
  }

  test("winnowedPassageMatchesAgainst finds the doc containing the passage") {
    // reference passage = 8 tokens lifted verbatim from doc 1; doc 2 is
    // unrelated. k=3, w=4: the shared run far exceeds k+w-1.
    val corpus = Seq(
      (1L, "intro words p1 p2 p3 p4 p5 p6 p7 p8 outro tail"),
      (2L, "completely different content with other tokens here")
    ).toDF("doc_id", "text")
    val ref = Seq((100L, "p1 p2 p3 p4 p5 p6 p7 p8")).toDF("doc_id", "text")
    val got = Dedup.winnowedPassageMatchesAgainst(
        corpus, ref, "doc_id", "text", Nil, k = 3, window = 4,
        minShared = 1, maxDf = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L)), got.toString)
  }

  test("jaccardJoin on disjoint vocabularies shuffles an empty prefix") {
    val left = Seq((1L, "a b c", "en")).toDF("doc_id", "text", "lang")
    val right = Seq((2L, "x y z", "en")).toDF("doc_id", "text", "lang")
    val out = Dedup.jaccardJoin(left, right, "doc_id", "text",
      Seq("lang"), 1, 0.1)
    assert(out.count() == 0)
    // the shared-df inner join leaves nothing: identical docs on ONE side
    // only are never candidates either
    val sameSide = Dedup.jaccardJoin(
      Seq((1L, "a b c", "en"), (3L, "a b c", "en"))
        .toDF("doc_id", "text", "lang"),
      right, "doc_id", "text", Seq("lang"), 1, 0.1)
    assert(sameSide.count() == 0)
  }

  test("connectedComponents: chains, cliques, and isolated pairs") {
    // components: {1,2,3,4} (a chain), {10,11,12} (a triangle), {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    // both execution paths must produce this exact labeling
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val gotDist = Dedup.connectedComponents(pairs, "id_a", "id_b",
        driverCutoff = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got == gotDist)
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents converges on a long path (worst diameter)") {
    // pointer-jumped contraction follows ~8 hops per round, so a 40-node
    // path needs ~5 rounds; driverCutoff = 0 forces the DISTRIBUTED path
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs, "a", "b", maxIter = 50,
        driverCutoff = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 40 && got.values.forall(_ == 1L))
  }

  test("driver union-find and distributed contraction agree exactly") {
    val rng = new scala.util.Random(17)
    // random graph: 300 nodes, 250 random edges -> many components of
    // varied shapes (isolated pairs, trees, cycles)
    val pairs = (1 to 250).map { _ =>
      (rng.nextInt(300).toLong, rng.nextInt(300).toLong)
    }.filter(p => p._1 != p._2).toDF("id_a", "id_b")
    val viaDriver = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val viaCluster = Dedup.connectedComponents(pairs, "id_a", "id_b",
        driverCutoff = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver == viaCluster)
    assert(viaDriver.nonEmpty)
  }

  test("dedupNear keeps min-id survivor per cluster plus unpaired docs") {
    val df = docs(1L -> docA, 2L -> docA, 3L -> docB, 9L -> docC)
    val pairs = Dedup.jaccardPairs(df, "doc_id", "text", Nil, 1, 0.5)
    val kept = Dedup.dedupNear(df, "doc_id", pairs, "id_a", "id_b")
      .select("doc_id").as[Long].collect().toSet
    // docs 1/2 identical, 3 near-dup of them (token Jaccard > 0.5) -> one
    // cluster keeps id 1; doc 9 unpaired survives
    assert(kept == Set(1L, 9L))
  }

  test("lineDedup removes corpus-frequent lines and reassembles in order") {
    val boiler = "subscribe to our newsletter"
    val d = docs(
      1L -> s"$boiler\nunique one\nmiddle line",
      2L -> s"$boiler\nunique two",
      3L -> s"unique three\n$boiler",
      4L -> boiler) // fully-boilerplate doc collapses to ""
    val out = Dedup.lineDedup(d, "doc_id", "text", maxOccurrences = 2)
      .select("doc_id", "clean_text", "n_lines", "n_lines_removed")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, "unique one\nmiddle line", 3L, 1L),
      (2L, "unique two", 2L, 1L),
      (3L, "unique three", 2L, 1L),
      (4L, "", 1L, 1L)))
  }

  test("lineDedup keeps lines at exactly maxOccurrences") {
    val d = docs(1L -> "twice\nalpha", 2L -> "twice\nbeta", 3L -> "gamma")
    val out = Dedup.lineDedup(d, "doc_id", "text", maxOccurrences = 2)
    assert(out.filter(col("n_lines_removed") > 0).count() === 0)
    assert(out.filter(col("clean_text") =!= col("text")).count() === 0)
  }

  test("spanDedup cuts corpus-repeated k-gram spans and merges overlaps") {
    // "a b" and "b c" repeat across docs 1/2 -> overlapping windows merge
    // into ONE span per doc; surrounding unique tokens survive in order
    val d = docs(1L -> "a b c d e", 2L -> "x a b c y")
    val out = Dedup.spanDedup(d, "doc_id", "text", k = 2, maxOccurrences = 1)
      .select("doc_id", "n_tokens", "n_dup_tokens", "n_spans", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, 5L, 3L, 1L, "d e"),
      (2L, 5L, 3L, 1L, "x y")))
  }

  test("spanDedup separated repeats count as distinct spans") {
    // "p q" repeats at positions 0 and 5 of doc 1 (gap > k) -> two spans
    val d = docs(1L -> "p q z1 z2 z3 p q", 2L -> "p q")
    val out = Dedup.spanDedup(d, "doc_id", "text", k = 2, maxOccurrences = 1)
      .filter(col("doc_id") === 1L)
      .select("n_dup_tokens", "n_spans", "clean_text")
      .as[(Long, Long, String)].head()
    assert(out === ((4L, 2L, "z1 z2 z3")))
  }

  test("spanDedup adjacent windows (gap == k) merge into one span") {
    // "a b"@0 and "c d"@2 are frequent, "b c"@1 is unique to doc 1:
    // coverage {0,1} ∪ {2,3} is contiguous -> one span, empty clean text
    val d = docs(1L -> "a b c d", 2L -> "a b", 3L -> "c d")
    val out = Dedup.spanDedup(d, "doc_id", "text", k = 2, maxOccurrences = 1)
      .filter(col("doc_id") === 1L)
      .select("n_dup_tokens", "n_spans", "clean_text")
      .as[(Long, Long, String)].head()
    assert(out === ((4L, 1L, "")))
  }

  test("spanDedup passes short docs and at-threshold grams through") {
    val d = docs(
      1L -> "tiny", // < k tokens: no windows at all
      2L -> "twice repeated gram", 3L -> "twice repeated gram")
    val out = Dedup.spanDedup(d, "doc_id", "text", k = 3, maxOccurrences = 2)
      .select("doc_id", "n_dup_tokens", "clean_text")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    // the duplicated gram occurs exactly maxOccurrences times -> kept
    assert(out === Seq(
      (1L, 0L, "tiny"),
      (2L, 0L, "twice repeated gram"),
      (3L, 0L, "twice repeated gram")))
  }

  test("positionalGramHashes: rolling hash equals per-gram recompute") {
    // the rolling multiply-subtract must reproduce the direct polynomial
    // fold at every position, including k=1 (grams are the tokens) and
    // short-array empties
    val toks = Seq("alpha", "beta", "gamma", "delta", "epsilon", "beta")
    for (k <- Seq(1, 2, 3, 6)) {
      val rolled = Seq(Tuple1(toks)).toDF("tk")
        .select(graft.functions.HashExprs.positionalGramHashes(col("tk"), k).as("h"))
        .as[Seq[Long]].head()
      assert(rolled.length === toks.length - k + 1)
      // direct recompute: fold token xxhash64 under B without rolling
      val th = Seq(Tuple1(toks)).toDF("tk")
        .select(transform(col("tk"), t => xxhash64(t)).as("h"))
        .as[Seq[Long]].head()
      val B = 1099511628211L
      val direct = (0 to toks.length - k).map { i =>
        (i until i + k).foldLeft(0L)((h, j) => h * B + th(j))
      }
      assert(rolled === direct, s"k=$k")
    }
    val short = Seq(Tuple1(Seq("one"))).toDF("tk")
      .select(graft.functions.HashExprs.positionalGramHashes(col("tk"), 2).as("h"))
      .as[Seq[Long]].head()
    assert(short.isEmpty)
  }

  test("spanDedupFast equals spanDedup on a planted corpus") {
    val boiler = "all rights reserved by the site owner today"
    val d = (0L until 60L).map { i =>
      val body = s"unique body $i with enough distinct tokens to matter ${i * 7}"
      val text =
        if (i % 5 == 0) s"$boiler $body"
        else if (i % 7 == 0) s"$body $boiler"
        else body
      (i, text)
    }.toDF("doc_id", "text")
    val cols = Seq("doc_id", "n_tokens", "n_dup_tokens", "n_spans", "clean_text")
    val slow = Dedup.spanDedup(d, "doc_id", "text", 3, 2)
      .select(cols.head, cols.tail: _*)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val fast = Dedup.spanDedupFast(d, "doc_id", "text", 3, 2)
      .select(cols.head, cols.tail: _*)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(fast === slow)
    // and the cut actually fired: boilerplate-carrying docs lost tokens
    assert(slow.count(_._3 > 0) > 10)
  }

  test("dedupAgainstCorpus equals the exact text-join classification") {
    val corpus = (0L until 60L).map(i => (i, s"corpus doc $i body")).toDF("doc_id", "text")
    val batch = (100L until 140L).map { i =>
      // every third batch doc copies a corpus text verbatim
      (i, if (i % 3 == 0) s"corpus doc ${i % 60} body" else s"fresh doc $i")
    }.toDF("doc_id", "text")
    for (fpp <- Seq(0.5, 0.001)) { // correctness must not depend on fpp
      val got = Dedup.dedupAgainstCorpus(corpus, batch, "doc_id", "text", fpp)
        .select("doc_id", "is_new").as[(Long, Boolean)].collect().toMap
      val expected = (100L until 140L).map(i => i -> (i % 3 != 0)).toMap
      assert(got == expected, s"fpp=$fpp")
    }
  }

  test("dedupAgainstCorpus ships digests, never corpus text, through exchanges") {
    val corpus = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val batch = Seq((3L, "a")).toDF("doc_id", "text")
    val plan = Dedup.dedupAgainstCorpus(corpus, batch, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val exchanges = plan.split("Exchange").drop(1)
    assert(exchanges.nonEmpty, plan)
    assert(!exchanges.exists(_.takeWhile(_ != '\n').contains("text#")),
      "an exchange carries raw text:\n" + plan)
  }

  test("dedupNearBy keeps the highest-preference member per cluster") {
    val d = Seq(
      (1L, 5L), (2L, 9L), (3L, 9L),  // cluster {1,2,3}: 2 wins (pref 9, min id)
      (4L, 1L), (5L, 1L),            // cluster {4,5}: tie -> 4 (min id)
      (6L, 0L)                       // unpaired: always kept
    ).toDF("doc_id", "pref")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupNearBy(d, "doc_id", pairs, "id_a", "id_b", "pref")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 6L))
    // min-id preference column reproduces dedupNear exactly
    val byId = Dedup.dedupNearBy(
        d.withColumn("neg", -col("doc_id")), "doc_id",
        pairs, "id_a", "id_b", "neg")
      .select("doc_id").as[Long].collect().toSet
    val nearKept = Dedup.dedupNear(d, "doc_id", pairs, "id_a", "id_b")
      .select("doc_id").as[Long].collect().toSet
    assert(byId == nearKept)
  }

  test("editDistancePairs finds each single-edit kind and excludes distance 2") {
    val d = Seq(
      1L -> "market report",   // clean
      2L -> "market reprt",    // deletion        -> dist 1 to 1
      3L -> "market rexort",   // substitution    -> dist 1 to 1
      4L -> "market repoort",  // insertion       -> dist 1 to 1
      5L -> "market rpeort",   // transposition   -> dist 2 to 1: excluded
      6L -> "market report",   // exact duplicate -> dist 0 to 1
      7L -> "unrelated title").toDF("doc_id", "title")
    val out = Dedup.editDistancePairs(d, "doc_id", "title", maxDist = 1)
      .as[(Long, Long, Int)].collect().sortBy(p => (p._1, p._2)).toSeq
    assert(out === Seq((1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 1), (1L, 6L, 0),
      (2L, 6L, 1), (3L, 6L, 1), (4L, 6L, 1)))
  }

  test("editDistancePairs equals driver-side brute force on random strings") {
    // the completeness theorem, checked against an independent DP
    // implementation: every <=1-edit pair the quadratic scan finds, the
    // symmetric-delete blocking must also find — on strings random enough
    // to hit boundary shapes (shared prefixes, length +-1, empty-ish)
    val rnd = new scala.util.Random(42)
    val strs = (0L until 90L).map { i =>
      i -> (0 until (1 + rnd.nextInt(7))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    for (maxDist <- Seq(1, 2)) {
      val expected = (for {
        (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
        d = lev(sa, sb) if d <= maxDist
      } yield (ia, ib, d)).sorted
      val got = Dedup.editDistancePairs(
          strs.toDF("doc_id", "title"), "doc_id", "title", maxDist)
        .as[(Long, Long, Int)].collect().sortBy(p => (p._1, p._2)).toSeq
      assert(got === expected, s"maxDist=$maxDist")
    }
  }

  test("editDistancePairs handles empty strings and rejects null keys") {
    val out = Dedup.editDistancePairs(
        Seq(1L -> "", 2L -> "a", 3L -> "", 4L -> "ab").toDF("doc_id", "title"),
        "doc_id", "title", maxDist = 1)
      .as[(Long, Long, Int)].collect().sortBy(p => (p._1, p._2)).toSeq
    // "" ~ "" dist 0, "" ~ "a" dist 1 (both empties), "a" ~ "ab" dist 1;
    // "" ~ "ab" is dist 2 and must NOT appear
    assert(out === Seq((1L, 2L, 1), (1L, 3L, 0), (2L, 3L, 1), (2L, 4L, 1)))
    val e = intercept[Exception] {
      Dedup.editDistancePairs(
        Seq((1L, "ok"), (2L, null)).toDF("doc_id", "title"),
        "doc_id", "title").collect()
    }
    assert(e.getMessage.contains("editDistancePairs"))
  }

  test("lineDedup removes a frequent line at EVERY position it occupies") {
    // the same boilerplate twice within one doc: both copies drop
    val d = docs(
      1L -> "ad\nkeep me\nad",
      2L -> "ad\nother text",
      3L -> "ad")
    val out = Dedup.lineDedup(d, "doc_id", "text", maxOccurrences = 1)
      .select("doc_id", "clean_text", "n_lines_removed")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, "keep me", 2L), (2L, "other text", 1L), (3L, "", 1L)))
  }

  test("containment join sees the excerpt Jaccard misses") {
    val needles = Seq(1L -> "a b c d e").toDF("doc_id", "text")
    // hay 10: full quote inside a much longer page (J ~ 3/13, c = 1.0);
    // hay 11: every needle trigram broken up -> no pair
    val hay = Seq(
      10L -> ("j1 j2 j3 j4 j5 j6 j7 j8 j9 j10 a b c d e z1 z2 z3"),
      11L -> "a b q c d q e").toDF("doc_id", "text")
    val out = Dedup.containmentJoin(
        needles, hay, "doc_id", "text",
        blockCols = Seq.empty, shingleSize = 3, threshold = 0.8)
      .select("id_a", "id_b", "n_a", "inter", "containment")
      .as[(Long, Long, Int, Int, Double)].collect().toSeq
    assert(out === Seq((1L, 10L, 3, 3, 1.0)))
    // symmetric Jaccard at the same threshold finds nothing here
    assert(Dedup.jaccardJoin(needles, hay, "doc_id", "text",
      Seq.empty, 3, 0.8).count() === 0)
  }

  test("containment join: partial overlap respects the threshold exactly") {
    // needle has 4 trigrams; hay contains 3 of them (0.75 < 0.8 drops,
    // 0.75 >= 0.7 passes) — the boundary is the unrounded ratio
    val needles = Seq(1L -> "a b c d e f").toDF("doc_id", "text")
    val hay = Seq(20L -> "a b c d e x").toDF("doc_id", "text")
    assert(Dedup.containmentJoin(needles, hay, "doc_id", "text",
      Seq.empty, 3, 0.8).count() === 0)
    val out = Dedup.containmentJoin(needles, hay, "doc_id", "text",
        Seq.empty, 3, 0.7)
      .select("id_a", "id_b", "n_a", "inter", "containment")
      .as[(Long, Long, Int, Int, Double)].collect().toSeq
    assert(out === Seq((1L, 20L, 4, 3, 0.75)))
    intercept[IllegalArgumentException](Dedup.containmentJoin(
      needles, hay, "doc_id", "text", Seq.empty, 3, 0.0))
  }
}
