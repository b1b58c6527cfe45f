package graft

import graft.operators.{CurationFilters, Dedup, Packing, TextAnalysis}
import org.apache.spark.sql.functions._

/** Library contract for degenerate text: a null, empty, or whitespace-only
  * `text` must never crash an operator. Where a document has no tokens it
  * either reports zero-valued metrics (analyze, repetitionStats) or drops
  * out of token-derived relations (pairs, n-grams) — never a
  * NullPointerException five stages into a 100 TB job.
  */
class NullSafetySpec extends SparkSpec {
  import spark.implicits._

  private def degenerate = Seq(
    (1L, "alpha beta alpha gamma"),
    (2L, null.asInstanceOf[String]),
    (3L, ""),
    (4L, "   ")).toDF("doc_id", "text")

  test("analyze survives null/empty/blank text") {
    val out = TextAnalysis.analyze(degenerate, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens").as[(Long, Option[Long])].collect()
    assert(out.length == 4)
    // the real doc counts 4 tokens; blank/empty count 0; null propagates
    // null (SQL semantics) — all three are non-crashing outcomes
    assert(out.head == (1L -> Some(4L)))
    assert(out.drop(2).forall(_._2.forall(_ == 0L)))
  }

  test("repetition, n-gram, and dedup operators survive degenerate text") {
    assert(CurationFilters.repetitionStats(degenerate, "doc_id", "text")
      .count() >= 1)
    assert(CurationFilters.heavyNgrams(degenerate, "text", 2, 1L, 5)
      .count() >= 1)
    assert(CurationFilters.decontaminate(
      degenerate, degenerate.filter($"doc_id" === 1L), "doc_id", "text", 2)
      .count() == 1) // only the real doc can share grams with itself
    assert(Dedup.jaccardPairs(degenerate, "doc_id", "text", Nil, 1, 0.5)
      .count() == 0) // no two real docs
    assert(Dedup.minhashNearDuplicates(degenerate, "doc_id", "text").count() == 0)
    assert(Dedup.simhashNearDuplicates(degenerate, "doc_id", "text", 3).count() >= 0)
    assert(TextAnalysis.tfidfTopTerms(degenerate, "doc_id", "text", 2).count() > 0)
    assert(Dedup.dedupExact(degenerate, "doc_id", "text").count() >= 3)
  }

  test("round-5 text/binary operators survive degenerate input") {
    // sanitize/blockwords/pii: null propagates null, empty stays empty
    val hygiene = degenerate.select(
      $"doc_id",
      TextAnalysis.sanitizeText($"text").as("clean"),
      TextAnalysis.blockwordCount($"text", Seq("alpha")).as("nb"))
      .orderBy("doc_id")
      .as[(Long, Option[String], Option[Long])].collect()
    assert(hygiene.length == 4)
    assert(hygiene(0)._3.contains(2L)) // "alpha" twice
    assert(hygiene(1)._2.isEmpty && hygiene(1)._3.isEmpty) // null -> null
    assert(hygiene(2)._2.contains("") && hygiene(2)._3.contains(0L))
    assert(CurationFilters.piiScan(degenerate, "doc_id", "text").count() == 4)
    // entropy/chunking/histogram: tokenless docs drop out or bucket to 0
    assert(TextAnalysis.charEntropyStats(degenerate, "doc_id", "text")
      .count() == 2) // the real doc + the 3-space doc (spaces are chars)
    assert(Packing.chunkTexts(degenerate, "text", 4).count() == 1)
    assert(Dedup.chunkDedup(degenerate, "doc_id", "text", 4).count() == 1)
    assert(TextAnalysis.tokenHistogram(degenerate, "doc_id", "text", Seq(2))
      .count() == 4) // every doc lands in a bucket, null text -> 0 tokens
    // binary parsers: null payload -> null metadata, no crash
    val nullBin = Seq(Tuple1(null.asInstanceOf[Array[Byte]])).toDF("b")
    assert(nullBin.select(graft.operators.Multimodal.pngDimensions($"b"))
      .first().isNullAt(0))
  }

  test("continuation-batch operators survive degenerate text") {
    // stripMarkup/charClasses: null propagates null, empty stays zeroed
    val strip = degenerate.select(
      $"doc_id", TextAnalysis.stripMarkup($"text").as("s"))
      .orderBy("doc_id").as[(Long, Option[String])].collect()
    assert(strip(1)._2.isEmpty)         // null -> null
    assert(strip(2)._2.contains(""))    // empty -> empty
    assert(strip(3)._2.contains(""))    // whitespace-only -> trimmed empty
    val classes = TextAnalysis.charClasses(degenerate, "doc_id", "text")
      .orderBy("id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long],
        Option[Long], Option[Long])].collect()
    assert(classes(1)._2.isEmpty)        // null text -> null counts
    assert(classes(2)._2.contains(0L))   // empty -> all-zero counts
    // bigram LM: docs without two tokens (null/empty/blank) drop out
    assert(TextAnalysis.bigramLogProb(degenerate, "doc_id", "text")
      .count() == 1)
    // gapStats on an empty frame is empty, not a crash
    val noEvents = spark.emptyDataset[(String, Long, Long)]
      .toDF("k", "ts", "id")
    assert(graft.operators.Sessionize.gapStats(noEvents, "k", "ts",
      Seq("ts", "id")).count() == 0)
    // snapshot diff where one side is empty: everything added/removed
    val empty = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    val one = Seq((1L, "x")).toDF("doc_id", "text")
    assert(graft.operators.SnapshotDiff.diff(empty, one, "doc_id", "text")
      .as[(Long, String)].collect().toSeq == Seq((1L, "added")))
    assert(graft.operators.SnapshotDiff.diff(one, empty, "doc_id", "text")
      .as[(Long, String)].collect().toSeq == Seq((1L, "removed")))
  }

  test("round-10 operators survive degenerate text and vectors") {
    // langIdScores: null/empty/blank docs have no grams — they drop from
    // the scored relation (carry no evidence), never crash; a seed whose
    // labels are null still counts as a class value? No: null labels are
    // their own group — keep the contract simple by labeling the seed
    val labeled = degenerate.withColumn("lang",
      when($"doc_id" === 1L, lit("aa")).otherwise(lit("bb")))
    val scored = TextAnalysis.langIdScores(
      labeled.unionByName(labeled.withColumn("doc_id", $"doc_id" + 10L)),
      "doc_id", "text", "lang", seedMax = 10L)
    // null (12) and empty (13) have no grams and drop; the 3-space doc
    // (14) legitimately scores via its whitespace trigram — char-gram
    // models treat word-boundary runs as signal by design
    assert(scored.select("id").as[Long].collect().toSet == Set(11L, 14L),
      "null/empty docs must drop (and only they), not crash")
    // bpeEncode: null text encodes to a null token array; empty/blank to
    // empty arrays — never a crash
    val enc = TextAnalysis.bpeEncode(degenerate, "doc_id", "text",
        Seq(("alpha", "beta")))
      .orderBy("id").select("tokens").as[Option[Seq[String]]].collect()
    assert(enc.length == 4 && enc.head.exists(_.head == "alpha_beta"))
    assert(enc.drop(2).forall(_.forall(_.isEmpty)))
    // marginMine: zero-norm vectors on either side drop silently, and an
    // all-orthogonal pair (margin denominator exactly 0) drops instead
    // of raising ANSI DIVIDE_BY_ZERO
    val z = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 0.0))).toDF("id", "vec")
    val t = Seq(
      (10L, Seq(0.6, 0.8)), (11L, Seq(0.0, 0.0)), (12L, Seq(0.0, 1.0)))
      .toDF("id", "vec")
    val mined = graft.operators.Similarity.marginMine(z, t, "id", "vec", 1, 0.0)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toSeq
    assert(mined == Seq((2L, 10L)))
    val allOrthogonal = graft.operators.Similarity.marginMine(
        z, t.filter($"id" === 12L), "id", "vec", 1, 0.0)
    assert(allOrthogonal.count() == 0)
  }

  test("packing and clustering survive empty inputs") {
    val empty = spark.emptyDataset[(Long, Long)].toDF("doc_id", "n_toks")
    assert(Packing.packSequences(empty, "doc_id", "n_toks", 128L, 4).count() == 0)
    val noPairs = spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(noPairs, "id_a", "id_b").count() == 0)
    assert(Dedup.connectedComponents(noPairs, "id_a", "id_b", driverCutoff = 0L)
      .count() == 0)
  }
}
