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

  test("packing and clustering survive empty inputs") {
    val empty = spark.emptyDataset[(Long, Long)].toDF("doc_id", "n_toks")
    assert(Packing.packSequences(empty, "doc_id", "n_toks", 128L, 4).count() == 0)
    val noPairs = spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(noPairs, "id_a", "id_b").count() == 0)
    assert(Dedup.connectedComponents(noPairs, "id_a", "id_b", driverCutoff = 0L)
      .count() == 0)
  }
}
