package graft

import graft.operators.{CurationFilters, Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** Runnable demo of the training-data curation pipeline over the
  * `documents` table: sanitize + PII scrub -> line-level boilerplate
  * removal -> language gate -> quality gate -> exact dedup -> minhash
  * near-dup removal -> deterministic split -> shard-shuffled,
  * range-clustered parquet, with per-stage counts printed. The batch shape a 100 TB crawl day runs; every
  * operator here is individually oracle- or spec-checked (COVERAGE.md).
  * Usage:
  *
  *   sbt "runMain graft.CurationDemo [sfDir] [outDir]"
  */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-curation").toString)
    val spark = Tables.localSession("graft-curation-demo",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val raw = Tables.load(spark, sfDir, "documents")
    val total = raw.count()

    // hygiene first: strip control/format chars, redact PII — both pure
    // map-side projections, so they cost one scan fused with the gates
    val docs = raw.withColumn("text",
      CurationFilters.redactPii(TextAnalysis.sanitizeText(col("text"))))

    // line-level boilerplate removal BEFORE scoring: corpus-frequent
    // lines (nav chrome, cookie banners, footers) would otherwise drag
    // quality scores and seed spurious near-dup pairs
    val lineClean = Dedup.lineDedup(docs, "doc_id", "text", maxOccurrences = 2)
      .withColumn("text", col("clean_text"))
      .drop("clean_text", "n_lines", "n_lines_removed")

    // language + quality gates: pure column predicates, push down to scan
    val gated = lineClean
      .filter(col("lang").isin("en", "de", "fr", "es"))
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .filter(col("q") >= 0.7)
    val nGated = gated.count()

    // exact dedup: deterministic survivor per content digest
    val exact = Dedup.dedupExact(gated, "doc_id", "text")
    val nExact = exact.count()

    // near-dup removal: drop the HIGHER id of every verified minhash pair
    // (keep-first policy, mirrors dedupExact's survivor choice)
    val pairs = Dedup.minhashNearDuplicates(
      exact, "doc_id", "text",
      shingleSize = 2, numHashes = 64, bands = 16, threshold = 0.6)
    val losers = pairs.select(col("id_b").as("doc_id")).distinct()
    val nearDeduped = exact.join(losers, Seq("doc_id"), "left_anti")
    val nNear = nearDeduped.count()

    // deterministic split, then a deterministic training-order shuffle
    // (shard, pos) before the clustered write — the read order a trainer
    // consumes is part of the artifact, not an afterthought
    val split = Sampling.assignSplit(
      nearDeduped, "doc_id", Seq("train" -> 0.9, "eval" -> 0.1))
    split.groupBy("split").count().orderBy("split").collect()
      .foreach(r => println(s"[curation] split ${r.get(0)}: ${r.get(1)} docs"))
    val shuffled = Sampling.deterministicShuffle(split, "doc_id", numShards = 8)
    graft.sinks.Sinks.writeClustered(
      shuffled, s"$outDir/corpus", Seq("shard", "pos"),
      targetRecordsPerFile = 100000L)

    println(s"[curation] total=$total gated=$nGated exact_deduped=$nExact " +
      s"near_deduped=$nNear -> $outDir/corpus")
    val back = spark.read.parquet(s"$outDir/corpus").count()
    println(s"[curation] written+read back: $back docs")
    assert(back == nNear, s"write/read mismatch: $back != $nNear")
    spark.stop()
  }
}
