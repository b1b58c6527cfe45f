package graft

import graft.operators.{Fsck, StableRead, TextAnalysis}
import org.apache.spark.sql.functions._

/** The persisted BPE tokenizer artifact: save/load round-trip, loud
  * load-time validation, fsck teeth on planted corruptions, and the
  * commit-manifest generation every estate artifact carries.
  */
class BpeArtifactSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower newest newest"),
    (3L, "low lower newest widest"),
    (4L, "newest newest newest low")).toDF("doc_id", "text")

  private def freshPath(tag: String): String =
    s"${java.nio.file.Files.createTempDirectory(s"bpe-$tag").toString}/tok"

  test("save/load round-trips the merge table in training order") {
    val path = freshPath("rt")
    val trained = TextAnalysis.bpeMerges(corpus, "text", rounds = 3)
    val inSession = trained.orderBy(col("round"))
      .select(col("pair_a"), col("pair_b"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    TextAnalysis.bpeSave(spark, trained, path)
    assert(TextAnalysis.bpeLoad(spark, path) === inSession)
    // encoding through the loaded table == encoding in-session
    val a = TextAnalysis.bpeEncode(corpus, "doc_id", "text", inSession)
      .orderBy(col("id")).collect().map(_.toString).toSeq
    val b = TextAnalysis.bpeEncode(corpus, "doc_id", "text",
        TextAnalysis.bpeLoad(spark, path))
      .orderBy(col("id")).collect().map(_.toString).toSeq
    assert(a === b)
    // estate-artifact contract: the save committed a manifest generation
    assert(StableRead.manifestGeneration(spark, path) === Some(1L))
    // clean artifact, clean audit
    assert(Fsck.bpeFsck(spark, path).count() === 0L)
    // republish bumps the generation (mode=overwrite lifecycle)
    TextAnalysis.bpeSave(spark, trained, path)
    assert(StableRead.manifestGeneration(spark, path) === Some(2L))
  }

  test("load refuses corrupt tables loudly; fsck flags the same states") {
    val path = freshPath("teeth")
    TextAnalysis.bpeSave(
      spark, TextAnalysis.bpeMerges(corpus, "text", rounds = 3), path)
    def republish(rows: Seq[(Long, String, String, Long, Long)]): Unit =
      rows.toDF("round", "pair_a", "pair_b", "pair_count", "tokens_after")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    // rank gap: round 2 missing
    republish(Seq((1L, "a", "b", 5L, 10L), (3L, "c", "d", 2L, 8L)))
    val gap = intercept[IllegalArgumentException] {
      TextAnalysis.bpeLoad(spark, path) }
    assert(gap.getMessage.contains("non-contiguous"))
    assert(Fsck.bpeFsck(spark, path).select("kind").as[String]
      .collect().contains("bpe_rank_gap"))
    // duplicate pair
    republish(Seq((1L, "a", "b", 5L, 10L), (2L, "a", "b", 2L, 8L)))
    val dup = intercept[IllegalArgumentException] {
      TextAnalysis.bpeLoad(spark, path) }
    assert(dup.getMessage.contains("duplicate"))
    assert(Fsck.bpeFsck(spark, path).select("kind").as[String]
      .collect().contains("bpe_duplicate_pair"))
    // stats disagreement (torn republish: table shrank, stats did not)
    republish(Seq((1L, "a", "b", 5L, 10L)))
    val torn = intercept[IllegalArgumentException] {
      TextAnalysis.bpeLoad(spark, path) }
    assert(torn.getMessage.contains("stats claim"))
    assert(Fsck.bpeFsck(spark, path).select("kind").as[String]
      .collect().contains("bpe_stats_nmerges"))
    // save itself refuses a malformed table BEFORE writing
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeSave(spark,
        Seq((1L, "a", "b", 5L, 10L), (2L, "a", "b", 2L, 8L))
          .toDF("round", "pair_a", "pair_b", "pair_count", "tokens_after"),
        freshPath("refuse"))
    }
  }
}
