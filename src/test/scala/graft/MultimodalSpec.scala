package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "first payload bytes"), (2L, "second payload"), (3L, "third"))
    .toDF("doc_id", "text")

  test("ingest produces canonical multimodal record") {
    val out = Multimodal.ingest(docs, "doc_id", col("text").cast("binary"), "text")
    assert(out.columns.toSeq === Seq("id", "modality", "payload", "n_bytes", "content_sha"))
    val r = out.filter($"id" === 1)
      .select("modality", "n_bytes").as[(String, Int)].head()
    assert(r === (("text", "first payload bytes".length)))
  }

  test("batched decode: right shape, deterministic, batch-size independent") {
    val ingested = Multimodal.ingest(docs, "doc_id", col("text").cast("binary"), "text")
    def run(bs: Int) = Multimodal.decodeFeaturesBatched(ingested, dim = 6, batchSize = bs)
      .select("id", "features").as[(Long, Seq[Double])].collect().toMap
    val a = run(1); val b = run(64)
    assert(a === b) // batch shape must not change results
    assert(a(1L).length === 6)
    assert(a.values.forall(_.forall(v => v >= -1.0 && v <= 1.0)))
    assert(a(1L) !== a(2L)) // different payloads, different features
  }

  test("chunk sampling keeps every stride-th chunk") {
    val big = Seq((1L, "ab" * 2000)).toDF("doc_id", "text") // 4000 bytes
    val ingested = Multimodal.ingest(big, "doc_id", col("text").cast("binary"), "video")
    val chunks = Multimodal.sampleChunks(ingested, chunkBytes = 1024, stride = 2)
    val idx = chunks.select("chunk_idx").as[Int].collect().sorted
    assert(idx.toSeq === Seq(0, 2)) // chunks 0..3, strided -> 0, 2
  }

  test("stub features flow into similarity search") {
    val feats = Multimodal.features(docs, "doc_id", col("text").cast("binary"), "text", dim = 8)
    val knn = graft.operators.Similarity.bruteForceTopK(
      feats.select(col("id"), col("features").as("vec")), "id", "vec",
      feats.select(col("id"), col("features").as("vec")).filter($"id" === 1),
      "id", "vec", k = 2)
    assert(knn.count() === 2)
  }
}
