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

  test("pngDimensions parses a REAL png header byte-for-byte") {
    // a genuine 1x1 PNG's first 33 bytes (signature + IHDR), hand-checked
    // against the public spec — not the synthetic builder, so this also
    // cross-validates syntheticPng against reality
    val realPngHex =
      "89504E470D0A1A0A" + "0000000D" + "49484452" +
        "00000001" + "00000001" + "0802000000"
    val df = Seq(Tuple1(realPngHex)).toDF("hx")
      .select(unhex($"hx").as("payload"))
    val dims = df.select(Multimodal.pngDimensions($"payload").as("d"))
      .select($"d.width", $"d.height").as[(Long, Long)].head()
    assert(dims == ((1L, 1L)))
  }

  test("synthetic headers round-trip through the byte parsers; junk yields null") {
    val df = Seq((640L, 480L, 44100L, 2L), (8191L, 1L, 16000L, 1L))
      .toDF("w", "h", "rate", "ch")
      .select(
        Multimodal.syntheticPng($"w", $"h").as("png"),
        Multimodal.syntheticWav($"rate", $"ch").as("wav"),
        $"w", $"h", $"rate", $"ch")
    val out = df.select(
        Multimodal.pngDimensions($"png").as("d"),
        Multimodal.wavMeta($"wav").as("a"),
        $"w", $"h", $"rate", $"ch")
      .select($"d.width", $"d.height", $"a.sample_rate", $"a.channels",
        $"a.bits_per_sample", $"w", $"h", $"rate", $"ch")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    out.foreach { r =>
      assert(r._1 == r._6 && r._2 == r._7, s"png dims mismatch: $r")
      assert(r._3 == r._8 && r._4 == r._9 && r._5 == 16L, s"wav meta mismatch: $r")
    }
    // non-media bytes and truncated headers parse to null, not garbage;
    // so does a real RIFF/WAVE whose FIRST chunk is JUNK instead of
    // "fmt " — fixed-offset reads through a foreign chunk would return
    // well-formed nonsense (e.g. ASCII bytes as a ~1.2e9 Hz rate). The
    // fixture is 44 bytes, PAST the 36-byte length guard, so only the
    // fmt-first check can reject it — reverting that guard fails here
    val junkFirstChunkWav =
      "52494646" + "24000000" + "57415645" + "4A554E4B" + // "JUNK" at 13
        "18000000" + "61626364" * 6 // 24 payload bytes -> 44 total
    val junk = Seq(Tuple1("deadbeef"), Tuple1("89504E47"),
        Tuple1(junkFirstChunkWav))
      .toDF("s").select(unhex($"s").as("b"))
    assert(junk.filter(Multimodal.pngDimensions($"b").isNotNull).count() == 0)
    assert(junk.filter(Multimodal.wavMeta($"b").isNotNull).count() == 0)
  }

  test("sniffType identifies magic bytes and falls through honestly") {
    val cases: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "png" -> Multimodal.syntheticPng(lit(10L), lit(20L)),
      "wav" -> Multimodal.syntheticWav(lit(44100L), lit(2L)),
      "jpeg" -> unhex(lit("FFD8FFE000104A46494600")),
      "gif" -> unhex(lit("47494638396100")),
      "pdf" -> unhex(lit("255044462D312E34")),
      "zip" -> unhex(lit("504B03040A00")),
      "gzip" -> unhex(lit("1F8B0800")),
      "avi" -> unhex(lit("52494646AAAAAAAA41564920")),
      "wav" -> unhex(lit("52494646AAAAAAAA57415645")),
      // RIFF with a foreign form tag is NOT a wav/avi
      "unknown" -> unhex(lit("52494646AAAAAAAA58585858")),
      // 1-byte truncation of a gzip signature
      "unknown" -> unhex(lit("1F")),
      "unknown" -> unhex(lit("00112233")))
    val out = spark.range(1)
      .select(cases.zipWithIndex.map { case ((_, c), i) =>
        Multimodal.sniffType(c).as(s"c$i")
      }: _*).collect().head
    cases.zipWithIndex.foreach { case ((expected, _), i) =>
      assert(out.getString(i) === expected, s"case $i")
    }
    val nul = spark.range(1)
      .select(Multimodal.sniffType(lit(null).cast("binary")).as("k"))
      .collect().head
    assert(nul.isNullAt(0))
  }
}
