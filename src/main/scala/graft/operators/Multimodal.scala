package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extract runs
  * per-partition close to the data.
  *
  * Decode status by format (round 16): formats the JVM itself speaks
  * decode FOR REAL — PNG/JPEG/GIF/BMP pixels via ImageIO and WAV PCM
  * samples via a RIFF parse, as codegen'd expressions in
  * [[graft.functions.ImageExprs]] (pixel-exact stats, deterministic
  * nearest-neighbor resize; oracle-gated by q190/q191). Only formats
  * that genuinely need external codec libraries (mp3/h264/...) remain
  * STUBBED: `stubFeatures` derives a deterministic fake feature vector
  * from the bytes, and everything around it — schema, batching,
  * partitioning, metadata extraction — is the real Spark plumbing a
  * production codec call drops into.
  */
object Multimodal {

  /** Canonical multimodal record schema: (id, modality, payload, meta). */
  def ingest(
      df: DataFrame,
      idCol: String,
      payload: Column,
      modality: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      lit(modality).as("modality"),
      payload.cast("binary").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")))
      .withColumn("content_sha", sha2(col("payload"), 256))

  // ------------------------------------------------------------------
  // REAL header parsing (no codec libs needed — pure byte arithmetic)
  // ------------------------------------------------------------------

  /** Big-endian unsigned int from `len` bytes at 1-based `pos`:
    * conv(hex(slice), 16, 10). substring on BinaryType slices bytes;
    * everything is a codegen'd built-in.
    */
  def beUInt(bin: Column, pos: Int, len: Int): Column = {
    require(len >= 1 && len <= 7, s"len must keep the value in a long: $len")
    conv(hex(substring(bin, pos, len)), 16, 10).cast("bigint")
  }

  /** Little-endian unsigned int from `len` bytes at 1-based `pos` —
    * per-byte extraction summed with powers of 256 (no byte-reverse
    * built-in exists; len <= 7 keeps the sum exact in a long).
    */
  def leUInt(bin: Column, pos: Int, len: Int): Column = {
    require(len >= 1 && len <= 7, s"len must keep the value in a long: $len")
    (0 until len).map(i =>
      conv(hex(substring(bin, pos + i, 1)), 16, 10).cast("bigint") *
        (1L << (8 * i)): Column)
      .reduce(_ + _)
  }

  /** PNG signature check: the fixed 8-byte preamble. */
  def isPng(bin: Column): Column =
    hex(substring(bin, 1, 8)) === "89504E470D0A1A0A"

  /** PNG pixel dimensions parsed from the IHDR chunk — REAL metadata
    * extraction, not a stub: the first chunk of a valid PNG is IHDR,
    * whose payload starts at byte 17 with width and height as big-endian
    * uint32 (public PNG spec, ISO/IEC 15948 §11.2.2). Returns
    * struct(width, height); null payloads/truncated headers yield nulls
    * via substring's slice semantics. This is the "typed metadata from
    * opaque binary" path a 100 TB image pipeline runs BEFORE any decode —
    * resolution filtering without touching pixel data.
    */
  def pngDimensions(bin: Column): Column =
    when(isPng(bin) && octet_length(bin) >= 24,
      struct(
        beUInt(bin, 17, 4).as("width"),
        beUInt(bin, 21, 4).as("height")))

  /** WAV (RIFF) audio metadata from the canonical 44-byte header:
    * sample rate (LE uint32 at byte 25), channels (LE uint16 at 23),
    * bits per sample (LE uint16 at 35) — public RIFF/WAVE layout. The
    * guard requires "fmt " as the FIRST subchunk (byte 13): real WAVs
    * can carry LIST/JUNK chunks before fmt, and reading fixed offsets
    * through a foreign chunk would return well-formed garbage — such
    * files yield null here (honest "can't parse", never a wrong rate).
    */
  def wavMeta(bin: Column): Column =
    when(
      hex(substring(bin, 1, 4)) === "52494646" && // "RIFF"
        hex(substring(bin, 9, 4)) === "57415645" && // "WAVE"
        hex(substring(bin, 13, 4)) === "666D7420" && // "fmt " first chunk
        octet_length(bin) >= 36,
      struct(
        leUInt(bin, 25, 4).as("sample_rate"),
        leUInt(bin, 23, 2).as("channels"),
        leUInt(bin, 35, 2).as("bits_per_sample")))

  /** Magic-byte file-type sniffing over an opaque binary column — the
    * content-verification stage a 100 TB multimodal pipeline runs BEFORE
    * routing payloads to decoders (extension/metadata lies; the leading
    * bytes don't): PNG / JPEG / GIF / RIFF-WAV / RIFF-AVI / PDF / ZIP /
    * gzip by their published signatures, else 'unknown'. RIFF resolves
    * its inner form tag so a WAV is never just "RIFF". Truncated payloads
    * fall through honestly: hex(substring) of a too-short slice can't
    * equal a full signature. Pure codegen'd projection (substring + hex
    * comparisons), no shuffle; null payload -> null.
    */
  def sniffType(bin: Column): Column =
    when(bin.isNull, lit(null).cast("string"))
      .when(hex(substring(bin, 1, 8)) === "89504E470D0A1A0A", "png")
      .when(hex(substring(bin, 1, 3)) === "FFD8FF", "jpeg")
      .when(hex(substring(bin, 1, 4)) === "47494638", "gif")
      .when(hex(substring(bin, 1, 4)) === "52494646" &&
        hex(substring(bin, 9, 4)) === "57415645", "wav")
      .when(hex(substring(bin, 1, 4)) === "52494646" &&
        hex(substring(bin, 9, 4)) === "41564920", "avi")
      .when(hex(substring(bin, 1, 4)) === "25504446", "pdf")
      .when(hex(substring(bin, 1, 4)) === "504B0304", "zip")
      .when(hex(substring(bin, 1, 2)) === "1F8B", "gzip")
      .otherwise("unknown")

  /** Little-endian hex of the low `bytes` bytes of a non-negative value —
    * building block for synthetic RIFF headers.
    */
  private def leHex(x: Column, bytes: Int): Column = {
    val he = lpad(hex(x), bytes * 2, "0")
    concat((0 until bytes).map(i =>
      substring(he, (bytes - 1 - i) * 2 + 1, 2)): _*)
  }

  /** Deterministic SYNTHETIC PNG: a spec-valid signature + IHDR prefix for
    * the given dimensions. Fixture generator for the parsing path (no
    * real image corpus ships in this environment) — [[pngDimensions]] of
    * the result is (width, height) by construction, which is exactly what
    * the q73 gate checks end-to-end.
    */
  def syntheticPng(width: Column, height: Column): Column =
    unhex(concat(
      lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      lpad(hex(width), 8, "0"),
      lpad(hex(height), 8, "0"),
      lit("0806000000")))

  /** Deterministic SYNTHETIC WAV: the canonical 44-byte RIFF/WAVE header
    * prefix (PCM, 16-bit) for the given rate/channels — fixture for
    * [[wavMeta]], little-endian fields laid out per the public RIFF spec.
    */
  def syntheticWav(sampleRate: Column, channels: Column): Column =
    unhex(concat(
      lit("52494646"), leHex(lit(36L), 4), lit("57415645"),
      lit("666D7420"), leHex(lit(16L), 4), leHex(lit(1L), 2),
      leHex(channels, 2), leHex(sampleRate, 4),
      leHex(sampleRate * channels * 2L, 4), leHex(channels * 2L, 2),
      leHex(lit(16L), 2)))

  /** STUB decode: a real implementation would decode the media payload
    * (JPEG/PNG/WAV/...) inside a mapPartitions/Pandas-UDF-style batch and
    * emit float features. This stand-in derives `dim` deterministic floats
    * from byte-range hashes so the downstream plumbing (schema
    * array<double>, per-partition batch shape, similarity ops) is fully
    * exercised and testable.
    */
  def stubFeatures(payload: Column, dim: Int = 8): Column =
    transform(
      sequence(lit(0), lit(dim - 1)),
      i =>
        (pmod(xxhash64(payload, i), lit(1000000L)).cast("double") / 500000.0)
          - 1.0)

  /** Frame/chunk sampling plumbing: split the payload into fixed-size byte
    * chunks (the binary analogue of video frame sampling), keeping every
    * `stride`-th chunk. Real decoders substitute codec-aware boundaries.
    */
  def sampleChunks(
      df: DataFrame,
      chunkBytes: Int = 1024,
      stride: Int = 2): DataFrame = {
    val nChunks = ceil(octet_length(col("payload")).cast("double") / chunkBytes)
      .cast("int")
    val chunks = transform(
      sequence(lit(0), greatest(nChunks - 1, lit(0))),
      i => col("payload").substr(i * chunkBytes + 1, lit(chunkBytes)))
    df.select(col("*"), posexplode(chunks).as(Seq("chunk_idx", "chunk_bytes")))
      .filter(pmod(col("chunk_idx"), lit(stride)) === 0)
  }

  /** Full extract pipeline: ingest -> features -> per-modality stats.
    * Partitioned by id hash before the (stub) decode so a real decoder
    * parallelizes evenly regardless of source file layout.
    */
  def features(df: DataFrame, idCol: String, payload: Column, modality: String,
      dim: Int = 8): DataFrame =
    ingest(df, idCol, payload, modality)
      .repartition(col("id"))
      .withColumn("features", stubFeatures(col("payload"), dim))
      .drop("payload")

  /** Batched decode over mapPartitions — the Spark-side shape a real
    * vectorized media decoder drops into: rows stream through each
    * partition in fixed-size batches so the codec amortizes its setup
    * (model load, GPU context) per batch, not per row. The decode itself
    * is STUBBED (no codec libraries in this environment): deterministic
    * features from byte-range hashes. Results are independent of batch
    * size and partitioning — a property the spec pins, because a real
    * decoder must preserve it too.
    *
    * Input: the `ingest` frame (id, modality, payload, ...).
    * Output: (id, modality, n_bytes, features array<double> of `dim`).
    */
  def decodeFeaturesBatched(
      ingested: DataFrame,
      dim: Int = 8,
      batchSize: Int = 64): DataFrame = {
    val spark = ingested.sparkSession
    import spark.implicits._
    ingested
      .select(col("id").cast("long"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one batch-shaped call, as a vectorized UDF would make
          val feats = stubDecodeBatch(batch.map(_._3), dim)
          batch.zip(feats).map { case ((id, mod, bytes), f) =>
            (id, mod, bytes.length, f)
          }
        }
      }
      .toDF("id", "modality", "n_bytes", "features")
  }

  /** STUB batch decoder: replace with a real codec call. Deterministic:
    * feature j of a payload = scaled xxhash of (payload, j).
    */
  private def stubDecodeBatch(
      payloads: Seq[Array[Byte]], dim: Int): Seq[Array[Double]] =
    payloads.map { bytes =>
      Array.tabulate(dim) { j =>
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            bytes.length, j.toLong)
        (java.lang.Math.floorMod(h, 1000000L).toDouble / 500000.0) - 1.0
      }
    }
}
