package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extract runs
  * per-partition close to the data.
  *
  * The actual media decode is STUBBED (no codec libraries in this
  * environment): `stubFeatures` derives a deterministic fake feature vector
  * from the bytes. Everything around it — schema, batching, partitioning,
  * metadata extraction — is the real Spark plumbing a production decode UDF
  * would drop into.
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
