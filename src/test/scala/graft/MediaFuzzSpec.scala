package graft

import graft.functions.ImageExprs
import org.apache.spark.sql.functions._

/** Seeded structural fuzz over the media decode expressions (round 18
  * — the round-17 hardening was pinned on HANDCRAFTED hostile headers;
  * this arm generates ~10^4 random corruptions and asserts the decode
  * CONTRACT on every one): truncations, single-byte flips, length-field
  * mutations, and random splices of the synthetic PNG/WAV/AVI fixtures
  * run through every decode expression, which must return a clean value
  * or null — never throw, never allocate past the guards' caps. Runs as
  * ONE Spark job per format (the corruptions are rows, the expressions
  * columns), so the whole arm stays inside the suite's runtime budget.
  *
  * Determinism: corruption offsets/bytes come from a fixed-seed
  * java.util.Random stream, so a failure reproduces exactly.
  */
class MediaFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val N = 3500 // per format; ~10^4 corrupted inputs total

  /** Deterministic corruption stream: for input `base`, derive N
    * mutants — truncate at a random cut, flip 1-4 random bytes, stamp a
    * random int32 over a random offset (length/dimension fields
    * included by coverage), or splice two random windows.
    */
  private def mutants(base: Array[Byte], seed: Long): Seq[Array[Byte]] = {
    val rnd = new java.util.Random(seed)
    (0 until N).map { _ =>
      val b = base.clone()
      rnd.nextInt(4) match {
        case 0 => // truncation (possibly to zero)
          java.util.Arrays.copyOf(b, rnd.nextInt(b.length + 1))
        case 1 => // byte flips
          (0 until 1 + rnd.nextInt(4)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          }
          b
        case 2 => // int32 stamp (hits length/dimension fields often)
          val off = rnd.nextInt(math.max(1, b.length - 4))
          val v = rnd.nextInt()
          (0 until 4).foreach(i => b(off + i) = (v >>> (8 * i)).toByte)
          b
        case 3 => // splice a window over another
          val len = 1 + rnd.nextInt(math.max(1, b.length / 4))
          val src = rnd.nextInt(math.max(1, b.length - len))
          val dst = rnd.nextInt(math.max(1, b.length - len))
          System.arraycopy(b, src, b, dst, len)
          b
      }
    }
  }

  private def fuzz(base: Array[Byte], seed: Long)(
      cols: org.apache.spark.sql.Column*): Unit = {
    val df = mutants(base, seed).zipWithIndex
      .map { case (b, i) => (i.toLong, b) }
      .toDF("i", "bin")
      .repartition(32)
    // the contract is "never throw": one action over every (mutant,
    // expression) cell — any decode that throws fails the job here.
    // The hash FORCES evaluation (a bare count() would let the
    // optimizer prune every unevaluated decode column away)
    // pmod before the sum: ANSI mode makes a raw sum of 3500 xxhash64
    // longs an ARITHMETIC_OVERFLOW (the house no-long-overflow rule)
    val out = df
      .select(pmod(xxhash64(col("i") +: cols: _*),
        lit(1000000007L)).as("h"))
      .agg(count(lit(1)).as("n"), sum(col("h")))
      .collect()(0)
    assert(out.getLong(0) === N.toLong)
  }

  private def one[T](df: org.apache.spark.sql.DataFrame): Array[Byte] =
    df.collect()(0).getAs[Array[Byte]](0)

  test("PNG decode expressions survive 10^4-scale structural fuzz") {
    val png = one(spark.range(1)
      .select(ImageExprs.pngSynthWave(lit(40), lit(30), lit(7)).as("b")))
    fuzz(png, seed = 0x9A61L)(
      ImageExprs.imageStats(col("bin")),
      ImageExprs.imagePHash(col("bin")),
      ImageExprs.imageDHash(col("bin")),
      ImageExprs.imageGridFeatures(col("bin"), lit(4), lit(4)),
      ImageExprs.imageResizeNn(col("bin"), lit(8), lit(8)),
      ImageExprs.imageLinearMap(col("bin"), lit(1), lit(2), lit(64)))
  }

  test("WAV decode expressions survive structural fuzz") {
    val wav = one(spark.range(1)
      .select(ImageExprs.wavSynthDual(lit(8000), lit(1024), lit(3)).as("b")))
    fuzz(wav, seed = 0x57A7L)(
      ImageExprs.wavStats(col("bin")),
      ImageExprs.audioBandFeatures(col("bin"), lit(8), lit(128)),
      ImageExprs.wavGain(col("bin"), lit(1), lit(2)))
  }

  test("AVI decode expressions survive structural fuzz") {
    val avi = one(spark.range(1)
      .select(ImageExprs.aviSynthDib(lit(16), lit(12), lit(4), lit(9)).as("b")))
    fuzz(avi, seed = 0xA71L)(
      ImageExprs.aviMeta(col("bin")),
      ImageExprs.aviFrameStats(col("bin"), lit(1)))
  }
}
