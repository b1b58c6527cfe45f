package graft

import graft.functions.ImageExprs
import graft.functions.ImageExprs.Codec
import org.apache.spark.sql.functions._

/** Band-energy audio fingerprinting over the real WAV decode: spectral
  * sanity (a pure square wave concentrates energy at its own odd
  * harmonics), the exact power-of-two gain scaling that makes a
  * half-volume re-encode cosine-1.0, seed distinctness of the dual-wave
  * fixtures, stereo channel handling, and null-not-throw.
  */
class AudioFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
  }

  test("square wave energy concentrates at its fundamental's bin") {
    // the dual synth flips sign every p samples, so the FULL period is
    // 2p: s=20 -> p1=32 -> period 64 -> fundamental 256/64 = bin 4
    // (array index 3); the 8192-amplitude wave dominates the 4096 one
    val dual = Codec.encodeWavDual(8000, 2048, 20)
    val f = Codec.audioBandFeatures(dual, 64, 256)
    assert(f != null && f.length === 64)
    assert(f.indexOf(f.max) === 3,
      s"fundamental not at bin 4: argmax=${f.indexOf(f.max) + 1}")
    // encodeWavSquare's period-4 square (2 up, 2 down): bin 64 (idx 63)
    val wav = Codec.encodeWavSquare(8000, 10000, 2048)
    val f4 = Codec.audioBandFeatures(wav, 64, 256)
    assert(f4.indexOf(f4.max) === 63)
  }

  test("half-gain re-encode: features scale by exactly 1/4, cosine 1.0") {
    val base = Codec.encodeWavDual(8000, 2048, 5)
    val half = Codec.wavGain(base, 1, 2)
    val fb = Codec.audioBandFeatures(base, 24, 256)
    val fh = Codec.audioBandFeatures(half, 24, 256)
    fb.zip(fh).foreach { case (b, h) =>
      assert(h === b / 4.0, "power-of-two gain must scale bits-exactly")
    }
    assert(math.abs(cos(fb, fh) - 1.0) < 1e-12)
  }

  test("distinct seeds produce separable spectra") {
    // 24 bands cover every fixture fundamental (p1 = 12..36 -> bins
    // ~7..21 at win 256) — the gate's configuration
    val feats = (0 until 25).map(s =>
      Codec.audioBandFeatures(Codec.encodeWavDual(8000, 2048, s), 24, 256))
    for (a <- 0 until 25; b <- 0 until 25 if a < b)
      assert(cos(feats(a), feats(b)) < 0.999,
        s"seeds $a/$b spectra collide: ${cos(feats(a), feats(b))}")
  }

  test("stereo reads channel 0; short and corrupt payloads are null") {
    // stereo fixture: interleave channel0 = dual wave, channel1 = zeros
    val mono = Codec.encodeWavDual(8000, 512, 3)
    val bb = java.nio.ByteBuffer.wrap(mono)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = 512
    val stereo = new Array[Byte](44 + 4 * n)
    val sb = java.nio.ByteBuffer.wrap(stereo)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    sb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 4 * n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(8000).putInt(8000 * 4)
      .putShort(4).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(4 * n)
    (0 until n).foreach { i =>
      sb.putShort(bb.getShort(44 + 2 * i)); sb.putShort(0.toShort)
    }
    val fm = Codec.audioBandFeatures(mono, 8, 256)
    val fs = Codec.audioBandFeatures(stereo, 8, 256)
    assert(fs != null)
    fm.zip(fs).foreach { case (m, s) => assert(m === s) }
    // fewer samples than one window -> null
    assert(Codec.audioBandFeatures(
      Codec.encodeWavDual(8000, 100, 1), 8, 256) == null)
    // garbage -> null, and via the expression too
    assert(Codec.audioBandFeatures(Array[Byte](1, 2, 3), 8, 256) == null)
    assert(Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("wav")
      .select(ImageExprs.audioBandFeatures(
        col("wav"), lit(8), lit(256)).as("f"))
      .filter(col("f").isNotNull).count() === 0L)
  }

  test("expression chain matches the codec and feeds cosine search") {
    val got = Seq((1, 7)).toDF("id", "s")
      .select(ImageExprs.audioBandFeatures(
        ImageExprs.wavGain(
          ImageExprs.wavSynthDual(lit(8000), lit(2048), col("s")),
          lit(1), lit(2)),
        lit(8), lit(256)).as("f"))
      .collect()(0).getSeq[Double](0)
    val want = Codec.audioBandFeatures(
      Codec.wavGain(Codec.encodeWavDual(8000, 2048, 7), 1, 2), 8, 256)
    assert(got.toArray.toSeq === want.toSeq)
  }
}
