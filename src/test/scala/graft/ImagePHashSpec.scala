package graft

import graft.functions.ImageExprs
import graft.functions.ImageExprs.Codec
import org.apache.spark.sql.functions._

/** Perceptual image hashing (public-domain pHash/dHash constructions)
  * over the real decode layer: DCT sanity against hand-derivable
  * fixtures, robustness margins (re-leveled and integer-upscaled twins
  * stay within a small Hamming radius while distinct low-frequency
  * fixtures stay far), exact invariances where the arithmetic gives
  * them (dHash under a strictly-monotone map, pHash under integer-ratio
  * NN upscale), composition with the chunk-blocked Hamming pair search,
  * null-not-throw, and SQL registration parity.
  */
class ImagePHashSpec extends SparkSpec {
  import spark.implicits._

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("constant image: every AC coefficient is zero, hash is zero") {
    // a flat raster has no AC energy: all 63 coefficients equal the
    // median (0), no strict winner, hash exactly 0 — hand-derivable
    val flat = Codec.linearMap(Codec.encodePngWave(48, 48, 3), 0, 1, 128)
    assert(Codec.phash64(flat) === 0L)
    // and dHash likewise: no gradient anywhere
    assert(Codec.dhash64(flat) === 0L)
  }

  test("robustness margins: twins hash near, distinct waves hash far") {
    val seeds = 0 until 25
    val bases = seeds.map(s => Codec.encodePngWave(48, 48, s))
    val relev = bases.map(b => Codec.linearMap(b, 3, 4, 20))
    val up2x = bases.map(b => Codec.resizeNn(b, 96, 96))
    val hB = bases.map(b => Codec.phash64(b).longValue())
    val hR = relev.map(b => Codec.phash64(b).longValue())
    val hU = up2x.map(b => Codec.phash64(b).longValue())
    seeds.foreach { s =>
      assert(ham(hB(s), hR(s)) <= 8,
        s"re-leveled twin drifted ${ham(hB(s), hR(s))} bits at seed $s")
      // integer-ratio NN upscale resamples the SAME source pixels:
      // pHash is exactly invariant, not merely close
      assert(hU(s) === hB(s), s"2x upscale moved the pHash at seed $s")
    }
    // distinct low-frequency structure stays far — the margin that
    // makes a radius-8 pair search precise, not just recall-complete
    for (a <- seeds; b <- seeds if a < b) {
      Seq(hB, hR, hU).foreach { l =>
        assert(ham(l(a), hB(b)) >= 12,
          s"cross-seed collision: $a vs $b at ${ham(l(a), hB(b))} bits")
      }
    }
    // dHash: the 3/4+20 map preserves every strict gray inequality on
    // these fixtures — EXACT invariance, and upscale likewise
    val dB = bases.map(b => Codec.dhash64(b).longValue())
    seeds.foreach { s =>
      assert(Codec.dhash64(relev(s)).longValue() === dB(s))
      assert(Codec.dhash64(up2x(s)).longValue() === dB(s))
    }
    for (a <- seeds; b <- seeds if a < b)
      assert(ham(dB(a), dB(b)) >= 10,
        s"dhash cross-seed collision: $a vs $b")
  }

  test("affine re-level moves only DC: pHash bits ride the AC spectrum") {
    // pure offset within gray headroom: +32 on a half-range image keeps
    // every channel unclamped, so gray shifts by ~a constant and the AC
    // block (DC excluded by construction) is nearly untouched
    val half = Codec.linearMap(Codec.encodePngWave(48, 48, 7), 1, 2, 0)
    val lifted = Codec.linearMap(half, 1, 1, 32)
    assert(ham(Codec.phash64(half).longValue(),
      Codec.phash64(lifted).longValue()) <= 2)
  }

  test("hammingNearDuplicates over image pHash finds exactly the planted pairs") {
    val rows = (0 until 8).flatMap { s =>
      val base = Codec.encodePngWave(48, 48, s)
      Seq((s * 10L, base), (s * 10L + 1L, Codec.linearMap(base, 3, 4, 20)),
        (s * 10L + 2L, Codec.resizeNn(base, 96, 96)))
    }
    val df = rows.toDF("img_id", "img")
      .select(col("img_id"), ImageExprs.imagePHash(col("img")).as("fp"))
    val pairs = graft.operators.Dedup
      .hammingNearDuplicates(df, "img_id", "fp", maxHamming = 8)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 8).flatMap { s =>
      val g = s * 10L
      Seq((g, g + 1), (g, g + 2), (g + 1, g + 2))
    }.toSet
    assert(pairs === expected)
  }

  test("corrupt payloads hash to null, never throw") {
    val junk: Array[Byte] = Array(1, 2, 3, 4, 5)
    assert(Seq(Tuple1(junk)).toDF("img")
      .select(ImageExprs.imagePHash(col("img")).as("h"),
        ImageExprs.imageDHash(col("img")).as("d"))
      .filter(col("h").isNotNull || col("d").isNotNull).count() === 0L)
  }

  test("SQL registration parity: image_phash / image_dhash") {
    graft.GraftExtensions.register(spark)
    Seq(Tuple1(Codec.encodePngWave(32, 32, 5))).toDF("img")
      .createOrReplaceTempView("phash_sql_parity")
    val viaSql = spark.sql(
      "SELECT image_phash(img) AS p, image_dhash(img) AS d " +
        "FROM phash_sql_parity").collect()(0)
    val viaCol = spark.table("phash_sql_parity")
      .select(ImageExprs.imagePHash(col("img")),
        ImageExprs.imageDHash(col("img"))).collect()(0)
    assert(viaSql.getLong(0) === viaCol.getLong(0))
    assert(viaSql.getLong(1) === viaCol.getLong(1))
  }
}
