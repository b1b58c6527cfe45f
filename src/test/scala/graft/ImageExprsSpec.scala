package graft

import graft.functions.ImageExprs
import org.apache.spark.sql.functions._

/** Real JVM-native media decode: PNG pixel exactness against a
  * plain-Scala recompute of the synthesizer's closed form, JPEG decode
  * within lossy tolerance, deterministic nearest-neighbor resize, WAV
  * PCM parse round-trips, null-not-throw on corrupt payloads, and SQL
  * registration parity.
  */
class ImageExprsSpec extends SparkSpec {
  import spark.implicits._

  private def r(x: Int, y: Int, s: Int) = Math.floorMod(7 * x + 3 * y + s, 256)
  private def g(x: Int, y: Int, s: Int) = Math.floorMod(5 * x + 11 * y + 2 * s, 256)
  private def b(x: Int, y: Int, s: Int) = Math.floorMod(13 * x + y + 5 * s, 256)

  test("png synth -> decode round-trips every pixel sum exactly") {
    val rows = Seq((17, 9, 3), (23, 16, 250), (1, 1, 0), (64, 48, 77))
    val got = rows.toDF("w", "h", "s")
      .select(col("w"), col("h"), col("s"),
        ImageExprs.imageStats(
          ImageExprs.pngSynth(col("w"), col("h"), col("s"))).as("st"))
      .select(col("w"), col("h"), col("s"),
        col("st.width"), col("st.height"), col("st.n_px"),
        col("st.sum_r"), col("st.sum_g"), col("st.sum_b"))
      .collect()
    got.foreach { row =>
      val (w, h, s) = (row.getInt(0), row.getInt(1), row.getInt(2))
      val px = for { x <- 0 until w; y <- 0 until h } yield (x, y)
      assert(row.getInt(3) === w && row.getInt(4) === h)
      assert(row.getLong(5) === w.toLong * h)
      assert(row.getLong(6) === px.map { case (x, y) => r(x, y, s).toLong }.sum)
      assert(row.getLong(7) === px.map { case (x, y) => g(x, y, s).toLong }.sum)
      assert(row.getLong(8) === px.map { case (x, y) => b(x, y, s).toLong }.sum)
    }
  }

  test("nearest-neighbor resize == the index arithmetic, pixel-exact") {
    val (w, h, s, dw, dh) = (23, 16, 250, 8, 6)
    val st = Seq((w, h, s)).toDF("w", "h", "s")
      .select(ImageExprs.imageStats(ImageExprs.imageResizeNn(
        ImageExprs.pngSynth(col("w"), col("h"), col("s")),
        lit(dw), lit(dh))).as("st"))
      .select(col("st.*")).collect()(0)
    val px = for { x <- 0 until dw; y <- 0 until dh }
      yield ((x.toLong * w / dw).toInt, (y.toLong * h / dh).toInt)
    assert(st.getInt(0) === dw && st.getInt(1) === dh)
    assert(st.getLong(3) === px.map { case (x, y) => r(x, y, s).toLong }.sum)
    assert(st.getLong(4) === px.map { case (x, y) => g(x, y, s).toLong }.sum)
    assert(st.getLong(5) === px.map { case (x, y) => b(x, y, s).toLong }.sum)
  }

  test("jpeg decodes for real: exact dimensions, lossy-tolerant content") {
    // encode a pattern image as JPEG with the JDK's own writer — decode
    // must see the exact dimensions and channel MEANS within lossy
    // tolerance of the source pattern (JPEG is the one JVM-native
    // format where exact pixel pinning is impossible by design)
    val (w, h, s) = (32, 24, 11)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for { x <- 0 until w; y <- 0 until h }
      img.setRGB(x, y, (r(x, y, s) << 16) | (g(x, y, s) << 8) | b(x, y, s))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val st = Seq(Tuple1(baos.toByteArray)).toDF("payload")
      .select(ImageExprs.imageStats(col("payload")).as("st"))
      .select(col("st.*")).collect()(0)
    assert(st.getInt(0) === w && st.getInt(1) === h)
    val px = for { x <- 0 until w; y <- 0 until h } yield (x, y)
    def meanOf(f: (Int, Int, Int) => Int) =
      px.map { case (x, y) => f(x, y, s).toDouble }.sum / (w * h)
    assert(math.abs(st.getLong(3).toDouble / (w * h) - meanOf(r)) < 16.0)
    assert(math.abs(st.getLong(4).toDouble / (w * h) - meanOf(g)) < 16.0)
    assert(math.abs(st.getLong(5).toDouble / (w * h) - meanOf(b)) < 16.0)
  }

  test("wav synth -> parse round-trips the square wave exactly") {
    val (rate, amp, n) = (16000, 1234, 400) // n % 4 == 0
    val st = Seq((rate, amp, n)).toDF("r", "a", "n")
      .select(ImageExprs.wavStats(
        ImageExprs.wavSynth(col("r"), col("a"), col("n"))).as("st"))
      .select(col("st.*")).collect()(0)
    assert(st.getInt(0) === rate && st.getInt(1) === 1)
    assert(st.getLong(2) === n.toLong)
    assert(st.getInt(3) === amp)
    assert(st.getLong(4) === 0L)
    assert(st.getLong(5) === n.toLong * amp * amp)
  }

  test("stereo wav: frames = samples / channels, fold spans all samples") {
    // hand-built 2-channel PCM wav: 6 frames, L=+100, R=-50
    val n = 12
    val bytes = new Array[Byte](44 + 2 * n)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(8000).putInt(8000 * 4)
      .putShort(4).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(2 * n)
    (0 until n).foreach(i =>
      bb.putShort(if (i % 2 == 0) 100.toShort else (-50).toShort))
    val st = Seq(Tuple1(bytes)).toDF("payload")
      .select(ImageExprs.wavStats(col("payload")).as("st"))
      .select(col("st.*")).collect()(0)
    assert(st.getInt(1) === 2)
    assert(st.getLong(2) === 6L) // frames, not raw samples
    assert(st.getInt(3) === 100)
    assert(st.getLong(4) === 6L * 100 - 6L * 50)
    assert(st.getLong(5) === 6L * 100 * 100 + 6L * 50 * 50)
  }

  test("grid sums == per-pixel recompute with floor-division cells") {
    val (w, h, s, gx, gy) = (23, 16, 77, 4, 3)
    val got = Seq((w, h, s)).toDF("w", "h", "s")
      .select(ImageExprs.imageGridSums(
        ImageExprs.pngSynth(col("w"), col("h"), col("s")),
        lit(gx), lit(gy)).as("cells"))
      .collect()(0).getSeq[Long](0)
    val expect = Array.fill(gx * gy)(0L)
    for { x <- 0 until w; y <- 0 until h }
      expect((y * gy / h) * gx + (x * gx / w)) +=
        (r(x, y, s) + g(x, y, s) + b(x, y, s)).toLong
    assert(got === expect.toSeq)
    // a grid wider than the image is a null (empty cells), not garbage
    assert(Seq((2, 2, 1)).toDF("w", "h", "s")
      .select(ImageExprs.imageGridSums(
        ImageExprs.pngSynth(col("w"), col("h"), col("s")),
        lit(4), lit(3)).as("cells"))
      .filter(col("cells").isNotNull).count() === 0L)
  }

  test("grid features feed the ANN path: duplicate image is the top hit") {
    // corpus: 12 distinct patterns, each present TWICE (ids i and
    // i+100 share (w, h, seed)); cosine over grid features must return
    // the twin as every query's top-1 at sim == 1.0
    val imgs = (0 until 12).flatMap(i => Seq(
        (i.toLong, 16 + i % 5, 12 + i % 4, i * 13),
        (i.toLong + 100, 16 + i % 5, 12 + i % 4, i * 13)))
      .toDF("id", "w", "h", "s")
      .select(col("id"),
        ImageExprs.imageGridFeatures(
          ImageExprs.pngSynth(
            col("w").cast("int"), col("h").cast("int"), col("s").cast("int")),
          lit(4), lit(3)).as("feat"))
      .localCheckpoint(true)
    val hits = graft.operators.Similarity.bruteForceTopK(
        imgs, "id", "feat",
        imgs.filter(col("id") < 100)
          .select(col("id").as("qid2"), col("feat").as("qf")),
        "qid2", "qf", k = 1)
      .collect()
    assert(hits.length === 12)
    hits.foreach { row =>
      val (qid, id) = (row.getAs[Long]("qid"), row.getAs[Long]("id"))
      assert(id === qid + 100, s"query $qid's top hit was $id, not its twin")
      assert(math.abs(row.getAs[Double]("sim") - 1.0) < 1e-12)
    }
  }

  test("avi dib frames decode at real chunk boundaries with stride") {
    val (w, h, nf, s) = (18, 13, 6, 95)
    def fr(x: Int, y: Int, s: Int, f: Int) = Math.floorMod(7*x + 3*y + s + 11*f, 256)
    def fg(x: Int, y: Int, s: Int, f: Int) = Math.floorMod(5*x + 11*y + 2*s + 17*f, 256)
    def fb(x: Int, y: Int, s: Int, f: Int) = Math.floorMod(13*x + y + 5*s + 23*f, 256)
    val rows = Seq((w, h, nf, s)).toDF("w", "h", "nf", "s")
      .select(ImageExprs.aviFrameStats(
        ImageExprs.aviSynthDib(col("w"), col("h"), col("nf"), col("s")),
        lit(2)).as("fs"))
      .select(explode(col("fs")).as("f")).select(col("f.*"))
      .collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 2, 4)) // stride 2 of 6
    rows.foreach { row =>
      val f = row.getInt(0)
      val px = for { x <- 0 until w; y <- 0 until h } yield (x, y)
      assert(row.getLong(1) === px.map { case (x, y) => fr(x, y, s, f).toLong }.sum)
      assert(row.getLong(2) === px.map { case (x, y) => fg(x, y, s, f).toLong }.sum)
      assert(row.getLong(3) === px.map { case (x, y) => fb(x, y, s, f).toLong }.sum)
    }
  }

  test("dib BGR channel order pinned by a hand-laid fixture") {
    // a self-consistent encode/decode pair could swap channels and
    // still agree with itself — this fixture is laid out byte-by-byte
    // per the PUBLIC spec (BGR sample order, 4-byte row padding) and
    // breaks that symmetry with three DISTINCT per-channel totals.
    // (Raster orientation is unobservable through channel sums — both
    // row orders cover the same pixel set — so only the channel
    // mapping needs an external pin.) 1x2 image: pixel A
    // (r=200,g=150,b=100), pixel B (r=10,g=20,b=30).
    val base = graft.functions.ImageExprs.Codec.encodeAviDib(1, 2, 1, 0)
    // frame payload starts right after the '00db' header inside movi;
    // find it and overwrite the 2 rows (rowBytes = 4 for w=1)
    val idx = {
      var i = 0
      var at = -1
      while (at < 0 && i < base.length - 4) {
        if (base(i) == '0' && base(i + 1) == '0' &&
          base(i + 2) == 'd' && base(i + 3) == 'b') at = i + 8
        i += 1
      }
      at
    }
    assert(idx > 0)
    // bottom row first: (b=30, g=20, r=10), then top row (b=100,150,200)
    val fixed = base.clone()
    fixed(idx) = 30; fixed(idx + 1) = 20; fixed(idx + 2) = 10
    fixed(idx + 4) = 100.toByte; fixed(idx + 5) = 150.toByte
    fixed(idx + 6) = 200.toByte
    val row = Seq(Tuple1(fixed)).toDF("payload")
      .select(ImageExprs.aviFrameStats(col("payload"), lit(1)).as("fs"))
      .select(explode(col("fs")).as("f")).select(col("f.*")).collect()(0)
    assert(row.getLong(1) === 210L, "red channel mis-mapped") // 200 + 10
    assert(row.getLong(2) === 170L, "green channel mis-mapped")
    assert(row.getLong(3) === 130L, "blue channel mis-mapped")
  }

  test("avi meta triages the container without reading frames") {
    val meta = Seq((20, 14, 5, 9)).toDF("w", "h", "nf", "s")
      .select(ImageExprs.aviMeta(ImageExprs.aviSynthDib(
        col("w"), col("h"), col("nf"), col("s"))).as("m"))
      .select(col("m.*")).collect()(0)
    assert(meta.getInt(0) === 20 && meta.getInt(1) === 14)
    assert(meta.getInt(2) === 24 && meta.getInt(3) === 0)
    assert(meta.getLong(4) === 5L)
  }

  test("compressed fourcc refuses decode explicitly but still triages") {
    // flip strf's biCompression from BI_RGB (0) to the 'MJPG' fourcc:
    // frame decode must refuse by the FIELD (not by the accident of
    // compressed frames being smaller than a raw raster), while meta
    // still reports the stream — compressed metadata is exactly what
    // triage needs
    val base = graft.functions.ImageExprs.Codec.encodeAviDib(6, 4, 2, 1)
    var at = -1
    var i = 0
    while (at < 0 && i < base.length - 4) {
      if (base(i) == 's' && base(i + 1) == 't' &&
        base(i + 2) == 'r' && base(i + 3) == 'f') at = i + 8
      i += 1
    }
    assert(at > 0)
    val mjpg = base.clone()
    "MJPG".getBytes("US-ASCII").zipWithIndex
      .foreach { case (b, j) => mjpg(at + 16 + j) = b }
    val df = Seq(Tuple1(mjpg)).toDF("payload")
    assert(df.select(ImageExprs.aviFrameStats(col("payload"), lit(1)).as("f"))
      .filter(col("f").isNotNull).count() === 0L)
    val meta = df.select(ImageExprs.aviMeta(col("payload")).as("m"))
      .select(col("m.*")).collect()(0)
    assert(meta.getInt(3) !== 0, "compression fourcc lost")
    assert(meta.getLong(4) === 2L)
  }

  test("corrupt payloads yield null rows, never exceptions") {
    val junk = Seq(
      Tuple1(Array[Byte](1, 2, 3)),
      Tuple1("definitely not media".getBytes("UTF-8")),
      Tuple1(Array.empty[Byte])).toDF("payload")
    assert(junk.select(ImageExprs.imageStats(col("payload")).as("st"))
      .filter(col("st").isNotNull).count() === 0L)
    assert(junk.select(ImageExprs.wavStats(col("payload")).as("st"))
      .filter(col("st").isNotNull).count() === 0L)
    // a TRUNCATED but signature-valid wav header is also a null, not a read
    // past the buffer
    val trunc = graft.functions.ImageExprs.Codec
      .encodeWavSquare(8000, 10, 8).take(30)
    assert(Seq(Tuple1(trunc)).toDF("payload")
      .select(ImageExprs.wavStats(col("payload")).as("st"))
      .filter(col("st").isNotNull).count() === 0L)
  }

  test("hostile headers: dimension bombs and negative lengths are nulls") {
    // PNG whose IHDR claims 60000x60000: dimensions are peeked from the
    // header and refused BEFORE any raster allocation — a null row, not
    // an executor-killing OutOfMemoryError
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    val ihdr = "IHDR".getBytes("US-ASCII") ++ be32(60000) ++ be32(60000) ++
      Array[Byte](8, 2, 0, 0, 0)
    val c = new java.util.zip.CRC32(); c.update(ihdr)
    val bombPng = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte) ++ be32(13) ++ ihdr ++ be32(c.getValue.toInt)
    assert(Seq(Tuple1(bombPng)).toDF("payload")
      .select(ImageExprs.imageStats(col("payload")).as("st"))
      .filter(col("st").isNotNull).count() === 0L)
    // AVI whose BITMAPINFOHEADER claims h=1,000,000: without the cap,
    // rowBytes*h wraps Int-negative, the truncation guard passes, and
    // the frame loop indexes out of bounds
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val strfBody = le32(40) ++ le32(1000) ++ le32(1000000) ++
      Array[Byte](1, 0, 24, 0) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0) ++ le32(0)
    val strf = "strf".getBytes("US-ASCII") ++ le32(strfBody.length) ++ strfBody
    val fr = "00db".getBytes("US-ASCII") ++ le32(8) ++ Array.fill[Byte](8)(1)
    val movi = "LIST".getBytes("US-ASCII") ++ le32(4 + fr.length) ++
      "movi".getBytes("US-ASCII") ++ fr
    val pay = "AVI ".getBytes("US-ASCII") ++ strf ++ movi
    val bombAvi = "RIFF".getBytes("US-ASCII") ++ le32(pay.length) ++ pay
    assert(Seq(Tuple1(bombAvi)).toDF("payload")
      .select(ImageExprs.aviFrameStats(col("payload"), lit(1)).as("st"))
      .filter(col("st").isNotNull).count() === 0L)
    // WAV with a corrupt negative declared data length: null, never a
    // row with negative n_samples
    val negWav = graft.functions.ImageExprs.Codec.encodeWavSquare(8000, 10, 8)
    negWav(40) = 0; negWav(41) = 0; negWav(42) = 0; negWav(43) = 0x80.toByte
    assert(Seq(Tuple1(negWav)).toDF("payload")
      .select(ImageExprs.wavStats(col("payload")).as("st"))
      .filter(col("st").isNotNull).count() === 0L)
    // resize target dims are caller ARGUMENTS: loud require, not an
    // unbounded allocation or a bare BufferedImage crash
    val png = graft.functions.ImageExprs.Codec.encodePng(4, 4, 1)
    intercept[IllegalArgumentException] {
      graft.functions.ImageExprs.Codec.resizeNn(png, 0, 5)
    }
    intercept[IllegalArgumentException] {
      graft.functions.ImageExprs.Codec.resizeNn(png, 5000, 5000)
    }
  }

  test("SQL registration parity: image_stats / wav_stats") {
    graft.GraftExtensions.register(spark)
    Seq((20, 10, 5)).toDF("w", "h", "s")
      .select(ImageExprs.pngSynth(col("w"), col("h"), col("s")).as("p"))
      .createOrReplaceTempView("imgs_sql_parity")
    val viaSql = spark.sql(
      "SELECT image_stats(p).sum_r AS sr FROM imgs_sql_parity")
      .collect()(0).getLong(0)
    val viaCol = spark.table("imgs_sql_parity")
      .select(ImageExprs.imageStats(col("p")).getField("sum_r"))
      .collect()(0).getLong(0)
    assert(viaSql === viaCol)
    Seq((8000, 7, 16)).toDF("r", "a", "n")
      .select(ImageExprs.wavSynth(col("r"), col("a"), col("n")).as("p"))
      .createOrReplaceTempView("wavs_sql_parity")
    assert(spark.sql(
      "SELECT wav_stats(p).sum_sq AS q FROM wavs_sql_parity")
      .collect()(0).getLong(0) === 16L * 49)
  }
}
