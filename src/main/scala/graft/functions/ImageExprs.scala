package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** REAL media decode for the formats the JVM itself speaks — the
  * round-16 closure of the multimodal decode seam for everything that
  * does NOT need an external codec library: PNG/JPEG/GIF/BMP pixels via
  * `javax.imageio.ImageIO` (part of every JDK since 1.4), and WAV PCM
  * samples via a plain RIFF parse (no library at all). Compressed
  * audio/video (mp3/h264/...) remain the documented environment-blocked
  * seam — those genuinely need codec libraries this container lacks.
  *
  * All heavy work happens in a static codec object called from
  * codegen'd expressions (the [[BpeExprs.BpeEncodeApply]] pattern: one
  * plan node, doGenCode emits a call on the bound reference object, no
  * UDF, no shuffle) — decode is a pure per-row map that runs inline in
  * an ingest pass. Stats expressions return EXACT INTEGER sums
  * (sum_r/sum_g/sum_b, sum/sum_sq) rather than float means, so gate
  * oracles pin them with integer arithmetic and zero float-comparison
  * risk; callers derive means when they want them.
  *
  * Decode determinism: PNG is lossless, so pixel values round-trip
  * exactly and the q190 oracle recomputes them analytically from the
  * synthesizer's closed-form pattern. JPEG decode is deterministic
  * within one JVM but implementation-defined across decoders — specs
  * pin JPEG round-trips with tolerance, gates pin PNG exactly.
  * Synthesized PNG BYTES are never pinned either (the compressor may
  * change across JDKs); only decoded content is.
  */
object ImageExprs {

  /** Static codec: every expression below delegates here. Pure JDK. */
  object Codec {
    /** Deterministic full PNG: pixel (x, y) of a (w x h) RGB image is
      * r=(7x+3y+s)%256, g=(5x+11y+2s)%256, b=(13x+y+5s)%256 — a
      * closed-form pattern an oracle can re-derive per pixel in SQL.
      */
    def encodePng(w: Int, h: Int, seed: Int): Array[Byte] = {
      require(w >= 1 && h >= 1 && w <= 4096 && h <= 4096,
        s"png_synth: dimensions out of range ($w x $h)")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = java.lang.Math.floorMod(7 * x + 3 * y + seed, 256)
          val g = java.lang.Math.floorMod(5 * x + 11 * y + 2 * seed, 256)
          val b = java.lang.Math.floorMod(13 * x + y + 5 * seed, 256)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Decode any ImageIO-supported payload (PNG/JPEG/GIF/BMP) and
      * return (width, height, n_px, sum_r, sum_g, sum_b) — null for
      * payloads no reader accepts (the undecodable-row contract: a
      * null row, never an exception, so a corrupt blob in a 100 TB
      * scan is a filterable fact, not a job kill).
      */
    def stats(bytes: Array[Byte]): InternalRow = {
      val img = decode(bytes)
      if (img == null) return null
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      new GenericInternalRow(
        Array[Any](w, h, w.toLong * h, sr, sg, sb))
    }

    /** Nearest-neighbor resize, re-encoded as PNG. Manual raster
      * resample (src index = dst index * src / dst, floor) — bitwise
      * deterministic on every JVM, unlike Graphics2D interpolation.
      * Null for undecodable payloads.
      */
    def resizeNn(bytes: Array[Byte], dw: Int, dh: Int): Array[Byte] = {
      // target dims are CALLER arguments, not payload data — a bad value
      // is a caller bug and fails loudly (the encodePng guard), never an
      // unbounded allocation or a bare BufferedImage IllegalArgument
      require(dw >= 1 && dh >= 1 && dw <= 4096 && dh <= 4096,
        s"image_resize_nn: target dimensions out of range ($dw x $dh)")
      val img = decode(bytes)
      if (img == null) return null
      val (sw, sh) = (img.getWidth, img.getHeight)
      val out = new java.awt.image.BufferedImage(
        dw, dh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < dh) {
        val sy = (y.toLong * sh / dh).toInt
        var x = 0
        while (x < dw) {
          out.setRGB(x, y, img.getRGB((x.toLong * sw / dw).toInt, sy))
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.toByteArray
    }

    /** Per-cell brightness sums over a (gx x gy) grid — the tiny
      * visual descriptor that feeds the ANN path (cosine over grid
      * vectors finds images with similar spatial light distribution —
      * the classic pre-embedding baseline). EXACT integers: cell of
      * pixel (x, y) = (y*gy/h)*gx + (x*gx/w) (floor division — the
      * same closed form the oracle runs), value = sum of r+g+b over
      * the cell's pixels. Null for undecodable payloads.
      */
    def gridSums(bytes: Array[Byte], gx: Int, gy: Int): Array[Long] = {
      val img = decode(bytes)
      if (img == null) return null
      if (img.getWidth < gx || img.getHeight < gy) return null // empty cells
      gridSumsOf(img, gx, gy)
    }

    /** [[gridSums]] normalized per cell by its EXACT pixel count (the
      * same floor-division arithmetic assigns pixels and sizes cells,
      * so the counts are derived, not re-scanned). Null like gridSums.
      */
    def gridMeans(bytes: Array[Byte], gx: Int, gy: Int): Array[Double] = {
      val img = decode(bytes)
      if (img == null) return null
      val (w, h) = (img.getWidth, img.getHeight)
      if (w < gx || h < gy) return null
      val sums = gridSumsOf(img, gx, gy)
      def span(c: Int, g: Int, n: Int): Long =
        (c + 1).toLong * n / g - c.toLong * n / g
      Array.tabulate(gx * gy) { i =>
        val (cx, cy) = (i % gx, i / gx)
        sums(i).toDouble / (span(cx, gx, w) * span(cy, gy, h)).toDouble
      }
    }

    private def gridSumsOf(
        img: java.awt.image.BufferedImage, gx: Int, gy: Int): Array[Long] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Long](gx * gy)
      var y = 0
      while (y < h) {
        val cy = (y.toLong * gy / h).toInt
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          out((cy * gx) + (x.toLong * gx / w).toInt) +=
            ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          x += 1
        }
        y += 1
      }
      out
    }

    /** Max decoded dimension (the [[encodePng]] bound): a crafted
      * header claiming e.g. 60000x60000 would allocate a multi-GB
      * raster and die with OutOfMemoryError — an Error, not an
      * Exception, so it would kill the executor instead of yielding
      * the contract's filterable null row. Dimensions are peeked from
      * the header BEFORE any raster is allocated.
      */
    val MaxDecodeDim = 4096

    private def decode(bytes: Array[Byte]): java.awt.image.BufferedImage =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) null
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              val (w, h) = (r.getWidth(0), r.getHeight(0))
              if (w < 1 || h < 1 || w > MaxDecodeDim || h > MaxDecodeDim) null
              else r.read(0)
            } finally r.dispose()
          }
        } finally if (iis != null) iis.close()
      } catch { case _: Exception => null }

    /** NN-resampled integer luminance raster (ITU-R BT.601 weights,
      * integer arithmetic: (299r + 587g + 114b) / 1000) — the shared
      * grayscale front end of the perceptual hashes. Same floor-division
      * index arithmetic as [[resizeNn]]: bitwise deterministic.
      */
    private def grayResize(
        img: java.awt.image.BufferedImage, dw: Int, dh: Int): Array[Int] = {
      val (sw, sh) = (img.getWidth, img.getHeight)
      val out = new Array[Int](dw * dh)
      var y = 0
      while (y < dh) {
        val sy = (y.toLong * sh / dh).toInt
        var x = 0
        while (x < dw) {
          val p = img.getRGB((x.toLong * sw / dw).toInt, sy)
          out(y * dw + x) =
            (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
              114 * (p & 0xff)) / 1000
          x += 1
        }
        y += 1
      }
      out
    }

    private val DctN = 32
    /** DCT-II basis, StrictMath for cross-JVM bit determinism. */
    private lazy val dctCos: Array[Array[Double]] =
      Array.tabulate(8, DctN)((u, x) =>
        StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2.0 * DctN)))

    /** DCT perceptual hash (the public-domain pHash construction):
      * grayscale NN-resample to 32x32, 2D DCT-II, keep the low-frequency
      * 8x8 block MINUS the DC term, one bit per coefficient vs their
      * median — 63 bits in a Long (top bit clear). Excluding DC (and
      * thresholding on the median) makes the hash invariant under
      * affine brightness/contrast maps of the grayscale (DC absorbs the
      * offset, the median absorbs the scale) — exactly so in exact
      * arithmetic; the integer quantization of a real re-leveling
      * perturbs coefficients by ~1 gray level, flipping at most a few
      * near-median bits (spec-pinned margins). These are the
      * recompressed/re-leveled near-dups the exact-pixel grid
      * descriptor misses. Null for undecodable payloads.
      */
    def phash64(bytes: Array[Byte]): java.lang.Long = {
      val img = decode(bytes)
      if (img == null) return null
      val g = grayResize(img, DctN, DctN)
      // separable DCT, low 8 frequencies only: rows first (32x8), then
      // columns (8x8)
      val rows = Array.ofDim[Double](DctN, 8)
      var y = 0
      while (y < DctN) {
        var v = 0
        while (v < 8) {
          var s = 0.0
          var x = 0
          while (x < DctN) { s += g(y * DctN + x) * dctCos(v)(x); x += 1 }
          rows(y)(v) = s
          v += 1
        }
        y += 1
      }
      val ac = new Array[Double](63)
      var i = 0
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          if (u != 0 || v != 0) {
            var s = 0.0
            var yy = 0
            while (yy < DctN) { s += rows(yy)(v) * dctCos(u)(yy); yy += 1 }
            // snap float residue: a structureless (constant) raster's
            // AC terms are cancellation noise ~1e-13 against real
            // coefficients of magnitude >= O(1) — without the snap the
            // median thresholds pure noise and a flat image hashes
            // arbitrarily instead of to 0
            ac(i) = if (StrictMath.abs(s) < 1e-6) 0.0 else s
            i += 1
          }
          v += 1
        }
        u += 1
      }
      val med = ac.sorted.apply(31) // median of 63
      var h = 0L
      i = 0
      while (i < 63) { if (ac(i) > med) h |= (1L << i); i += 1 }
      h
    }

    /** Gradient perceptual hash (the public dHash construction):
      * grayscale 9x8, bit (x, y) = gray(x+1, y) > gray(x, y) — 64 bits
      * of integer comparisons, exactly invariant under any strictly
      * monotone per-pixel intensity map. Null for undecodable payloads.
      */
    def dhash64(bytes: Array[Byte]): java.lang.Long = {
      val img = decode(bytes)
      if (img == null) return null
      val g = grayResize(img, 9, 8)
      var h = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (g(y * 9 + x + 1) > g(y * 9 + x)) h |= (1L << (y * 8 + x))
          x += 1
        }
        y += 1
      }
      h
    }

    /** Per-channel affine intensity map v -> clamp(v*num/den + off),
      * re-encoded losslessly as PNG — the deterministic
      * brightness/contrast twin generator for the perceptual-hash
      * gates (a JPEG re-encode tests the same robustness class but its
      * pixel damage is decoder-defined; this one is closed-form).
      * Null for undecodable payloads.
      */
    def linearMap(
        bytes: Array[Byte], num: Int, den: Int, off: Int): Array[Byte] = {
      require(num >= 0 && num <= 16 && den >= 1 && den <= 16 &&
        off >= -255 && off <= 255,
        s"image_linear_map: out of range (num=$num den=$den off=$off)")
      val img = decode(bytes)
      if (img == null) return null
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      def m(v: Int): Int = math.min(255, math.max(0, (v * num) / den + off))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          out.setRGB(x, y, (m((p >> 16) & 0xff) << 16) |
            (m((p >> 8) & 0xff) << 8) | m(p & 0xff))
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.toByteArray
    }

    /** Deterministic PNG with SEED-DEPENDENT LOW-FREQUENCY structure:
      * a diagonal sawtooth v = ((x*kx + y*ky + phase) % 97) * 255 / 96
      * whose direction/frequency (kx, ky in 1..5) and phase derive from
      * the seed, channels offset by thirds of the period. Unlike
      * [[encodePng]]'s per-pixel scramble (whose energy is all high
      * frequency, so every seed pHashes alike), distinct seeds here get
      * distinct low-frequency spectra — the fixture family for
      * perceptual-hash distinctness.
      */
    def encodePngWave(w: Int, h: Int, seed: Int): Array[Byte] = {
      require(w >= 1 && h >= 1 && w <= 4096 && h <= 4096,
        s"png_synth_wave: dimensions out of range ($w x $h)")
      val s = java.lang.Math.floorMod(seed, 1 << 20)
      val kx = 1 + s % 5
      val ky = 1 + (s / 5) % 5
      val phase = s % 97
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def v(p: Int): Int =
            (java.lang.Math.floorMod(x * kx + y * ky + phase + p, 97) * 255) / 96
          img.setRGB(x, y, (v(0) << 16) | (v(32) << 8) | v(64))
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Deterministic full AVI: an uncompressed-DIB video (the RIFF
      * container + 24-bit bottom-up BGR frames per the public
      * BITMAPINFOHEADER layout — the one video codec that needs no
      * codec at all). Frame f's pixel (x, y) extends the PNG pattern
      * with a per-frame term: r=(7x+3y+s+11f)%256, g=(5x+11y+2s+17f)%256,
      * b=(13x+y+5s+23f)%256 — closed-form for the oracle. Carries a
      * minimal-but-honest hdrl (avih + strl/strh/strf) ahead of movi.
      */
    def encodeAviDib(w: Int, h: Int, nFrames: Int, seed: Int): Array[Byte] = {
      require(w >= 1 && h >= 1 && w <= 1024 && h <= 1024 &&
        nFrames >= 1 && nFrames <= 256,
        s"avi_synth: out of range ($w x $h x $nFrames)")
      val rowBytes = (w * 3 + 3) & ~3 // DIB rows pad to 4 bytes
      val frameBytes = rowBytes * h
      def frame(f: Int): Array[Byte] = {
        val d = new Array[Byte](frameBytes)
        var y = 0
        while (y < h) {
          val base = (h - 1 - y) * rowBytes // bottom-up raster
          var x = 0
          while (x < w) {
            d(base + 3 * x) =
              java.lang.Math.floorMod(13 * x + y + 5 * seed + 23 * f, 256).toByte
            d(base + 3 * x + 1) =
              java.lang.Math.floorMod(5 * x + 11 * y + 2 * seed + 17 * f, 256).toByte
            d(base + 3 * x + 2) =
              java.lang.Math.floorMod(7 * x + 3 * y + seed + 11 * f, 256).toByte
            x += 1
          }
          y += 1
        }
        d
      }
      val out = new java.io.ByteArrayOutputStream()
      def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")
      def le32(v: Int): Array[Byte] = Array(
        v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val b = new java.io.ByteArrayOutputStream()
        b.write(ascii(id)); b.write(le32(body.length)); b.write(body)
        if (body.length % 2 == 1) b.write(0) // RIFF chunks pad to even
        b.toByteArray
      }
      def list(kind: String, body: Array[Byte]): Array[Byte] = {
        val b = new java.io.ByteArrayOutputStream()
        b.write(ascii("LIST")); b.write(le32(body.length + 4))
        b.write(ascii(kind)); b.write(body)
        b.toByteArray
      }
      // avih: us/frame, maxbytes, pad, flags, totalframes, init, streams,
      // bufsize, w, h, 4 reserved — 56 bytes of LE uint32
      val avih = chunk("avih", Array(40000, frameBytes, 0, 0, nFrames,
        0, 1, frameBytes, w, h, 0, 0, 0, 0).flatMap(le32))
      // strh: fccType 'vids', handler 'DIB ', then 44 bytes of fields
      val strhBody = new java.io.ByteArrayOutputStream()
      strhBody.write(ascii("vids")); strhBody.write(ascii("DIB "))
      Seq(0, 0, 0, 1, 25, 0, nFrames, frameBytes, -1, 0)
        .foreach(v => strhBody.write(le32(v)))
      strhBody.write(Array[Byte](0, 0, 0, 0, 0, 0, 0, 0)) // rcFrame
      // strf: BITMAPINFOHEADER (40 bytes)
      val strf = chunk("strf", le32(40) ++ le32(w) ++ le32(h) ++
        Array[Byte](1, 0, 24, 0) ++ le32(0) ++ le32(frameBytes) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
      val hdrl = list("hdrl",
        avih ++ list("strl", chunk("strh", strhBody.toByteArray) ++ strf))
      val movi = list("movi",
        (0 until nFrames).map(f => chunk("00db", frame(f)))
          .reduce(_ ++ _))
      val payload = ascii("AVI ") ++ hdrl ++ movi
      out.write(ascii("RIFF")); out.write(le32(payload.length))
      out.write(payload)
      out.toByteArray
    }

    /** Decode every `stride`-th uncompressed-DIB frame of an AVI (the
      * REAL frame-boundary walk: RIFF chunks to the movi list, '00db'
      * chunks within) into (frame_idx, sum_r, sum_g, sum_b) rows.
      * Bottom-up BGR per the public DIB spec (orientation and channel
      * order spec-pinned against a hand-laid fixture). Null for
      * payloads that are not RIFF/AVI with a 24-bit DIB video stream —
      * compressed video stays the documented codec-blocked seam.
      */
    def aviFrameStats(bytes: Array[Byte], stride: Int): Array[InternalRow] = {
      if (bytes == null || bytes.length < 12 || stride < 1) return null
      def ascii(pos: Int, n: Int): String =
        if (pos + n > bytes.length) ""
        else new String(bytes, pos, n, "US-ASCII")
      def le32(pos: Int): Int =
        if (pos + 4 > bytes.length) -1
        else (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
          ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
      if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "AVI ") return null
      // find strf's BITMAPINFOHEADER for dimensions/bpp/compression,
      // then movi
      var (w, h, bpp) = (-1, -1, -1)
      var compression = -1
      var moviStart = -1
      var moviEnd = -1
      def walk(pos0: Int, end: Int): Unit = {
        var pos = pos0
        while (pos + 8 <= end) {
          val id = ascii(pos, 4); val len = le32(pos + 4)
          if (len < 0 || pos + 8 + len > end) return
          if (id == "LIST") {
            val kind = ascii(pos + 8, 4)
            if (kind == "movi") { moviStart = pos + 12; moviEnd = pos + 8 + len }
            else walk(pos + 12, pos + 8 + len)
          } else if (id == "strf" && len >= 40) {
            w = le32(pos + 8 + 4); h = le32(pos + 8 + 8)
            bpp = (bytes(pos + 8 + 14) & 0xff) | ((bytes(pos + 8 + 15) & 0xff) << 8)
            compression = le32(pos + 8 + 16)
          }
          pos += 8 + len + (len % 2) // even padding
        }
      }
      walk(12, bytes.length)
      // biCompression must be BI_RGB (0): a compressed stream (MJPG,
      // h264 fourcc, ...) must refuse EXPLICITLY, not by the accident
      // of its frames being smaller than a raw raster
      // w/h come from the UNTRUSTED BITMAPINFOHEADER: cap them (the
      // encodeAviDib bound) so neither rowBytes*h nor the per-frame
      // index arithmetic can overflow Int — an uncapped w=1000,
      // h=1000000 header makes rowBytes*h wrap negative, the truncation
      // guard below passes, and the frame loop indexes out of bounds
      if (w <= 0 || h <= 0 || w > 16384 || h > 16384 || bpp != 24 ||
        compression != 0 || moviStart < 0) return null
      val rowBytes = (w * 3 + 3) & ~3
      val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      var (pos, idx) = (moviStart, 0)
      while (pos + 8 <= moviEnd) {
        val id = ascii(pos, 4); val len = le32(pos + 4)
        if (len < 0 || pos + 8 + len > moviEnd) return null // torn container
        if (id == "00db" || id == "00dc") {
          if (idx % stride == 0) {
            // Long compare: with capped w/h this cannot overflow, but
            // the Long form keeps the guard sound on its own terms
            if (len.toLong < rowBytes.toLong * h) return null // truncated
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              val base = pos + 8 + (h - 1 - y) * rowBytes
              var x = 0
              while (x < w) {
                sb += bytes(base + 3 * x) & 0xff
                sg += bytes(base + 3 * x + 1) & 0xff
                sr += bytes(base + 3 * x + 2) & 0xff
                x += 1
              }
              y += 1
            }
            rows += new GenericInternalRow(Array[Any](idx, sr, sg, sb))
          }
          idx += 1
        }
        pos += 8 + len + (len % 2)
      }
      if (rows.isEmpty) null else rows.toArray
    }

    /** Container metadata WITHOUT touching pixel data — the video twin
      * of [[graft.operators.Multimodal.pngDimensions]]: dimensions, bit
      * depth, compression fourcc (0 = BI_RGB uncompressed), and the
      * frame count from a chunk-header-only walk of the movi list
      * (O(frames) header reads, zero frame bytes). The
      * resolution/length filter a 100 TB video pipeline runs BEFORE
      * deciding what to decode. Null for non-RIFF/AVI payloads; unlike
      * [[aviFrameStats]] it reports compressed streams rather than
      * refusing them (their metadata is exactly what triage needs).
      */
    def aviMeta(bytes: Array[Byte]): InternalRow = {
      if (bytes == null || bytes.length < 12) return null
      def ascii(pos: Int, n: Int): String =
        if (pos + n > bytes.length) ""
        else new String(bytes, pos, n, "US-ASCII")
      def le32(pos: Int): Int =
        if (pos + 4 > bytes.length) -1
        else (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
          ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
      if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "AVI ") return null
      var (w, h, bpp, compression) = (-1, -1, -1, -1)
      var nFrames = 0L
      def walk(pos0: Int, end: Int): Unit = {
        var pos = pos0
        while (pos + 8 <= end) {
          val id = ascii(pos, 4); val len = le32(pos + 4)
          if (len < 0 || pos + 8 + len > end) return
          if (id == "LIST") {
            val kind = ascii(pos + 8, 4)
            if (kind == "movi") {
              var p = pos + 12
              val e = pos + 8 + len
              while (p + 8 <= e) {
                val cid = ascii(p, 4); val clen = le32(p + 4)
                if (clen < 0 || p + 8 + clen > e) return
                if (cid.endsWith("db") || cid.endsWith("dc")) nFrames += 1
                p += 8 + clen + (clen % 2)
              }
            } else walk(pos + 12, pos + 8 + len)
          } else if (id == "strf" && len >= 40) {
            w = le32(pos + 8 + 4); h = le32(pos + 8 + 8)
            bpp = (bytes(pos + 8 + 14) & 0xff) |
              ((bytes(pos + 8 + 15) & 0xff) << 8)
            compression = le32(pos + 8 + 16)
          }
          pos += 8 + len + (len % 2)
        }
      }
      walk(12, bytes.length)
      if (w <= 0 || h <= 0) return null
      new GenericInternalRow(Array[Any](w, h, bpp, compression, nFrames))
    }

    /** Deterministic full WAV: mono 16-bit PCM square wave of period 4
      * (2 samples at +amp, 2 at -amp) — sum, sum-of-squares, and peak
      * are closed-form integers for the oracle whenever n % 4 == 0.
      */
    def encodeWavSquare(rate: Int, amp: Int, n: Int): Array[Byte] = {
      require(rate >= 1 && amp >= 0 && amp <= 32767 && n >= 0 &&
        n <= (1 << 24), s"wav_synth: out of range (rate=$rate amp=$amp n=$n)")
      val data = new Array[Byte](44 + 2 * n)
      val bb = java.nio.ByteBuffer.wrap(data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(2 * n)
      var i = 0
      while (i < n) {
        bb.putShort(if (i % 4 < 2) amp.toShort else (-amp).toShort)
        i += 1
      }
      data
    }

    /** Deterministic dual-square-wave WAV: the sum of two square waves
      * with SEED-DEPENDENT half-periods (p1 = 12 + s%32, p2 = 50 +
      * 2*(s%32); the sign flips every p samples, so the full period is
      * 2p) at even amplitudes 8192 + 4096 — distinct seeds get distinct
      * spectra (the audio twin of [[encodePngWave]]'s seed-distinct
      * structure), and the even samples make a half-gain re-encode
      * EXACT integer halving, so its band-energy features scale by a
      * power of two and cosine-match the original to the ulp.
      */
    def encodeWavDual(rate: Int, n: Int, seed: Int): Array[Byte] = {
      require(rate >= 1 && n >= 0 && n <= (1 << 24),
        s"wav_synth_dual: out of range (rate=$rate n=$n)")
      val s = java.lang.Math.floorMod(seed, 32)
      val (p1, p2) = (12 + s, 50 + 2 * s)
      val data = new Array[Byte](44 + 2 * n)
      val bb = java.nio.ByteBuffer.wrap(data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(2 * n)
      var i = 0
      while (i < n) {
        val a = if ((i / p1) % 2 == 0) 8192 else -8192
        val b = if ((i / p2) % 2 == 0) 4096 else -4096
        bb.putShort((a + b).toShort)
        i += 1
      }
      data
    }

    /** Gain re-encode: every sample scaled (s*num)/den, clamped to
      * int16 — the volume-changed "same recording" twin generator.
      * Null for undecodable payloads.
      */
    def wavGain(bytes: Array[Byte], num: Int, den: Int): Array[Byte] = {
      require(num >= 0 && num <= 16 && den >= 1 && den <= 16,
        s"wav_gain: out of range (num=$num den=$den)")
      val st = wavStats(bytes)
      if (st == null) return null
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = bytes.clone()
      val ob = java.nio.ByteBuffer.wrap(out)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val declared = bb.getInt(40)
      val dataLen = math.min(declared.toLong, (bytes.length - 44).toLong).toInt
      val n = dataLen / 2
      var i = 0
      while (i < n) {
        val v = (bb.getShort(44 + 2 * i).toInt * num) / den
        ob.putShort(44 + 2 * i,
          math.min(32767, math.max(-32768, v)).toShort)
        i += 1
      }
      out
    }

    /** Band-energy audio fingerprint: DFT bin energies |X_k|^2 for
      * k = 1..nBands over fixed `win`-sample windows of the (first-
      * channel) PCM stream, summed across windows — the classic
      * spectral descriptor (the simple public band-energy form of an
      * audio fingerprint; a Shazam-style peak constellation refines the
      * same spectra). StrictMath trig via a precomputed (k, i mod win)
      * table: bitwise deterministic. Energies are QUADRATIC in
      * amplitude, so a pure gain change scales the whole vector
      * uniformly — cosine-invariant, which is what feeds the ANN
      * estate. Null for undecodable payloads or fewer samples than one
      * window.
      */
    def audioBandFeatures(
        bytes: Array[Byte], nBands: Int, win: Int): Array[Double] = {
      require(nBands >= 1 && nBands <= 64 && win >= 8 && win <= 8192,
        s"audio_band_features: out of range (nBands=$nBands win=$win)")
      val st = wavStats(bytes)
      if (st == null) return null
      val channels = st.getInt(1)
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val declared = bb.getInt(40)
      val dataLen = math.min(declared.toLong, (bytes.length - 44).toLong).toInt
      val frames = dataLen / 2 / channels
      if (frames < win) return null
      val cosT = trigTable(nBands, win, sin = false)
      val sinT = trigTable(nBands, win, sin = true)
      val out = new Array[Double](nBands)
      val nWin = frames / win
      var w = 0
      while (w < nWin) {
        var k = 0
        while (k < nBands) {
          var (c, s) = (0.0, 0.0)
          var i = 0
          while (i < win) {
            // channel 0 of frame (w*win + i)
            val v = bb.getShort(44 + 2 * channels * (w * win + i)).toDouble
            c += v * cosT(k)(i)
            s += v * sinT(k)(i)
            i += 1
          }
          out(k) += c * c + s * s
          k += 1
        }
        w += 1
      }
      out
    }

    private val trigCache =
      new java.util.concurrent.ConcurrentHashMap[(Int, Int, Boolean),
        Array[Array[Double]]]()
    private def trigTable(
        nBands: Int, win: Int, sin: Boolean): Array[Array[Double]] =
      trigCache.computeIfAbsent((nBands, win, sin), _ =>
        Array.tabulate(nBands, win) { (k, i) =>
          val ang = 2.0 * StrictMath.PI * (k + 1) * i / win
          if (sin) StrictMath.sin(ang) else StrictMath.cos(ang)
        })

    /** Parse canonical mono/stereo 16-bit PCM WAV (44-byte header,
      * "fmt " first — the [[graft.operators.Multimodal.wavMeta]]
      * guard) and return (sample_rate, channels, n_samples, peak, sum,
      * sum_sq) over ALL channel samples. Null for anything else —
      * compressed audio stays the documented env-blocked seam.
      */
    def wavStats(bytes: Array[Byte]): InternalRow = {
      if (bytes == null || bytes.length < 44) return null
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def ascii(pos: Int, n: Int) =
        new String(bytes, pos, n, "US-ASCII")
      if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE" ||
        ascii(12, 4) != "fmt " || bb.getShort(20) != 1 ||
        bb.getShort(34) != 16 || ascii(36, 4) != "data") return null
      val channels = bb.getShort(22).toInt
      val rate = bb.getInt(24)
      // a corrupt/negative declared data length is an undecodable
      // payload (null row), not a row with negative n_samples
      val declaredLen = bb.getInt(40)
      if (declaredLen < 0) return null
      val dataLen = math.min(declaredLen.toLong,
        (bytes.length - 44).toLong).toInt
      val n = dataLen / 2
      var (sum, sumSq, peak) = (0L, 0L, 0)
      var i = 0
      while (i < n) {
        val s = bb.getShort(44 + 2 * i).toInt
        sum += s; sumSq += s.toLong * s
        if (math.abs(s) > peak) peak = math.abs(s)
        i += 1
      }
      if (channels < 1) return null
      new GenericInternalRow(
        Array[Any](rate, channels, n.toLong / channels, peak, sum, sumSq))
    }
  }

  val ImageStatsType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_px", LongType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  val WavStatsType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("peak", IntegerType),
    StructField("sum", LongType),
    StructField("sum_sq", LongType)))

  case class PngSynth(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "png_synth"
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType == IntegerType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName(width int, height int, seed int)")
    override def nullSafeEval(w: Any, h: Any, s: Any): Any =
      Codec.encodePng(w.asInstanceOf[Int], h.asInstanceOf[Int],
        s.asInstanceOf[Int])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val codec = ImageExprs.Codec.getClass.getName.stripSuffix("$")
      nullSafeCodeGen(ctx, ev, (w, h, s) =>
        s"${ev.value} = $codec$$.MODULE$$.encodePng($w, $h, $s);")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): PngSynth =
      copy(first = f, second = s, third = t)
  }

  case class ImageStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ImageStatsType
    override def nullable: Boolean = true
    override def prettyName: String = "image_stats"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires binary, got $other")
      }
    override def nullSafeEval(input: Any): Any =
      Codec.stats(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val codec = ImageExprs.Codec.getClass.getName.stripSuffix("$")
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = $codec$$.MODULE$$.stats($c);
        if (${ev.value} == null) { ${ev.isNull} = true; }""")
    }
    override protected def withNewChildInternal(
        newChild: Expression): ImageStats = copy(child = newChild)
  }

  case class ImageResizeNn(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "image_resize_nn"
    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (BinaryType, IntegerType, IntegerType) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName(payload binary, width int, height int), got $other")
      }
    override def nullSafeEval(bin: Any, w: Any, h: Any): Any =
      Codec.resizeNn(bin.asInstanceOf[Array[Byte]],
        w.asInstanceOf[Int], h.asInstanceOf[Int])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val codec = ImageExprs.Codec.getClass.getName.stripSuffix("$")
      nullSafeCodeGen(ctx, ev, (b, w, h) => s"""
        ${ev.value} = $codec$$.MODULE$$.resizeNn($b, $w, $h);
        if (${ev.value} == null) { ${ev.isNull} = true; }""")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): ImageResizeNn =
      copy(first = f, second = s, third = t)
  }

  case class WavSynth(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "wav_synth"
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType == IntegerType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName(sample_rate int, amplitude int, n_samples int)")
    override def nullSafeEval(r: Any, a: Any, n: Any): Any =
      Codec.encodeWavSquare(r.asInstanceOf[Int], a.asInstanceOf[Int],
        n.asInstanceOf[Int])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val codec = ImageExprs.Codec.getClass.getName.stripSuffix("$")
      nullSafeCodeGen(ctx, ev, (r, a, n) =>
        s"${ev.value} = $codec$$.MODULE$$.encodeWavSquare($r, $a, $n);")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): WavSynth =
      copy(first = f, second = s, third = t)
  }

  case class WavStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = WavStatsType
    override def nullable: Boolean = true
    override def prettyName: String = "wav_stats"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires binary, got $other")
      }
    override def nullSafeEval(input: Any): Any =
      Codec.wavStats(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val codec = ImageExprs.Codec.getClass.getName.stripSuffix("$")
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = $codec$$.MODULE$$.wavStats($c);
        if (${ev.value} == null) { ${ev.isNull} = true; }""")
    }
    override protected def withNewChildInternal(
        newChild: Expression): WavStats = copy(child = newChild)
  }

  case class ImageGridSums(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "image_grid_sums"
    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (BinaryType, IntegerType, IntegerType) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName(payload binary, grid_x int, grid_y int), got $other")
      }
    override def nullSafeEval(bin: Any, gx: Any, gy: Any): Any = {
      val a = Codec.gridSums(bin.asInstanceOf[Array[Byte]],
        gx.asInstanceOf[Int], gy.asInstanceOf[Int])
      if (a == null) null else new GenericArrayData(a)
    }
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("imageGridSums", this,
        classOf[ImageGridSums].getName)
      nullSafeCodeGen(ctx, ev, (b, gx, gy) => s"""
        ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
          $ref.nullSafeEval($b, $gx, $gy);
        if (${ev.value} == null) { ${ev.isNull} = true; }""")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): ImageGridSums =
      copy(first = f, second = s, third = t)
  }

  val AviMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bpp", IntegerType),
    StructField("compression", IntegerType),
    StructField("n_frames", LongType)))

  case class AviMeta(child: Expression) extends UnaryExpression {
    override def dataType: DataType = AviMetaType
    override def nullable: Boolean = true
    override def prettyName: String = "avi_meta"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires binary, got $other")
      }
    override def nullSafeEval(input: Any): Any =
      Codec.aviMeta(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val codec = ImageExprs.Codec.getClass.getName.stripSuffix("$")
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = $codec$$.MODULE$$.aviMeta($c);
        if (${ev.value} == null) { ${ev.isNull} = true; }""")
    }
    override protected def withNewChildInternal(
        newChild: Expression): AviMeta = copy(child = newChild)
  }

  val AviFrameStatsType: ArrayType = ArrayType(StructType(Seq(
    StructField("frame_idx", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType))), containsNull = false)

  case class AviSynthDib(first: Expression, second: Expression,
      third: Expression, fourth: Expression) extends QuaternaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "avi_synth_dib"
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType == IntegerType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName(width int, height int, n_frames int, seed int)")
    override def nullSafeEval(w: Any, h: Any, n: Any, s: Any): Any =
      Codec.encodeAviDib(w.asInstanceOf[Int], h.asInstanceOf[Int],
        n.asInstanceOf[Int], s.asInstanceOf[Int])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val codec = ImageExprs.Codec.getClass.getName.stripSuffix("$")
      nullSafeCodeGen(ctx, ev, (w, h, n, s) =>
        s"${ev.value} = $codec$$.MODULE$$.encodeAviDib($w, $h, $n, $s);")
    }
    override protected def withNewChildrenInternal(f: Expression,
        s: Expression, t: Expression, q: Expression): AviSynthDib =
      copy(first = f, second = s, third = t, fourth = q)
  }

  case class AviFrameStats(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = AviFrameStatsType
    override def nullable: Boolean = true
    override def prettyName: String = "avi_frame_stats"
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName(payload binary, stride int), got $other")
      }
    override def nullSafeEval(bin: Any, stride: Any): Any = {
      val a = Codec.aviFrameStats(bin.asInstanceOf[Array[Byte]],
        stride.asInstanceOf[Int])
      if (a == null) null
      else new GenericArrayData(a.map(identity[Any]))
    }
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("aviFrameStats", this,
        classOf[AviFrameStats].getName)
      nullSafeCodeGen(ctx, ev, (b, st) => s"""
        ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
          $ref.nullSafeEval($b, $st);
        if (${ev.value} == null) { ${ev.isNull} = true; }""")
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): AviFrameStats =
      copy(left = l, right = r)
  }

  case class ImagePHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "image_phash"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires binary, got $other")
      }
    override def nullSafeEval(input: Any): Any =
      Codec.phash64(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val codec = ImageExprs.Codec.getClass.getName.stripSuffix("$")
      nullSafeCodeGen(ctx, ev, c => s"""
        java.lang.Long ph_${ev.value} = $codec$$.MODULE$$.phash64($c);
        if (ph_${ev.value} == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ph_${ev.value}.longValue(); }""")
    }
    override protected def withNewChildInternal(
        newChild: Expression): ImagePHash = copy(child = newChild)
  }

  case class ImageDHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "image_dhash"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires binary, got $other")
      }
    override def nullSafeEval(input: Any): Any =
      Codec.dhash64(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val codec = ImageExprs.Codec.getClass.getName.stripSuffix("$")
      nullSafeCodeGen(ctx, ev, c => s"""
        java.lang.Long dh_${ev.value} = $codec$$.MODULE$$.dhash64($c);
        if (dh_${ev.value} == null) { ${ev.isNull} = true; }
        else { ${ev.value} = dh_${ev.value}.longValue(); }""")
    }
    override protected def withNewChildInternal(
        newChild: Expression): ImageDHash = copy(child = newChild)
  }

  case class ImageLinearMap(first: Expression, second: Expression,
      third: Expression, fourth: Expression) extends QuaternaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "image_linear_map"
    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
        case (BinaryType, IntegerType, IntegerType, IntegerType) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName(payload binary, num int, den int, off int), got $other")
      }
    override def nullSafeEval(b: Any, n: Any, d: Any, o: Any): Any =
      Codec.linearMap(b.asInstanceOf[Array[Byte]], n.asInstanceOf[Int],
        d.asInstanceOf[Int], o.asInstanceOf[Int])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val codec = ImageExprs.Codec.getClass.getName.stripSuffix("$")
      nullSafeCodeGen(ctx, ev, (b, n, d, o) => s"""
        ${ev.value} = $codec$$.MODULE$$.linearMap($b, $n, $d, $o);
        if (${ev.value} == null) { ${ev.isNull} = true; }""")
    }
    override protected def withNewChildrenInternal(f: Expression,
        s: Expression, t: Expression, q: Expression): ImageLinearMap =
      copy(first = f, second = s, third = t, fourth = q)
  }

  case class PngSynthWave(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "png_synth_wave"
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType == IntegerType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName(width int, height int, seed int)")
    override def nullSafeEval(w: Any, h: Any, s: Any): Any =
      Codec.encodePngWave(w.asInstanceOf[Int], h.asInstanceOf[Int],
        s.asInstanceOf[Int])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val codec = ImageExprs.Codec.getClass.getName.stripSuffix("$")
      nullSafeCodeGen(ctx, ev, (w, h, s) =>
        s"${ev.value} = $codec$$.MODULE$$.encodePngWave($w, $h, $s);")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): PngSynthWave =
      copy(first = f, second = s, third = t)
  }

  case class WavSynthDual(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "wav_synth_dual"
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType == IntegerType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName(sample_rate int, n_samples int, seed int)")
    override def nullSafeEval(r: Any, n: Any, s: Any): Any =
      Codec.encodeWavDual(r.asInstanceOf[Int], n.asInstanceOf[Int],
        s.asInstanceOf[Int])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val codec = ImageExprs.Codec.getClass.getName.stripSuffix("$")
      nullSafeCodeGen(ctx, ev, (r, n, s) =>
        s"${ev.value} = $codec$$.MODULE$$.encodeWavDual($r, $n, $s);")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): WavSynthDual =
      copy(first = f, second = s, third = t)
  }

  case class WavGain(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "wav_gain"
    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (BinaryType, IntegerType, IntegerType) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName(payload binary, num int, den int), got $other")
      }
    override def nullSafeEval(b: Any, n: Any, d: Any): Any =
      Codec.wavGain(b.asInstanceOf[Array[Byte]], n.asInstanceOf[Int],
        d.asInstanceOf[Int])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val codec = ImageExprs.Codec.getClass.getName.stripSuffix("$")
      nullSafeCodeGen(ctx, ev, (b, n, d) => s"""
        ${ev.value} = $codec$$.MODULE$$.wavGain($b, $n, $d);
        if (${ev.value} == null) { ${ev.isNull} = true; }""")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): WavGain =
      copy(first = f, second = s, third = t)
  }

  case class AudioBandFeatures(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "audio_band_features"
    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (BinaryType, IntegerType, IntegerType) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName(payload binary, n_bands int, win int), got $other")
      }
    override def nullSafeEval(b: Any, nb: Any, w: Any): Any = {
      val a = Codec.audioBandFeatures(b.asInstanceOf[Array[Byte]],
        nb.asInstanceOf[Int], w.asInstanceOf[Int])
      if (a == null) null else new GenericArrayData(a)
    }
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("audioBandFeatures", this,
        classOf[AudioBandFeatures].getName)
      nullSafeCodeGen(ctx, ev, (b, nb, w) => s"""
        ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
          $ref.nullSafeEval($b, $nb, $w);
        if (${ev.value} == null) { ${ev.isNull} = true; }""")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): AudioBandFeatures =
      copy(first = f, second = s, third = t)
  }

  /** Column forms. */
  def wavSynthDual(rate: Column, n: Column, seed: Column): Column =
    ColumnBridge.column(WavSynthDual(ColumnBridge.expression(rate),
      ColumnBridge.expression(n), ColumnBridge.expression(seed)))
  def wavGain(bin: Column, num: Column, den: Column): Column =
    ColumnBridge.column(WavGain(ColumnBridge.expression(bin),
      ColumnBridge.expression(num), ColumnBridge.expression(den)))
  def audioBandFeatures(bin: Column, nBands: Column, win: Column): Column =
    ColumnBridge.column(AudioBandFeatures(ColumnBridge.expression(bin),
      ColumnBridge.expression(nBands), ColumnBridge.expression(win)))
  def imagePHash(bin: Column): Column =
    ColumnBridge.column(ImagePHash(ColumnBridge.expression(bin)))
  def imageDHash(bin: Column): Column =
    ColumnBridge.column(ImageDHash(ColumnBridge.expression(bin)))
  def imageLinearMap(bin: Column, num: Column, den: Column,
      off: Column): Column =
    ColumnBridge.column(ImageLinearMap(ColumnBridge.expression(bin),
      ColumnBridge.expression(num), ColumnBridge.expression(den),
      ColumnBridge.expression(off)))
  def pngSynthWave(w: Column, h: Column, seed: Column): Column =
    ColumnBridge.column(PngSynthWave(ColumnBridge.expression(w),
      ColumnBridge.expression(h), ColumnBridge.expression(seed)))
  def pngSynth(w: Column, h: Column, seed: Column): Column =
    ColumnBridge.column(PngSynth(ColumnBridge.expression(w),
      ColumnBridge.expression(h), ColumnBridge.expression(seed)))
  def imageStats(bin: Column): Column =
    ColumnBridge.column(ImageStats(ColumnBridge.expression(bin)))
  def imageResizeNn(bin: Column, w: Column, h: Column): Column =
    ColumnBridge.column(ImageResizeNn(ColumnBridge.expression(bin),
      ColumnBridge.expression(w), ColumnBridge.expression(h)))
  def wavSynth(rate: Column, amp: Column, n: Column): Column =
    ColumnBridge.column(WavSynth(ColumnBridge.expression(rate),
      ColumnBridge.expression(amp), ColumnBridge.expression(n)))
  def wavStats(bin: Column): Column =
    ColumnBridge.column(WavStats(ColumnBridge.expression(bin)))
  def imageGridSums(bin: Column, gx: Column, gy: Column): Column =
    ColumnBridge.column(ImageGridSums(ColumnBridge.expression(bin),
      ColumnBridge.expression(gx), ColumnBridge.expression(gy)))
  def aviSynthDib(w: Column, h: Column, n: Column, seed: Column): Column =
    ColumnBridge.column(AviSynthDib(ColumnBridge.expression(w),
      ColumnBridge.expression(h), ColumnBridge.expression(n),
      ColumnBridge.expression(seed)))
  def aviFrameStats(bin: Column, stride: Column): Column =
    ColumnBridge.column(AviFrameStats(ColumnBridge.expression(bin),
      ColumnBridge.expression(stride)))
  def aviMeta(bin: Column): Column =
    ColumnBridge.column(AviMeta(ColumnBridge.expression(bin)))

  /** Grid descriptor as an ANN-ready vector: per-cell brightness MEANS
    * (cell sum / exact cell pixel count — cells of an unevenly divided
    * grid differ by one row/column of pixels, so sums alone would skew
    * the cosine). ONE decode per row, inside the codec; double-valued
    * and deterministic (exact int / exact int). Feeds
    * [[graft.operators.Similarity]]'s cosine/IVF path directly —
    * images become first-class citizens of the dedup/retrieval estate.
    */
  def imageGridFeatures(bin: Column, gx: Column, gy: Column): Column =
    ColumnBridge.column(ImageGridFeatures(ColumnBridge.expression(bin),
      ColumnBridge.expression(gx), ColumnBridge.expression(gy)))

  case class ImageGridFeatures(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "image_grid_features"
    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (BinaryType, IntegerType, IntegerType) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName(payload binary, grid_x int, grid_y int), got $other")
      }
    override def nullSafeEval(bin: Any, gx: Any, gy: Any): Any = {
      val a = Codec.gridMeans(bin.asInstanceOf[Array[Byte]],
        gx.asInstanceOf[Int], gy.asInstanceOf[Int])
      if (a == null) null else new GenericArrayData(a)
    }
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("imageGridFeatures", this,
        classOf[ImageGridFeatures].getName)
      nullSafeCodeGen(ctx, ev, (b, gx, gy) => s"""
        ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
          $ref.nullSafeEval($b, $gx, $gy);
        if (${ev.value} == null) { ${ev.isNull} = true; }""")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): ImageGridFeatures =
      copy(first = f, second = s, third = t)
  }
}
