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

    private def decode(bytes: Array[Byte]): java.awt.image.BufferedImage =
      try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }

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
      if (w <= 0 || h <= 0 || bpp != 24 || compression != 0 ||
        moviStart < 0) return null
      val rowBytes = (w * 3 + 3) & ~3
      val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      var (pos, idx) = (moviStart, 0)
      while (pos + 8 <= moviEnd) {
        val id = ascii(pos, 4); val len = le32(pos + 4)
        if (len < 0 || pos + 8 + len > moviEnd) return null // torn container
        if (id == "00db" || id == "00dc") {
          if (idx % stride == 0) {
            if (len < rowBytes * h) return null // truncated frame
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
      val dataLen = math.min(bb.getInt(40).toLong,
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

  /** Column forms. */
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
