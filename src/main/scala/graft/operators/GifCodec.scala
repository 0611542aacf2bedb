package graft.operators

import java.io.ByteArrayOutputStream

/** GIF87a/89a container codec — real LZW, pure JDK, no external
  * libraries: the palette-indexed legacy-web format that still carries a
  * measurable share of crawled image bytes. Completes the multimodal
  * container family (WAV/BMP/PNG/JPEG/AVI — `MediaCodec`, [[JpegCodec]],
  * [[AviCodec]]) with the one mainstream still-image format the engine
  * did not yet decode for real.
  *
  * Implemented from the public GIF89a specification: logical screen
  * descriptor + global color table, graphic control extensions,
  * per-frame image descriptors with optional local color tables and
  * interlacing (4-pass row order), and the GIF variant of LZW
  * (variable-width codes LSB-first, CLEAR/EOI, dictionary growth to
  * 4096 then reset) in both directions — the encoder exists so specs
  * and oracle queries can synthesize REAL compressed GIF bytes with
  * closed-form pixel content, the same round-trip-oracle pattern as
  * `bmpEncode`/`wavEncode`/`aviEncode`.
  *
  * Animation frames composite left-top-anchored image blocks onto the
  * running canvas (disposal "draw over"); restore-to-previous disposal
  * is not reproduced (rare, and irrelevant to the stats surface).
  * Every decode path returns `None` on malformed input — never throws
  * (fuzz-asserted) — so a corrupt blob inside a 100 TB media column
  * poisons one row, not the job.
  */
object GifCodec {

  // ------------------------------------------------------------------
  // LZW, GIF flavor (LSB-first bit order, variable code width)
  // ------------------------------------------------------------------

  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def write(code: Int, width: Int): Unit = {
      cur |= code << nbits
      nbits += width
      while (nbits >= 8) { out.write(cur & 0xFF); cur >>>= 8; nbits -= 8 }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) { out.write(cur & 0xFF); cur = 0; nbits = 0 }
      out.toByteArray
    }
  }

  /** GIF-LZW compress `indices` (each < 2^minCodeSize unless the
    * palette is under-full; codes still fit the clear-rooted space).
    */
  private[operators] def lzwEncode(indices: Array[Int],
      minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val bw = new BitWriter
    var width = minCodeSize + 1
    var next = eoi + 1
    val dict = new java.util.HashMap[Long, Integer]()
    def key(prefix: Int, k: Int): Long = (prefix.toLong << 12) | k
    bw.write(clear, width)
    if (indices.nonEmpty) {
      var cur = indices(0)
      var i = 1
      while (i < indices.length) {
        val k = indices(i)
        val c = dict.get(key(cur, k))
        if (c != null) cur = c.intValue()
        else {
          bw.write(cur, width)
          if (next < 4096) {
            dict.put(key(cur, k), Integer.valueOf(next))
            next += 1
            // grow only when an emittable code VALUE (<= next-1, plus
            // the decoder's KwKwK next) would no longer fit — i.e.
            // after next passes 1<<width, not when it reaches it
            // (ImageIO cross-checks pin this convention)
            if (next == (1 << width) + 1 && width < 12) width += 1
          } else {
            // dictionary full: reset, exactly as real encoders do
            bw.write(clear, width)
            dict.clear()
            next = eoi + 1
            width = minCodeSize + 1
          }
          cur = k
        }
        i += 1
      }
      bw.write(cur, width)
    }
    bw.write(eoi, width)
    bw.finish()
  }

  /** GIF-LZW decompress into at most `maxOut` palette indices; None on
    * any inconsistency.
    */
  private[operators] def lzwDecode(data: Array[Byte], minCodeSize: Int,
      maxOut: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 11) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](maxOut)
    var outLen = 0
    var width = minCodeSize + 1
    var next = eoi + 1
    var prev = -1
    var acc = 0L
    var nbits = 0
    var pos = 0
    var firstOfPrev: Byte = 0
    while (true) {
      while (nbits < width) {
        if (pos >= data.length) return Some(java.util.Arrays.copyOf(out, outLen))
        acc |= (data(pos) & 0xFFL) << nbits
        nbits += 8
        pos += 1
      }
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>>= width
      nbits -= width
      if (code == clear) {
        width = minCodeSize + 1
        next = eoi + 1
        prev = -1
      } else if (code == eoi) {
        return Some(java.util.Arrays.copyOf(out, outLen))
      } else if (prev == -1) {
        if (code >= clear) return None
        if (outLen >= maxOut) return Some(java.util.Arrays.copyOf(out, outLen))
        out(outLen) = code.toByte
        outLen += 1
        firstOfPrev = code.toByte
        prev = code
      } else {
        if (code > next || code == clear || code == eoi) return None
        // expand `code` (or prev+firstOfPrev for the KwKwK case)
        var sp = 0
        var c = if (code == next) prev else code
        if (code == next) { stack(sp) = firstOfPrev; sp += 1 }
        while (c >= eoi + 1) {
          stack(sp) = suffix(c)
          sp += 1
          if (sp > 4096) return None
          c = prefix(c)
        }
        if (c >= clear) return None
        val first = c.toByte
        stack(sp) = first
        sp += 1
        var i = sp - 1
        while (i >= 0) {
          if (outLen >= maxOut) return Some(java.util.Arrays.copyOf(out, outLen))
          out(outLen) = stack(i)
          outLen += 1
          i -= 1
        }
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = first
          next += 1
          // the decoder adds each entry one code later than the
          // encoder did, so this reads one add "earlier" than the
          // encoder's next==(1<<width)+1 — the classic convention pair
          // (ImageIO cross-checks pin the alignment in both directions)
          if (next == (1 << width) && width < 12) width += 1
        }
        firstOfPrev = first
        prev = code
      }
    }
    None // unreachable
  }

  // ------------------------------------------------------------------
  // Container encode
  // ------------------------------------------------------------------

  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
  }

  private val interlacePasses: Seq[(Int, Int)] =
    Seq((0, 8), (4, 8), (2, 4), (1, 2))

  private def interlacedRowOrder(h: Int): Array[Int] = {
    val rows = new Array[Int](h)
    var i = 0
    interlacePasses.foreach { case (start, step) =>
      var y = start
      while (y < h) { rows(i) = y; i += 1; y += step }
    }
    rows
  }

  /** Encode an animated (or single-frame) GIF89a: `palette` is RGB
    * ints (length a power of two, 4..256), `indexFn(frame, x, y)` the
    * palette index per pixel. All frames are full-canvas at (0,0).
    */
  def gifEncode(w: Int, h: Int, palette: Array[Int], nFrames: Int,
      indexFn: (Int, Int, Int) => Int, interlaced: Boolean = false,
      delayCs: Int = 4): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0, s"bad geometry ${w}x$h/$nFrames")
    require(palette.length >= 4 && palette.length <= 256 &&
      Integer.bitCount(palette.length) == 1,
      s"palette must be a power of two in 4..256, got ${palette.length}")
    require(w.toLong * h * nFrames <= 64_000_000L,
      "GIF too large for a sane in-memory encode")
    val sizeBits = 31 - Integer.numberOfLeadingZeros(palette.length)
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(out, w); le16(out, h)
    out.write(0x80 | 0x70 | (sizeBits - 1)) // GCT + colorRes 8 + size
    out.write(0) // background index
    out.write(0) // aspect
    palette.foreach { rgb =>
      out.write((rgb >> 16) & 0xFF); out.write((rgb >> 8) & 0xFF)
      out.write(rgb & 0xFF)
    }
    val minCode = math.max(2, sizeBits)
    val rowOrder =
      if (interlaced) interlacedRowOrder(h) else Array.tabulate(h)(identity)
    var f = 0
    while (f < nFrames) {
      // graphic control extension (delay only)
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(0); le16(out, delayCs); out.write(0); out.write(0)
      // image descriptor: full canvas, optional interlace, no local CT
      out.write(0x2C)
      le16(out, 0); le16(out, 0); le16(out, w); le16(out, h)
      out.write(if (interlaced) 0x40 else 0x00)
      val indices = new Array[Int](w * h)
      var i = 0
      rowOrder.foreach { y =>
        var x = 0
        while (x < w) {
          val v = indexFn(f, x, y)
          require(v >= 0 && v < palette.length, s"index $v out of palette")
          indices(i) = v
          i += 1
          x += 1
        }
      }
      out.write(minCode)
      val lzw = lzwEncode(indices, minCode)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n)
        out.write(lzw, off, n)
        off += n
      }
      out.write(0) // block terminator
      f += 1
    }
    out.write(0x3B)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Container decode
  // ------------------------------------------------------------------

  /** Decoded animation: full-canvas RGB ints per frame. */
  final case class GifImage(width: Int, height: Int,
      frames: Seq[Array[Int]])

  def gifDecode(b: Array[Byte]): Option[GifImage] = {
    try decodeImpl(b)
    catch { case _: Exception => None }
  }

  private def decodeImpl(b: Array[Byte]): Option[GifImage] = {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u16(p: Int): Int = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
    val w = u16(6)
    val h = u16(8)
    if (w <= 0 || h <= 0 || w.toLong * h > 64_000_000L) return None
    val packed = b(10) & 0xFF
    var pos = 13
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (pos + 3 * n > b.length) return None
      gct = Array.tabulate(n)(i => ((b(pos + 3 * i) & 0xFF) << 16) |
        ((b(pos + 3 * i + 1) & 0xFF) << 8) | (b(pos + 3 * i + 2) & 0xFF))
      pos += 3 * n
    }
    val canvas = new Array[Int](w * h)
    val frames = Seq.newBuilder[Array[Int]]
    var nFrames = 0
    while (pos < b.length) {
      (b(pos) & 0xFF) match {
        case 0x3B => // trailer
          val fs = frames.result()
          return if (fs.nonEmpty) Some(GifImage(w, h, fs)) else None
        case 0x21 => // extension: label + sub-blocks, skipped
          pos += 2
          while (pos < b.length && (b(pos) & 0xFF) != 0)
            pos += 1 + (b(pos) & 0xFF)
          if (pos >= b.length) return None
          pos += 1
        case 0x2C =>
          if (pos + 10 > b.length) return None
          val left = u16(pos + 1)
          val top = u16(pos + 3)
          val iw = u16(pos + 5)
          val ih = u16(pos + 7)
          val ip = b(pos + 9) & 0xFF
          pos += 10
          if (iw <= 0 || ih <= 0 || left + iw > w || top + ih > h)
            return None
          var ct = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            if (pos + 3 * n > b.length) return None
            ct = Array.tabulate(n)(i => ((b(pos + 3 * i) & 0xFF) << 16) |
              ((b(pos + 3 * i + 1) & 0xFF) << 8) |
              (b(pos + 3 * i + 2) & 0xFF))
            pos += 3 * n
          }
          if (ct == null) return None
          if (pos >= b.length) return None
          val minCode = b(pos) & 0xFF
          pos += 1
          val data = new ByteArrayOutputStream()
          while (pos < b.length && (b(pos) & 0xFF) != 0) {
            val n = b(pos) & 0xFF
            if (pos + 1 + n > b.length) return None
            data.write(b, pos + 1, n)
            pos += 1 + n
          }
          if (pos >= b.length) return None
          pos += 1
          val idx = lzwDecode(data.toByteArray, minCode, iw * ih)
            .getOrElse(return None)
          if (idx.length < iw * ih) return None
          val rowOrder = if ((ip & 0x40) != 0) interlacedRowOrder(ih)
            else Array.tabulate(ih)(identity)
          var r = 0
          while (r < ih) {
            val y = top + rowOrder(r)
            var x = 0
            while (x < iw) {
              val ci = idx(r * iw + x) & 0xFF
              if (ci >= ct.length) return None
              canvas(y * w + left + x) = ct(ci)
              x += 1
            }
            r += 1
          }
          frames += canvas.clone()
          nFrames += 1
          if (nFrames > 4096) return None
        case _ => return None
      }
    }
    None // missing trailer
  }

  /** Per-sampled-frame channel statistics, the [[AviCodec.frameStats]]
    * shape: `(frame_idx, n_pixels, sum_r, sum_g, sum_b, lum_min,
    * lum_max)` for every `every`-th frame. GIF frames must all be
    * decoded (later frames composite onto earlier canvases), but only
    * sampled frames are STATTED — the walk stays one pass and
    * allocation-bounded.
    */
  def frameStats(b: Array[Byte], every: Int)
      : Option[Seq[(Long, Long, Long, Long, Long, Int, Int)]] = {
    require(every >= 1, s"every must be >= 1, got $every")
    gifDecode(b).map { im =>
      im.frames.zipWithIndex.collect {
        case (px, f) if f % every == 0 =>
          var sr = 0L; var sg = 0L; var sb = 0L
          var lmin = Int.MaxValue; var lmax = Int.MinValue
          var i = 0
          while (i < px.length) {
            val r = (px(i) >> 16) & 0xFF
            val g = (px(i) >> 8) & 0xFF
            val bl = px(i) & 0xFF
            sr += r; sg += g; sb += bl
            val lum = 299 * r + 587 * g + 114 * bl
            if (lum < lmin) lmin = lum
            if (lum > lmax) lmax = lum
            i += 1
          }
          (f.toLong, px.length.toLong, sr, sg, sb, lmin, lmax)
      }
    }
  }
}
