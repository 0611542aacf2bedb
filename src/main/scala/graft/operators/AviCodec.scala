package graft.operators

/** REAL AVI (RIFF) container codec for uncompressed 24-bit DIB video —
  * the video counterpart of [[Multimodal.MediaCodec]]'s WAV/BMP/PNG and
  * [[JpegCodec]]'s JPEG: encoder and parser are written independently
  * against the RIFF/AVI spec (`RIFF 'AVI ' → LIST hdrl(avih, LIST
  * strl(strh, strf)) → LIST movi(00db…) → idx1`), so round-trip
  * agreement is evidence of both.
  *
  * Frame payloads are the standard uncompressed DIB layout (bottom-up
  * BGR rows, each padded to a 4-byte boundary — exactly a BMP pixel
  * array without the file header). Frame-sampling ("take every k-th
  * frame") iterates `00db`/`00dc` chunks inside the `movi` list
  * WITHOUT materializing unsampled frames — at 100 TB the sampler's
  * cost is proportional to frames kept, and the byte walk never leaves
  * the task that holds the blob ([[Multimodal.videoFrameStats]]).
  */
object AviCodec {

  /** `avih` main-header fields a frame-sampler needs. */
  final case class AviInfo(width: Int, height: Int, nFrames: Int,
      usPerFrame: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    le16(b, i) | (le16(b, i + 2) << 16)
  private def fourcc(b: Array[Byte], i: Int): String =
    if (i + 4 > b.length) ""
    else new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def rowBytes(w: Int): Int = { val r = w * 3; r + ((4 - r % 4) % 4) }
  private def frameBytes(w: Int, h: Int): Int = rowBytes(w) * h

  /** Encode `nFrames` frames of `w`×`h` 24-bit video at
    * `usPerFrame` µs/frame; `pixel(frame, x, y)` returns packed
    * 0xRRGGBB with (0,0) the TOP-LEFT corner (the encoder performs the
    * bottom-up row flip the DIB layout requires).
    */
  def aviEncode(w: Int, h: Int, usPerFrame: Int, nFrames: Int,
      pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0 && usPerFrame > 0,
      s"bad AVI geometry: ${w}x$h frames=$nFrames us=$usPerFrame")
    // Size the container in LONG arithmetic: realistic geometry
    // (1920×1080×400 frames ≈ 2.5 GB) silently overflows Int into a
    // negative allocation / corrupt RIFF size field, and RIFF itself is
    // a 32-bit format — reject anything beyond it with a clear message
    // instead.
    val fbL = rowBytes(w).toLong * h
    val strlSize = 4 + (8 + 56) + (8 + 40) // 'strl' + strh + strf
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize) // 'hdrl' + avih + LIST strl
    val moviSizeL = 4L + nFrames.toLong * (8L + fbL)
    val idx1SizeL = 16L * nFrames
    val riffSizeL = 4L + (8L + hdrlSize) + (8L + moviSizeL) + (8L + idx1SizeL)
    require(8L + riffSizeL <= Int.MaxValue,
      s"AVI too large for RIFF's 32-bit sizes: ${w}x$h frames=$nFrames " +
        s"needs ${8L + riffSizeL} bytes (max ${Int.MaxValue})")
    val fb = fbL.toInt
    val moviSize = moviSizeL.toInt
    val idx1Size = idx1SizeL.toInt
    val riffSize = riffSizeL.toInt
    val out = new Array[Byte](8 + riffSize)
    var p = 0
    def putAscii(s: String): Unit = { var i = 0; while (i < s.length) {
      out(p) = s.charAt(i).toByte; p += 1; i += 1 } }
    def put32(v: Int): Unit = { out(p) = (v & 0xFF).toByte
      out(p + 1) = ((v >>> 8) & 0xFF).toByte
      out(p + 2) = ((v >>> 16) & 0xFF).toByte
      out(p + 3) = ((v >>> 24) & 0xFF).toByte; p += 4 }
    def put16(v: Int): Unit = { out(p) = (v & 0xFF).toByte
      out(p + 1) = ((v >>> 8) & 0xFF).toByte; p += 2 }

    putAscii("RIFF"); put32(riffSize); putAscii("AVI ")
    putAscii("LIST"); put32(hdrlSize); putAscii("hdrl")
    // avih: MainAVIHeader (56 bytes)
    putAscii("avih"); put32(56)
    put32(usPerFrame); put32(0); put32(0); put32(0x10 /* HASINDEX */)
    put32(nFrames); put32(0); put32(1 /* streams */); put32(fb)
    put32(w); put32(h); put32(0); put32(0); put32(0); put32(0)
    putAscii("LIST"); put32(strlSize); putAscii("strl")
    // strh: AVIStreamHeader (56 bytes)
    putAscii("strh"); put32(56)
    putAscii("vids"); putAscii("DIB ")
    put32(0); put16(0); put16(0); put32(0)
    put32(usPerFrame /* scale */); put32(1000000 /* rate */)
    put32(0 /* start */); put32(nFrames /* length */)
    put32(fb); put32(-1 /* quality */); put32(0 /* sampleSize */)
    put16(0); put16(0); put16(w); put16(h) // rcFrame
    // strf: BITMAPINFOHEADER (40 bytes)
    putAscii("strf"); put32(40)
    put32(40); put32(w); put32(h /* bottom-up */); put16(1); put16(24)
    put32(0 /* BI_RGB */); put32(fb); put32(0); put32(0); put32(0); put32(0)
    // movi
    putAscii("LIST"); put32(moviSize); putAscii("movi")
    val frameOffsets = new Array[Int](nFrames)
    val moviStart = p - 4 // offset of the 'movi' fourcc
    var f = 0
    while (f < nFrames) {
      frameOffsets(f) = p - moviStart
      putAscii("00db"); put32(fb)
      var row = 0
      while (row < h) {
        val y = h - 1 - row // DIB rows run bottom-up
        var x = 0
        while (x < w) {
          val rgb = pixel(f, x, y)
          out(p) = (rgb & 0xFF).toByte // B
          out(p + 1) = ((rgb >>> 8) & 0xFF).toByte // G
          out(p + 2) = ((rgb >>> 16) & 0xFF).toByte // R
          p += 3; x += 1
        }
        p += rowBytes(w) - w * 3 // zeroed pad (array is zero-initialized)
        row += 1
      }
      f += 1
    }
    // idx1
    putAscii("idx1"); put32(idx1Size)
    f = 0
    while (f < nFrames) {
      putAscii("00db"); put32(0x10 /* KEYFRAME */)
      put32(frameOffsets(f)); put32(fb)
      f += 1
    }
    assert(p == out.length, s"AVI encoder wrote $p of ${out.length}")
    out
  }

  /** Parse the `avih` main header. None for anything that is not a
    * RIFF/AVI payload — callers use this as the video-format probe.
    */
  def aviInfo(b: Array[Byte]): Option[AviInfo] = {
    if (b.length < 12 + 12 + 8 + 56) return None
    if (fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return None
    // hdrl is the first LIST; avih its first child (spec-mandated order)
    var p = 12
    while (p + 8 <= b.length) {
      val ck = fourcc(b, p); val sz = le32(b, p + 4)
      // mutated/negative size fields must not stall or reverse the walk
      if (sz < 0 || sz > b.length) return None
      if (ck == "LIST" && fourcc(b, p + 8) == "hdrl") {
        val q = p + 12
        if (fourcc(b, q) == "avih" && q + 8 + 56 <= b.length) {
          val w = le32(b, q + 8 + 32); val h = le32(b, q + 8 + 36)
          val n = le32(b, q + 8 + 16); val us = le32(b, q + 8)
          // sanity-bound the geometry: a fuzzed header must never
          // drive downstream frame math into overflow or huge allocs
          if (w <= 0 || h <= 0 || n < 0 ||
            w > (1 << 16) || h > (1 << 16)) return None
          return Some(AviInfo(w, h, n, us))
        }
        return None
      }
      p += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    None
  }

  /** Iterate video frames (`##db`/`##dc` chunks of the `movi` list) as
    * (frameIndex, offset, length) WITHOUT copying payloads — sampling
    * callers slice only the frames they keep.
    */
  def frameChunks(b: Array[Byte]): Iterator[(Int, Int, Int)] = {
    var moviStart = -1; var moviEnd = -1
    var p = 12
    var bad = false
    while (!bad && moviStart < 0 && p + 8 <= b.length) {
      val ck = fourcc(b, p); val sz = le32(b, p + 4)
      if (sz < 0 || sz > b.length) bad = true // fuzzed size: stop cleanly
      else {
        if (ck == "LIST" && fourcc(b, p + 8) == "movi") {
          moviStart = p + 12; moviEnd = math.min(p + 8 + sz, b.length)
        }
        p += 8 + sz + (sz & 1)
      }
    }
    if (moviStart < 0) Iterator.empty
    else new Iterator[(Int, Int, Int)] {
      private var q = moviStart
      private var idx = 0
      private var nextFrame: (Int, Int, Int) = null
      private def advance(): Unit = {
        nextFrame = null
        while (nextFrame == null && q + 8 <= moviEnd) {
          val ck = fourcc(b, q); val sz = le32(b, q + 4)
          if (sz < 0 || sz > b.length) { q = moviEnd } // fuzzed: stop
          else {
            val isFrame = ck.length == 4 &&
              ck(0).isDigit && ck(1).isDigit &&
              ((ck(2) == 'd' && (ck(3) == 'b' || ck(3) == 'c')))
            if (isFrame && q + 8 + sz <= b.length) {
              nextFrame = (idx, q + 8, sz); idx += 1
            }
            q += 8 + sz + (sz & 1)
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextFrame != null
      override def next(): (Int, Int, Int) = {
        val r = nextFrame; advance(); r }
    }
  }

  /** Random-access pixel readers for every `every`-th frame (frame 0
    * always included): `(frame_idx, width, height, rgb)` with
    * `rgb(x, y)` returning packed 0xRRGGBB, (0,0) TOP-LEFT (the reader
    * performs the DIB bottom-up flip). Zero-copy: each accessor reads
    * straight from the payload buffer; only sampled frames are ever
    * touched. Same bounds discipline as [[frameStats]] — a frame chunk
    * shorter than the geometry demands is skipped, never read past.
    * None for non-AVI payloads. Feeds [[Multimodal.MediaCodec]]'s
    * per-frame perceptual embedding (video near-dup).
    */
  def frameReaders(b: Array[Byte], every: Int)
      : Option[Seq[(Int, Int, Int, (Int, Int) => Int)]] = {
    require(every >= 1, s"every must be >= 1, got $every")
    aviInfo(b).map { info =>
      val w = info.width; val h = info.height
      val fbL = rowBytes(w).toLong * h
      val stride = rowBytes(w)
      frameChunks(b)
        .filter { case (idx, off, len) =>
          idx % every == 0 && len >= fbL && off.toLong + fbL <= b.length }
        .map { case (idx, off, _) =>
          val rgb = (x: Int, y: Int) => {
            val base = off + (h - 1 - y) * stride + 3 * x // bottom-up BGR
            (u8(b, base + 2) << 16) | (u8(b, base + 1) << 8) | u8(b, base)
          }
          (idx, w, h, rgb)
        }.toSeq
    }
  }

  /** Per-frame pixel statistics for every `every`-th frame (frame 0
    * always included): `(frame_idx, n_pixels, sum_r, sum_g, sum_b,
    * lum_min, lum_max)` with per-mille luminance `299r+587g+114b` —
    * the same stat layout as [[Multimodal.imageStats]], one row per
    * SAMPLED frame. None for non-AVI payloads.
    */
  def frameStats(b: Array[Byte], every: Int)
      : Option[Seq[(Int, Long, Long, Long, Long, Int, Int)]] = {
    require(every >= 1, s"every must be >= 1, got $every")
    aviInfo(b).map { info =>
      val w = info.width; val h = info.height
      // Long math + an explicit end-bound per frame: aviInfo sanity-
      // bounds w/h to 2^16, but the product can still exceed a mutated
      // chunk's real extent — every read below stays inside [off, off+fb)
      // only because fb is checked against BOTH the chunk length and the
      // payload end before the pixel walk.
      val fbL = rowBytes(w).toLong * h
      val stride = rowBytes(w)
      frameChunks(b)
        .filter { case (idx, off, len) =>
          idx % every == 0 && len >= fbL && off.toLong + fbL <= b.length }
        .map { case (idx, off, _) =>
          var sr = 0L; var sg = 0L; var sb = 0L
          var lmin = Int.MaxValue; var lmax = Int.MinValue
          var row = 0
          while (row < h) {
            val base = off + row * stride
            var x = 0
            while (x < w) {
              val bl = u8(b, base + 3 * x)
              val g = u8(b, base + 3 * x + 1)
              val r = u8(b, base + 3 * x + 2)
              sr += r; sg += g; sb += bl
              val lum = 299 * r + 587 * g + 114 * bl
              if (lum < lmin) lmin = lum
              if (lum > lmax) lmax = lum
              x += 1
            }
            row += 1
          }
          (idx, w.toLong * h, sr, sg, sb, lmin, lmax)
        }.toSeq
    }
  }
}
