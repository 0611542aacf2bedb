package graft.operators

/** Pure-JDK JPEG pixel decoder — retires the last media stub
  * (rounds 1-4 shipped real WAV/BMP/PNG codecs but stubbed JPEG pixels
  * because, unlike PNG's DEFLATE, nothing in the JDK decodes JPEG's
  * entropy coding; this file implements it from the ITU-T T.81 spec).
  *
  * Scope (accepted → decoded): baseline sequential DCT (SOF0) and —
  * round 8 — PROGRESSIVE DCT (SOF2, the dominant web-JPEG flavor):
  * multi-scan spectral selection and successive approximation per
  * T.81 G.1.2 (DC first + refinement bits, AC first with EOB runs, AC
  * refinement with correction bits), coefficients accumulated across
  * scans and dequantized+IDCT'd once at EOI. Both flavors: 8-bit
  * precision, 1 (grayscale) or 3 (YCbCr) components, arbitrary sampling
  * factors 1..4 (4:4:4 / 4:2:2 / 4:2:0 / anything the MCU grammar
  * allows), multiple DQT/DHT segments (including between scans),
  * restart intervals (DRI + RSTn), 0xFF00 byte stuffing, APPn/COM
  * skipping. Everything else — arithmetic coding, 12-bit, hierarchical,
  * lossless — returns None, as does any malformed, truncated or
  * dimension-bomb payload (the same per-axis 1<<20 and total-pixel
  * 1<<26 caps as the PNG path; decode never throws — fuzz-asserted).
  *
  * Determinism contract (what the oracle and specs rely on):
  *   - IDCT is the textbook separable double-precision sum (T.81 A.3.3)
  *     with `round(half-up) + 128` level shift and [0,255] clamp. For
  *     DC-only blocks this is EXACT: every sample equals
  *     `round(DC·q00 / 8) + 128`, which is what makes a lossless
  *     closed-form oracle possible for a lossy format (q92 encodes
  *     DC-only JPEGs whose decoded pixels DuckDB predicts bit-exactly).
  *     Clarity-first O(64²) per block, not AAN — the engine decodes
  *     media once per record on a narrow map, and exactness is worth
  *     more here than the last 3× of a micro-kernel.
  *   - YCbCr→RGB is CCIR 601 in 16-bit fixed point:
  *     r = y + (91881·(cr−128) + 32768 >> 16), etc. — integer-exact and
  *     reproducible in any engine with 64-bit arithmetic (the oracle
  *     mirrors it in SQL).
  *   - Chroma upsampling is sample replication (x·h/hmax integer
  *     division), the deterministic choice (no half-pel filters).
  *
  * A matching DC-only ENCODER ([[encodeDcOnly]]) exists for oracle/spec
  * use: minimal valid JFIF stream (DQT q00=8, SOF0 4:4:4, custom
  * canonical Huffman tables, differential DC + immediate EOB). Encoder
  * and decoder are implemented from the spec text independently of each
  * other's buffers, and the spec additionally cross-checks the decoder
  * against the JDK's own ImageIO JPEG codec (an independent
  * implementation) within IDCT tolerance on full-AC images.
  */
object JpegCodec {

  final case class JpegImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  // ---------------------------------------------------------------- decode

  def decode(b: Array[Byte]): Option[JpegImage] =
    try decodeImpl(b)
    catch { case _: Throwable => None } // malformed payloads must return, not throw

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def u16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  /** Canonical Huffman table per T.81 F.2.2.3 (MINCODE/MAXCODE/VALPTR). */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += bits(l)
          k += bits(l)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    /** −1 on invalid code / bitstream end. */
    def decode(r: BitReader): Int = {
      var code = 0
      var l = 0
      while (l < 16) {
        val bit = r.nextBit()
        if (bit < 0) return -1
        code = (code << 1) | bit
        l += 1
        if (maxcode(l) >= 0 && code <= maxcode(l)) {
          val idx = valptr(l) + code - mincode(l)
          if (idx >= vals.length) return -1
          return vals(idx)
        }
      }
      -1
    }
  }

  /** Entropy-segment bit reader: handles 0xFF00 stuffing; any other
    * marker ends the bit stream (RSTn are consumed explicitly by the
    * MCU loop via [[syncToRestart]]).
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= b.length) return -1
        var v = b(pos) & 0xFF
        pos += 1
        if (v == 0xFF) {
          if (pos >= b.length) return -1
          val m = b(pos) & 0xFF
          if (m == 0x00) pos += 1 // stuffed data byte 0xFF
          else { pos -= 1; return -1 } // real marker: entropy data ends
        }
        bitBuf = v; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    /** Byte-align and consume an expected RSTn marker; false if absent. */
    def syncToRestart(n: Int): Boolean = {
      bitCnt = 0
      if (pos + 1 >= b.length) return false
      if ((b(pos) & 0xFF) != 0xFF) return false
      val m = b(pos + 1) & 0xFF
      if (m != (0xD0 + n)) return false
      pos += 2
      true
    }
    /** Receive `n` raw bits MSB-first; −1 on bitstream end. */
    def receiveBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val bit = nextBit()
        if (bit < 0) return -1
        v = (v << 1) | bit
        i += 1
      }
      v
    }
    /** Receive `s` magnitude bits and sign-extend per T.81 F.2.2.1. */
    def receiveExtend(s: Int): Int = {
      if (s == 0) return 0
      val v = receiveBits(s)
      if (v < 0) return Int.MinValue
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }
  }

  /** T.81 zig-zag order: zigzag(k) = natural index of the k-th coded
    * coefficient.
    */
  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) · C(u) for the separable IDCT. */
  private val idctCos: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }

  /** Textbook IDCT + level shift + clamp (see determinism contract). */
  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          val cy = idctCos(v * 8 + y)
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) s += idctCos(u * 8 + x) * cy * c
            u += 1
          }
          v += 1
        }
        val px = Math.round(s / 4.0).toInt + 128
        out(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        x += 1
      }
      y += 1
    }
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Int = -1
    var acTable: Int = -1
  }

  private def decodeImpl(b: Array[Byte]): Option[JpegImage] = {
    if (b.length < 4 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return None
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var width = 0
    var height = 0
    var comps: Array[Component] = null
    var restartInterval = 0
    // progressive (SOF2) state: raw coefficients per component over the
    // MCU-padded block grid, accumulated across scans
    var progressive = false
    var coefStore: Array[Array[Int]] = null
    var progScans = 0
    var i = 2
    while (i + 2 <= b.length) {
      if (u8(b, i) != 0xFF) return None
      val marker = u8(b, i + 1)
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) {
        i += 2 // parameterless markers outside a scan
      } else if (marker == 0xD9) {
        // EOI: a progressive frame finishes HERE — every scan has
        // contributed its coefficient bits, dequant+IDCT once
        return if (progressive && progScans > 0)
          finishProgressive(b, width, height, comps, quant, coefStore)
        else None // baseline: EOI before any scan
      } else {
        if (i + 4 > b.length) return None
        val len = u16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val seg = i + 4 // first parameter byte
        val segEnd = i + 2 + len
        marker match {
          case 0xDB => // DQT: one or more tables
            var p = seg
            while (p < segEnd) {
              val pq = u8(b, p) >> 4
              val tq = u8(b, p) & 0x0F
              if (tq > 3 || pq > 1) return None
              val n = if (pq == 0) 64 else 128
              if (p + 1 + n > segEnd) return None
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) {
                t(zigzag(k)) =
                  if (pq == 0) u8(b, p + 1 + k)
                  else u16(b, p + 1 + 2 * k)
                k += 1
              }
              quant(tq) = t
              p += 1 + n
            }
          case 0xC4 => // DHT: one or more tables
            var p = seg
            while (p < segEnd) {
              val tc = u8(b, p) >> 4
              val th = u8(b, p) & 0x0F
              if (tc > 1 || th > 3 || p + 17 > segEnd) return None
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) {
                bits(l) = u8(b, p + l); total += bits(l); l += 1
              }
              if (total > 256 || p + 17 + total > segEnd) return None
              val vals = new Array[Int](total)
              var k = 0
              while (k < total) { vals(k) = u8(b, p + 17 + k); k += 1 }
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTables(th) = t else acTables(th) = t
              p += 17 + total
            }
          case 0xC0 | 0xC2 => // SOF0 baseline / SOF2 progressive
            if (comps != null) return None
            progressive = marker == 0xC2
            if (u8(b, seg) != 8) return None // bit depth
            height = u16(b, seg + 1)
            width = u16(b, seg + 3)
            val nf = u8(b, seg + 5)
            if (width <= 0 || height <= 0 ||
                width > (1 << 20) || height > (1 << 20) ||
                width.toLong * height > (1L << 26)) return None
            if (nf != 1 && nf != 3) return None
            if (seg + 6 + 3 * nf > segEnd) return None
            comps = Array.tabulate(nf) { c =>
              val o = seg + 6 + 3 * c
              val comp = Component(u8(b, o), u8(b, o + 1) >> 4,
                u8(b, o + 1) & 0x0F, u8(b, o + 2))
              if (comp.h < 1 || comp.h > 4 || comp.v < 1 || comp.v > 4 ||
                  comp.tq > 3) return None
              comp
            }
            if (progressive) {
              val hmax = comps.map(_.h).max
              val vmax = comps.map(_.v).max
              val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
              val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
              coefStore = comps.map(c =>
                new Array[Int](mcusX * c.h * mcusY * c.v * 64))
            }
          case 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA |
              0xCB | 0xCD | 0xCE | 0xCF =>
            return None // non-baseline/progressive frame types
          case 0xDD => // DRI
            if (len != 4) return None
            restartInterval = u16(b, seg)
          case 0xDA if !progressive => // SOS — the single baseline scan
            if (comps == null) return None
            val ns = u8(b, seg)
            if (ns != comps.length || seg + 1 + 2 * ns + 3 > segEnd) return None
            var c = 0
            while (c < ns) {
              val cs = u8(b, seg + 1 + 2 * c)
              val comp = comps.find(_.id == cs).getOrElse(return None)
              comp.dcTable = u8(b, seg + 2 + 2 * c) >> 4
              comp.acTable = u8(b, seg + 2 + 2 * c) & 0x0F
              if (comp.dcTable > 3 || comp.acTable > 3) return None
              c += 1
            }
            return decodeScan(b, segEnd, width, height, comps, quant,
              dcTables, acTables, restartInterval)
          case 0xDA => // SOS — one of several progressive scans
            if (comps == null) return None
            val ns = u8(b, seg)
            if (ns < 1 || ns > comps.length ||
                seg + 1 + 2 * ns + 3 > segEnd) return None
            val sel = new Array[Int](ns)
            var c = 0
            while (c < ns) {
              val cs = u8(b, seg + 1 + 2 * c)
              val ci = comps.indexWhere(_.id == cs)
              if (ci < 0) return None
              comps(ci).dcTable = u8(b, seg + 2 + 2 * c) >> 4
              comps(ci).acTable = u8(b, seg + 2 + 2 * c) & 0x0F
              if (comps(ci).dcTable > 3 || comps(ci).acTable > 3) return None
              sel(c) = ci
              c += 1
            }
            val ss = u8(b, seg + 1 + 2 * ns)
            val se = u8(b, seg + 2 + 2 * ns)
            val ahal = u8(b, seg + 3 + 2 * ns)
            val pos = decodeProgScan(b, segEnd, width, height, comps, sel,
              dcTables, acTables, coefStore, ss, se,
              ahal >> 4, ahal & 0x0F, restartInterval)
            if (pos < 0) return None
            progScans += 1
            i = pos
          case _ => () // APPn, COM, anything skippable
        }
        if (marker != 0xDA) i += 2 + len
      }
    }
    None // no SOS reached (or progressive stream missing its EOI)
  }

  private def decodeScan(b: Array[Byte], start: Int, width: Int,
      height: Int, comps: Array[Component], quant: Array[Array[Int]],
      dcTables: Array[HuffTable], acTables: Array[HuffTable],
      restartInterval: Int): Option[JpegImage] = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    // per-component plane covering the full MCU grid
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = comps.indices.map(c =>
      new Array[Int](planeW(c) * planeH(c))).toArray
    for (c <- comps.indices) {
      if (quant(comps(c).tq) == null) return None
      if (dcTables(comps(c).dcTable) == null) return None
      if (acTables(comps(c).acTable) == null) return None
    }
    val r = new BitReader(b, start)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val samples = new Array[Int](64)
    var rstIdx = 0
    var mcu = 0
    val mcuCount = mcusX * mcusY
    while (mcu < mcuCount) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!r.syncToRestart(rstIdx)) return None
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var c = 0
      while (c < comps.length) {
        val comp = comps(c)
        val q = quant(comp.tq)
        val dcT = dcTables(comp.dcTable)
        val acT = acTables(comp.acTable)
        var by = 0
        while (by < comp.v) {
          var bx = 0
          while (bx < comp.h) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val s = dcT.decode(r)
            if (s < 0 || s > 11) return None
            val diff = r.receiveExtend(s)
            if (diff == Int.MinValue) return None
            pred(c) += diff
            coef(0) = pred(c) * q(0)
            // AC
            var k = 1
            while (k < 64) {
              val rs = acT.decode(r)
              if (rs < 0) return None
              val run = rs >> 4
              val size = rs & 0x0F
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += run
                if (k > 63) return None
                val v = r.receiveExtend(size)
                if (v == Int.MinValue) return None
                coef(zigzag(k)) = v * q(zigzag(k))
                k += 1
              }
            }
            idctBlock(coef, samples)
            val ox = (mx * comp.h + bx) * 8
            val oy = (my * comp.v + by) * 8
            val pw = planeW(c)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(c)((oy + yy) * pw + ox + xx) = samples(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }
    planesToImage(planes, planeW, width, height, comps, hmax, vmax)
  }

  /** Shared tail of baseline and progressive decoding: chroma
    * upsampling (replication) + fixed-point color conversion from the
    * per-component sample planes.
    */
  private def planesToImage(planes: Array[Array[Int]], planeW: Array[Int],
      width: Int, height: Int, comps: Array[Component],
      hmax: Int, vmax: Int): Option[JpegImage] = {
    if (comps.length == 1) {
      val out = new Array[Byte](width * height)
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = planes(0)(y * pw + x).toByte
          x += 1
        }
        y += 1
      }
      Some(JpegImage(width, height, 1, out))
    } else {
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def sample(c: Int): Int = {
            val comp = comps(c)
            val sx = x * comp.h / hmax
            val sy = y * comp.v / vmax
            planes(c)(sy * planeW(c) + sx)
          }
          val yv = sample(0)
          val cb = sample(1) - 128
          val cr = sample(2) - 128
          val rr = yv + ((91881 * cr + 32768) >> 16)
          val gg = yv - ((22554 * cb + 46802 * cr + 32768) >> 16)
          val bb = yv + ((116130 * cb + 32768) >> 16)
          val o = (y * width + x) * 3
          out(o) = (if (rr < 0) 0 else if (rr > 255) 255 else rr).toByte
          out(o + 1) = (if (gg < 0) 0 else if (gg > 255) 255 else gg).toByte
          out(o + 2) = (if (bb < 0) 0 else if (bb > 255) 255 else bb).toByte
          x += 1
        }
        y += 1
      }
      Some(JpegImage(width, height, 3, out))
    }
  }

  // ------------------------------------------------- progressive (SOF2)

  /** Decode ONE progressive scan (T.81 G.2) into `coefStore`, raw
    * (pre-dequant) coefficient accumulation. Returns the byte position
    * of the next marker, or −1 on any malformation.
    *
    * Scan grammar: DC scans (Ss=Se=0) may interleave several
    * components in MCU order; AC scans (Ss≥1) are single-component
    * over that component's own block raster (NON-padded dims per
    * A.1.1). `Ah=0` scans establish coefficients at precision `Al`
    * (DC: Huffman-coded differences; AC: Huffman run-lengths + EOB
    * runs); `Ah>0` scans refine one bit per coefficient (DC: one raw
    * bit; AC: the correction-bit algorithm of G.1.2.3 — nonzero
    * history coefficients consume a correction bit wherever the scan
    * pointer passes, including inside EOB runs and zero runs).
    */
  private def decodeProgScan(b: Array[Byte], start: Int,
      width: Int, height: Int, comps: Array[Component], sel: Array[Int],
      dcTables: Array[HuffTable], acTables: Array[HuffTable],
      coefStore: Array[Array[Int]], ss: Int, se: Int, ah: Int, al: Int,
      restartInterval: Int): Int = {
    if (coefStore == null) return -1
    if (ss < 0 || se > 63 || ss > se || al > 13 || ah > 14) return -1
    if (ss == 0 && se != 0) return -1 // DC and AC never share a scan
    if (ss > 0 && sel.length != 1) return -1
    if (ah != 0 && ah != al + 1) return -1
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    val r = new BitReader(b, start)
    val pred = new Array[Int](comps.length)
    var eobrun = 0
    var rstIdx = 0
    val p1 = 1 << al
    val m1 = -1 << al

    def refineNonzero(coefs: Array[Int], idx: Int): Boolean = {
      val bit = r.nextBit()
      if (bit < 0) return false
      if (bit == 1 && (coefs(idx) & p1) == 0)
        coefs(idx) += (if (coefs(idx) >= 0) p1 else m1)
      true
    }

    def dcFirst(c: Int, base: Int): Boolean = {
      val t = dcTables(comps(c).dcTable)
      if (t == null) return false
      val s = t.decode(r)
      if (s < 0 || s > 11) return false
      val diff = r.receiveExtend(s)
      if (diff == Int.MinValue) return false
      pred(c) += diff
      coefStore(c)(base) = pred(c) << al
      true
    }

    def dcRefine(c: Int, base: Int): Boolean = {
      val bit = r.nextBit()
      if (bit < 0) return false
      if (bit == 1) coefStore(c)(base) |= p1
      true
    }

    def acFirst(c: Int, base: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      val t = acTables(comps(c).acTable)
      if (t == null) return false
      val coefs = coefStore(c)
      var k = ss
      while (k <= se) {
        val rs = t.decode(r)
        if (rs < 0) return false
        val run = rs >> 4
        val s = rs & 0x0F
        if (s != 0) {
          k += run
          if (k > se) return false
          val v = r.receiveExtend(s)
          if (v == Int.MinValue) return false
          coefs(base + zigzag(k)) = v << al
          k += 1
        } else if (run == 15) {
          k += 16 // ZRL
        } else {
          eobrun = (1 << run) - 1
          if (run > 0) {
            val ext = r.receiveBits(run)
            if (ext < 0) return false
            eobrun += ext
          }
          return true // EOB: this block is done
        }
      }
      true
    }

    def acRefine(c: Int, base: Int): Boolean = {
      val t = acTables(comps(c).acTable)
      if (t == null) return false
      val coefs = coefStore(c)
      var k = ss
      if (eobrun == 0) {
        var eob = false
        while (k <= se && !eob) {
          val rs = t.decode(r)
          if (rs < 0) return false
          var run = rs >> 4
          val s = rs & 0x0F
          var sVal = 0
          if (s != 0) {
            if (s != 1) return false // refinement codes ±1 only
            val bit = r.nextBit()
            if (bit < 0) return false
            sVal = if (bit == 1) p1 else m1
          } else if (run != 15) {
            eobrun = 1 << run
            if (run > 0) {
              val ext = r.receiveBits(run)
              if (ext < 0) return false
              eobrun += ext
            }
            eob = true // remaining coefficients handled below
          }
          if (!eob) {
            // advance past `run` zero-history coefficients, correcting
            // nonzero ones on the way; place the new ±1 at the stop
            var placed = false
            while (k <= se && !placed) {
              val idx = base + zigzag(k)
              if (coefs(idx) != 0) {
                if (!refineNonzero(coefs, idx)) return false
                k += 1
              } else if (run == 0) {
                if (sVal != 0) coefs(idx) = sVal
                k += 1
                placed = true
              } else {
                run -= 1
                k += 1
              }
            }
            if (!placed && sVal != 0) return false // ran off the band
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          val idx = base + zigzag(k)
          if (coefs(idx) != 0) {
            if (!refineNonzero(coefs, idx)) return false
          }
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    def blockOp(c: Int, base: Int): Boolean =
      if (ss == 0) { if (ah == 0) dcFirst(c, base) else dcRefine(c, base) }
      else { if (ah == 0) acFirst(c, base) else acRefine(c, base) }

    def restart(): Boolean = {
      if (!r.syncToRestart(rstIdx)) return false
      rstIdx = (rstIdx + 1) & 7
      java.util.Arrays.fill(pred, 0)
      eobrun = 0
      true
    }

    if (sel.length == 1) {
      // non-interleaved: the component's OWN block raster (A.1.1 dims),
      // one block per restart-counted MCU
      val c = sel(0)
      val comp = comps(c)
      val compW = (width * comp.h + hmax - 1) / hmax
      val compH = (height * comp.v + vmax - 1) / vmax
      val bw = (compW + 7) / 8
      val bh = (compH + 7) / 8
      val bwPad = mcusX * comp.h
      var blk = 0
      val total = bw * bh
      while (blk < total) {
        if (restartInterval > 0 && blk > 0 && blk % restartInterval == 0) {
          if (!restart()) return -1
        }
        val base = ((blk / bw) * bwPad + blk % bw) * 64
        if (!blockOp(c, base)) return -1
        blk += 1
      }
    } else {
      // interleaved DC scan over the MCU grid
      var mcu = 0
      val mcuCount = mcusX * mcusY
      while (mcu < mcuCount) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!restart()) return -1
        }
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var si = 0
        while (si < sel.length) {
          val c = sel(si)
          val comp = comps(c)
          val bwPad = mcusX * comp.h
          var by = 0
          while (by < comp.v) {
            var bx = 0
            while (bx < comp.h) {
              val base =
                ((my * comp.v + by) * bwPad + mx * comp.h + bx) * 64
              if (!blockOp(c, base)) return -1
              bx += 1
            }
            by += 1
          }
          si += 1
        }
        mcu += 1
      }
    }
    // the scan's entropy data ends at the next marker; skip to it
    var p = r.pos
    while (p + 1 < b.length &&
        !(u8(b, p) == 0xFF && u8(b, p + 1) != 0x00)) p += 1
    p
  }

  /** Progressive finish (at EOI): dequantize the accumulated raw
    * coefficients, IDCT every block of the padded grid, and run the
    * shared upsample/color-convert tail.
    */
  private def finishProgressive(b: Array[Byte], width: Int, height: Int,
      comps: Array[Component], quant: Array[Array[Int]],
      coefStore: Array[Array[Int]]): Option[JpegImage] = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = comps.indices.map(c =>
      new Array[Int](planeW(c) * planeH(c))).toArray
    val coef = new Array[Int](64)
    val samples = new Array[Int](64)
    var c = 0
    while (c < comps.length) {
      val q = quant(comps(c).tq)
      if (q == null) return None
      val bw = mcusX * comps(c).h
      val bh = mcusY * comps(c).v
      val pw = planeW(c)
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          val base = (by * bw + bx) * 64
          var k = 0
          while (k < 64) {
            coef(k) = coefStore(c)(base + k) * q(k)
            k += 1
          }
          idctBlock(coef, samples)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              planes(c)((by * 8 + yy) * pw + bx * 8 + xx) =
                samples(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
      c += 1
    }
    planesToImage(planes, planeW, width, height, comps, hmax, vmax)
  }

  // ---------------------------------------------------------------- encode

  /** Minimal valid baseline JPEG with ONLY DC coefficients — the
    * closed-form half of the q92 oracle pair. 4:4:4 (or grayscale),
    * quant table q00 = 8 so each decoded sample of block (bx, by) is
    * EXACTLY `dc(bx, by, comp) + 128` before color conversion (see the
    * determinism contract above). `dc` values must lie in [-128, 127].
    *
    * Dimensions need not be block-aligned — the decoder crops — but the
    * q92 oracle keeps them multiples of 8 so DuckDB sums whole blocks.
    */
  def encodeDcOnly(width: Int, height: Int, channels: Int,
      dc: (Int, Int, Int) => Int): Array[Byte] = {
    require(channels == 1 || channels == 3, "channels must be 1 or 3")
    require(width > 0 && height > 0)
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xFF); w8(m) }
    marker(0xD8) // SOI
    // DQT table 0: q00=8, the rest 16 (unused — AC never coded)
    marker(0xDB); w16(2 + 1 + 64); w8(0x00)
    var k = 0
    while (k < 64) { w8(if (k == 0) 8 else 16); k += 1 }
    // SOF0
    marker(0xC0); w16(8 + 3 * channels); w8(8); w16(height); w16(width)
    w8(channels)
    var c = 0
    while (c < channels) { w8(c + 1); w8(0x11); w8(0); c += 1 }
    // DHT: DC table 0 — twelve 4-bit codes for categories 0..11;
    //      AC table 0 — one 1-bit code for EOB
    marker(0xC4); w16(2 + (17 + 12) + (17 + 1))
    w8(0x00); (1 to 16).foreach(l => w8(if (l == 4) 12 else 0))
    (0 to 11).foreach(w8)
    w8(0x10); (1 to 16).foreach(l => w8(if (l == 1) 1 else 0))
    w8(0x00)
    // SOS
    marker(0xDA); w16(6 + 2 * channels); w8(channels)
    c = 0
    while (c < channels) { w8(c + 1); w8(0x00); c += 1 }
    w8(0); w8(63); w8(0)
    // entropy data: per MCU, per component: DC cat (4 bits) +
    // amplitude bits + EOB (1 bit); stuffing after 0xFF
    var bitBuf = 0
    var bitCnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = (bitBuf << 1) | ((v >> i) & 1)
        bitCnt += 1
        if (bitCnt == 8) {
          out.write(bitBuf & 0xFF)
          if ((bitBuf & 0xFF) == 0xFF) out.write(0x00)
          bitBuf = 0; bitCnt = 0
        }
        i -= 1
      }
    }
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    val pred = new Array[Int](channels)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        c = 0
        while (c < channels) {
          val v = dc(mx, my, c)
          require(v >= -128 && v <= 127, s"dc out of range: $v")
          val diff = v - pred(c)
          pred(c) = v
          val mag = math.abs(diff)
          val cat = 32 - Integer.numberOfLeadingZeros(mag) // 0 for diff=0
          putBits(cat, 4) // DC table: code for category c IS c, 4 bits
          if (cat > 0)
            putBits(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
          putBits(0, 1) // EOB
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    if (bitCnt > 0) { // pad final byte with 1s
      bitBuf = (bitBuf << (8 - bitCnt)) | ((1 << (8 - bitCnt)) - 1)
      out.write(bitBuf & 0xFF)
      if ((bitBuf & 0xFF) == 0xFF) out.write(0x00)
    }
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** PROGRESSIVE (SOF2) DC-only counterpart of [[encodeDcOnly]] — the
    * closed-form fixture for the progressive decoder: the same q00 = 8
    * exactness contract (decoded sample = dc + 128 before color
    * conversion), delivered through TWO successive-approximation DC
    * scans — a first scan (Ah=0, Al=1) Huffman-coding the differential
    * high bits `dc >> 1`, then a refinement scan (Ah=1, Al=0) sending
    * one raw low bit per block — so both progressive DC paths decode
    * on the oracle path. `dc` in [−128, 127]; two's-complement
    * reassembly `(dc >> 1) << 1 | (dc & 1)` is exact for negatives.
    */
  def encodeDcOnlyProgressive(width: Int, height: Int, channels: Int,
      dc: (Int, Int, Int) => Int): Array[Byte] = {
    require(channels == 1 || channels == 3, "channels must be 1 or 3")
    require(width > 0 && height > 0)
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xFF); w8(m) }
    var bitBuf = 0
    var bitCnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = (bitBuf << 1) | ((v >> i) & 1)
        bitCnt += 1
        if (bitCnt == 8) {
          out.write(bitBuf & 0xFF)
          if ((bitBuf & 0xFF) == 0xFF) out.write(0x00)
          bitBuf = 0; bitCnt = 0
        }
        i -= 1
      }
    }
    def flushBits(): Unit = if (bitCnt > 0) {
      bitBuf = (bitBuf << (8 - bitCnt)) | ((1 << (8 - bitCnt)) - 1)
      out.write(bitBuf & 0xFF)
      if ((bitBuf & 0xFF) == 0xFF) out.write(0x00)
      bitBuf = 0; bitCnt = 0
    }
    marker(0xD8) // SOI
    marker(0xDB); w16(2 + 1 + 64); w8(0x00) // DQT 0: q00=8
    var k = 0
    while (k < 64) { w8(if (k == 0) 8 else 16); k += 1 }
    marker(0xC2); w16(8 + 3 * channels); w8(8); w16(height); w16(width)
    w8(channels)
    var c = 0
    while (c < channels) { w8(c + 1); w8(0x11); w8(0); c += 1 }
    // DHT DC 0: twelve 4-bit codes, code for category i IS i
    marker(0xC4); w16(2 + 17 + 12)
    w8(0x00); (1 to 16).foreach(l => w8(if (l == 4) 12 else 0))
    (0 to 11).foreach(w8)
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    def dcScan(ah: Int, al: Int)(code: (Int, Int) => Unit): Unit = {
      marker(0xDA); w16(6 + 2 * channels); w8(channels)
      var ci = 0
      while (ci < channels) { w8(ci + 1); w8(0x00); ci += 1 }
      w8(0); w8(0); w8((ah << 4) | al)
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          ci = 0
          while (ci < channels) {
            code(dc(mx, my, ci), ci)
            ci += 1
          }
          mx += 1
        }
        my += 1
      }
      flushBits()
    }
    // scan 1: DC first, Al=1 — differential high bits
    val pred1 = new Array[Int](channels)
    dcScan(0, 1) { (v, ci) =>
      require(v >= -128 && v <= 127, s"dc out of range: $v")
      val v1 = v >> 1
      val diff = v1 - pred1(ci)
      pred1(ci) = v1
      val mag = math.abs(diff)
      val cat = 32 - Integer.numberOfLeadingZeros(mag)
      putBits(cat, 4)
      if (cat > 0)
        putBits(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
    }
    // scan 2: DC refinement, Ah=1 → Al=0 — one raw low bit per block
    dcScan(1, 0) { (v, _) => putBits(v & 1, 1) }
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** (n_pixels, sum_r, sum_g, sum_b, lum_min, lum_max) over decoded
    * pixels — same contract as the BMP/PNG stats (gray counts as all
    * three channels; luma = 299r + 587g + 114b).
    */
  def jpegStats(b: Array[Byte]): Option[(Long, Long, Long, Long, Int, Int)] =
    decode(b).map { img =>
      var sr = 0L; var sg = 0L; var sb = 0L
      var lmin = Int.MaxValue; var lmax = Int.MinValue
      val n = img.width.toLong * img.height
      var i = 0
      if (img.channels == 1) {
        while (i < img.pixels.length) {
          val g = img.pixels(i) & 0xFF
          sr += g; sg += g; sb += g
          val l = 1000 * g
          if (l < lmin) lmin = l
          if (l > lmax) lmax = l
          i += 1
        }
      } else {
        while (i < img.pixels.length) {
          val r = img.pixels(i) & 0xFF
          val g = img.pixels(i + 1) & 0xFF
          val bb = img.pixels(i + 2) & 0xFF
          sr += r; sg += g; sb += bb
          val l = 299 * r + 587 * g + 114 * bb
          if (l < lmin) lmin = l
          if (l > lmax) lmax = l
          i += 3
        }
      }
      (n, sr, sg, sb, lmin, lmax)
    }
}
