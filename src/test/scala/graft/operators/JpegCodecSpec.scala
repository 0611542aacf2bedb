package graft.operators

import graft.SparkSpec

/** Baseline-JPEG codec verification on three independent axes:
  *
  * 1. DC-only EXACTNESS: [[JpegCodec.encodeDcOnly]] streams are decoded
  *    by [[JpegCodec.decode]] to the closed-form pixels the determinism
  *    contract promises (`dc + 128` per block, then the documented
  *    fixed-point color conversion) — the property the q92 oracle rides.
  * 2. INDEPENDENT implementation cross-check: images with full AC
  *    content are encoded by the JDK's own ImageIO JPEG codec (an
  *    implementation we share no code with) and decoded by ours; pixels
  *    must agree within IDCT tolerance. ImageIO's decoder also reads
  *    OUR encoder's streams back (container validity both ways).
  * 3. ROBUSTNESS: mutated/truncated containers return None, never throw
  *    (they run on untrusted payloads inside executor tasks).
  */
class JpegCodecSpec extends SparkSpec {

  private def rgbFromDc(yv: Int, cbv: Int, crv: Int): (Int, Int, Int) = {
    val y = yv + 128; val cb = cbv; val cr = crv
    def cl(v: Int) = if (v < 0) 0 else if (v > 255) 255 else v
    (cl(y + ((91881 * cr + 32768) >> 16)),
      cl(y - ((22554 * cb + 46802 * cr + 32768) >> 16)),
      cl(y + ((116130 * cb + 32768) >> 16)))
  }

  test("DC-only color round-trip is bit-exact against the closed form") {
    val w = 24; val h = 16 // 3x2 blocks
    def dc(bx: Int, by: Int, c: Int): Int =
      ((bx * 37 + by * 59 + c * 71) % 256) - 128
    val bytes = JpegCodec.encodeDcOnly(w, h, 3, dc)
    val img = JpegCodec.decode(bytes).getOrElse(fail("decode failed"))
    assert(img.width === w && img.height === h && img.channels === 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (er, eg, eb) = rgbFromDc(
        dc(x / 8, y / 8, 0), dc(x / 8, y / 8, 1), dc(x / 8, y / 8, 2))
      val o = (y * w + x) * 3
      assert((img.pixels(o) & 0xFF) === er, s"r at ($x,$y)")
      assert((img.pixels(o + 1) & 0xFF) === eg, s"g at ($x,$y)")
      assert((img.pixels(o + 2) & 0xFF) === eb, s"b at ($x,$y)")
    }
  }

  test("DC-only grayscale round-trip, non-block-aligned dims (crop path)") {
    val w = 13; val h = 10 // 2x2 block grid cropped
    def dc(bx: Int, by: Int, c: Int): Int = bx * 50 + by * 30 - 60
    val bytes = JpegCodec.encodeDcOnly(w, h, 1, dc)
    val img = JpegCodec.decode(bytes).getOrElse(fail("decode failed"))
    assert(img.width === w && img.height === h && img.channels === 1)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.pixels(y * w + x) & 0xFF) === dc(x / 8, y / 8, 0) + 128,
        s"gray at ($x,$y)")
  }

  test("DC differential coding: large swings across blocks survive") {
    // extremes exercise category 9 diffs and the predictor chain
    val seq = Array(-128, 127, -128, 0, 127, -1)
    val bytes = JpegCodec.encodeDcOnly(48, 8, 1,
      (bx, _, _) => seq(bx))
    val img = JpegCodec.decode(bytes).getOrElse(fail("decode failed"))
    for (bx <- 0 until 6)
      assert((img.pixels(bx * 8) & 0xFF) === seq(bx) + 128, s"block $bx")
  }

  private def imageIoJpeg(w: Int, h: Int,
      rgb: (Int, Int) => Int, gray: Boolean = false): Array[Byte] = {
    val t = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_INT_RGB
    val img = new java.awt.image.BufferedImage(w, h, t)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "ImageIO refused")
    bos.toByteArray
  }

  test("decodes the JDK ImageIO encoder's output within IDCT tolerance") {
    // smooth gradient: JPEG-friendly, so quantization error stays small
    // and implementation agreement is tight; tolerance covers different
    // IDCT/upsampling choices between two correct decoders
    val w = 32; val h = 24
    def px(x: Int, y: Int): Int = {
      val r = 40 + x * 4; val g = 30 + y * 6; val b = 120
      (r << 16) | (g << 8) | b
    }
    val bytes = imageIoJpeg(w, h, px)
    val img = JpegCodec.decode(bytes).getOrElse(fail("decode failed"))
    assert(img.width === w && img.height === h && img.channels === 3)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rp = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      maxDiff = math.max(maxDiff, math.abs(((rp >> 16) & 0xFF) - (img.pixels(o) & 0xFF)))
      maxDiff = math.max(maxDiff, math.abs(((rp >> 8) & 0xFF) - (img.pixels(o + 1) & 0xFF)))
      maxDiff = math.max(maxDiff, math.abs((rp & 0xFF) - (img.pixels(o + 2) & 0xFF)))
    }
    // 8 covers the two legitimate implementation choices that differ:
    // ImageIO writes 4:2:0 and its decoder upsamples chroma with a
    // triangular filter (we replicate — both spec-valid), plus IDCT
    // rounding; systematic bugs (block placement, Huffman, dequant)
    // show up as 50+ here, not single digits
    assert(maxDiff <= 8,
      s"diverges from the JDK's independent decoder by $maxDiff")
  }

  test("decodes ImageIO grayscale output (1-component scan)") {
    val w = 16; val h = 16
    // write/read the raster DIRECTLY: TYPE_BYTE_GRAY's setRGB/getRGB
    // round-trip through sRGB<->linear-gray conversion, which would make
    // a correct decoder look ~70 off (the JPEG stores the raw samples)
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, x * 8 + y * 8)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "jpg", bos))
    val bytes = bos.toByteArray
    val img = JpegCodec.decode(bytes).getOrElse(fail("decode failed"))
    assert(img.channels === 1)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff,
        math.abs(ref.getRaster.getSample(x, y, 0) -
          (img.pixels(y * w + x) & 0xFF)))
    assert(maxDiff <= 2, s"gray diverges by $maxDiff")
  }

  test("ImageIO reads our DC-only streams back (container validity)") {
    val bytes = JpegCodec.encodeDcOnly(16, 8, 3,
      (bx, by, c) => (bx * 40 + by * 20 + c * 10) - 60)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(back != null, "JDK decoder rejected our stream")
    assert(back.getWidth === 16 && back.getHeight === 8)
    // and the JDK agrees with our own decode within IDCT tolerance
    val ours = JpegCodec.decode(bytes).get
    for (y <- 0 until 8; x <- 0 until 16) {
      val rp = back.getRGB(x, y); val o = (y * 16 + x) * 3
      assert(math.abs(((rp >> 16) & 0xFF) - (ours.pixels(o) & 0xFF)) <= 2,
        s"JDK-vs-ours r at ($x,$y)")
    }
  }

  // --- progressive (SOF2) ---

  test("progressive DC-only round-trip is bit-exact against the closed " +
      "form and equals the baseline encoding") {
    val w = 24; val h = 16
    def dc(bx: Int, by: Int, c: Int): Int =
      ((bx * 37 + by * 59 + c * 71) % 256) - 128
    val prog = JpegCodec.encodeDcOnlyProgressive(w, h, 3, dc)
    assert(prog.indices.dropRight(1).exists(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC2),
      "fixture is not SOF2")
    val img = JpegCodec.decode(prog).getOrElse(fail("progressive decode"))
    assert(img.width === w && img.height === h && img.channels === 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (er, eg, eb) = rgbFromDc(
        dc(x / 8, y / 8, 0), dc(x / 8, y / 8, 1), dc(x / 8, y / 8, 2))
      val o = (y * w + x) * 3
      assert((img.pixels(o) & 0xFF) === er, s"r at ($x,$y)")
      assert((img.pixels(o + 1) & 0xFF) === eg, s"g at ($x,$y)")
      assert((img.pixels(o + 2) & 0xFF) === eb, s"b at ($x,$y)")
    }
    // two-scan successive approximation must land on the exact pixels
    // the single-scan baseline stream produces
    val base = JpegCodec.decode(JpegCodec.encodeDcOnly(w, h, 3, dc)).get
    assert(img.pixels.toSeq === base.pixels.toSeq)
  }

  test("progressive DC-only grayscale, negative DCs and crop dims") {
    val w = 13; val h = 10
    def dc(bx: Int, by: Int, c: Int): Int = bx * 50 + by * 30 - 97
    val img = JpegCodec.decode(
      JpegCodec.encodeDcOnlyProgressive(w, h, 1, dc))
      .getOrElse(fail("decode failed"))
    for (y <- 0 until h; x <- 0 until w)
      assert((img.pixels(y * w + x) & 0xFF) === dc(x / 8, y / 8, 0) + 128,
        s"gray at ($x,$y)")
  }

  private def imageIoProgressive(img: java.awt.image.BufferedImage)
      : Array[Byte] = {
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose()
    ios.close()
    val bytes = bos.toByteArray
    assert(bytes.indices.dropRight(1).exists(i =>
      (bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xC2),
      "JDK did not write a progressive (SOF2) stream")
    bytes
  }

  test("decodes JDK ImageIO PROGRESSIVE color output within tolerance") {
    // the real multi-scan shape: interleaved DC first + refinements,
    // per-component AC first scans with EOB runs, AC refinement passes
    val w = 32; val h = 24
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 40 + x * 4; val g = 30 + y * 6; val b = 120
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = imageIoProgressive(src)
    val img = JpegCodec.decode(bytes).getOrElse(fail("decode failed"))
    assert(img.width === w && img.height === h && img.channels === 3)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rp = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      maxDiff = math.max(maxDiff,
        math.abs(((rp >> 16) & 0xFF) - (img.pixels(o) & 0xFF)))
      maxDiff = math.max(maxDiff,
        math.abs(((rp >> 8) & 0xFF) - (img.pixels(o + 1) & 0xFF)))
      maxDiff = math.max(maxDiff,
        math.abs((rp & 0xFF) - (img.pixels(o + 2) & 0xFF)))
    }
    assert(maxDiff <= 8,
      s"progressive diverges from the JDK decoder by $maxDiff")
  }

  test("decodes JDK ImageIO PROGRESSIVE grayscale (non-interleaved DC)") {
    val w = 24; val h = 24
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, (x * 7 + y * 5) % 256)
    val bytes = imageIoProgressive(src)
    val img = JpegCodec.decode(bytes).getOrElse(fail("decode failed"))
    assert(img.channels === 1)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff,
        math.abs(ref.getRaster.getSample(x, y, 0) -
          (img.pixels(y * w + x) & 0xFF)))
    assert(maxDiff <= 2, s"gray progressive diverges by $maxDiff")
  }

  test("progressive streams survive mutation/truncation fuzz") {
    val own = JpegCodec.encodeDcOnlyProgressive(24, 16, 3,
      (bx, by, c) => bx + by + c)
    val src = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      src.setRGB(x, y, (x * 16) << 16 | (y * 16) << 8 | 128)
    val jdk = imageIoProgressive(src)
    val rnd = new scala.util.Random(13)
    for (good <- Seq(own, jdk)) {
      assert(JpegCodec.decode(good).nonEmpty)
      for (len <- 0 until good.length) JpegCodec.decode(good.take(len))
      for (_ <- 0 until 2000) {
        val m = good.clone()
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        JpegCodec.decode(m) // must not throw
      }
    }
  }

  test("jpegStats matches hand-computed sums on a DC-only image") {
    // 2 blocks of 64 px each: gray 100 and gray 228
    val bytes = JpegCodec.encodeDcOnly(16, 8, 1,
      (bx, _, _) => if (bx == 0) -28 else 100)
    val (n, sr, sg, sb, lmin, lmax) = JpegCodec.jpegStats(bytes).get
    assert(n === 128L)
    assert(sr === 64L * 100 + 64L * 228)
    assert(sr === sg && sg === sb)
    assert(lmin === 100000 && lmax === 228000)
  }

  test("malformed/truncated/adversarial payloads return None, never throw") {
    val good = JpegCodec.encodeDcOnly(24, 16, 3, (bx, by, c) => bx + by + c)
    assert(JpegCodec.decode(good).nonEmpty)
    // systematic truncation at every length: must never throw, and any
    // cut BEFORE the entropy data (all container structure) must reject;
    // cuts inside the trailing pad/EOI may legitimately still decode
    val sosAt = good.indices.dropRight(1)
      .find(i => (good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xDA)
      .getOrElse(fail("no SOS in our own stream"))
    val entropyStart = sosAt + 2 + (((good(sosAt + 2) & 0xFF) << 8) |
      (good(sosAt + 3) & 0xFF))
    for (len <- 0 until good.length) {
      val r = JpegCodec.decode(good.take(len))
      if (len <= entropyStart)
        assert(r.isEmpty, s"decoded from structure-only prefix $len")
    }
    // single-byte mutations across the whole stream must never throw
    // (some may still decode — a flipped entropy bit is a different
    // valid image; container-structure flips must yield None)
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 2000) {
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      JpegCodec.decode(m) // must not throw
    }
    // dimension bomb: SOF declares a huge frame with no matching data
    val bomb = good.clone()
    // SOF0 height bytes live right after FFC0 len(2) prec(1)
    val sofAt = {
      var i = 2
      var at = -1
      while (at < 0 && i + 4 < bomb.length) {
        if ((bomb(i) & 0xFF) == 0xFF && (bomb(i + 1) & 0xFF) == 0xC0) at = i
        else i += 1
      }
      at
    }
    assert(sofAt > 0)
    bomb(sofAt + 5) = 0x7F.toByte // height := 0x7Fxx
    bomb(sofAt + 6) = 0xFF.toByte
    assert(JpegCodec.decode(bomb).isEmpty, "dimension bomb accepted")
    assert(JpegCodec.decode("not a jpeg".getBytes).isEmpty)
    assert(JpegCodec.decode(Array[Byte]()).isEmpty)
  }
}
