package graft.operators

import java.io.ByteArrayInputStream

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

class GifCodecSpec extends AnyFunSuite {

  private def palette(n: Int): Array[Int] =
    Array.tabulate(n)(i =>
      (((i * 37 + 13) % 256) << 16) | (((i * 59 + 7) % 256) << 8) |
        ((i * 83 + 29) % 256))

  private def idxFn(f: Int, x: Int, y: Int, n: Int): Int =
    (x * 7 + y * 11 + f * 23 + x * y) % n

  test("LZW round-trips random index streams (incl. KwKwK + width growth)") {
    val rnd = new Random(42)
    for (trial <- 0 until 30) {
      val min = 2 + rnd.nextInt(6)
      val n = 1 << min
      val len = 1 + rnd.nextInt(9000)
      val idx = trial % 3 match {
        case 0 => Array.fill(len)(rnd.nextInt(n))
        case 1 => Array.tabulate(len)(i => i % 2) // ababab → KwKwK
        case _ => Array.tabulate(len)(i => (i / 7) % n) // runs
      }
      val enc = GifCodec.lzwEncode(idx, min)
      val dec = GifCodec.lzwDecode(enc, min, len).get
      assert(dec.length === len, s"trial $trial")
      assert(dec.map(_ & 0xFF).toSeq === idx.toSeq, s"trial $trial min=$min")
    }
  }

  test("LZW survives a full-dictionary reset (4096 codes)") {
    val rnd = new Random(7)
    val idx = Array.fill(120000)(rnd.nextInt(16))
    val enc = GifCodec.lzwEncode(idx, 4)
    val dec = GifCodec.lzwDecode(enc, 4, idx.length).get
    assert(dec.map(_ & 0xFF).toSeq === idx.toSeq)
  }

  test("encode → decode round-trips pixels exactly") {
    for ((w, h, np) <- Seq((11, 7, 16), (32, 24, 64), (64, 48, 256))) {
      val pal = palette(np)
      val b = GifCodec.gifEncode(w, h, pal, 1, (f, x, y) => idxFn(f, x, y, np))
      val im = GifCodec.gifDecode(b).get
      assert(im.width === w && im.height === h && im.frames.size === 1)
      for (y <- 0 until h; x <- 0 until w)
        assert(im.frames.head(y * w + x) === pal(idxFn(0, x, y, np)),
          s"($x,$y) ${w}x$h")
    }
  }

  test("interlaced encode → decode round-trips pixels exactly") {
    val (w, h, np) = (23, 17, 32)
    val pal = palette(np)
    val b = GifCodec.gifEncode(w, h, pal, 1,
      (f, x, y) => idxFn(f, x, y, np), interlaced = true)
    val im = GifCodec.gifDecode(b).get
    for (y <- 0 until h; x <- 0 until w)
      assert(im.frames.head(y * w + x) === pal(idxFn(0, x, y, np)))
  }

  test("ImageIO independently decodes our encoder's bytes to the same pixels") {
    for (interlaced <- Seq(false, true)) {
      val (w, h, np) = (29, 13, 64)
      val pal = palette(np)
      val b = GifCodec.gifEncode(w, h, pal, 1,
        (f, x, y) => idxFn(f, x, y, np), interlaced = interlaced)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(b))
      assert(img != null, "ImageIO rejected our GIF")
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xFFFFFF) === pal(idxFn(0, x, y, np)),
          s"interlaced=$interlaced ($x,$y)")
    }
  }

  test("our decoder reads ImageIO's independently-written GIF bytes") {
    val (w, h) = (21, 15)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, palette(64)(idxFn(0, x, y, 64)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val im = GifCodec.gifDecode(bos.toByteArray).get
    assert(im.width === w && im.height === h)
    for (y <- 0 until h; x <- 0 until w)
      assert(im.frames.head(y * w + x) === (img.getRGB(x, y) & 0xFFFFFF))
  }

  test("animated GIF: frames decode in order; frameStats samples every 2nd") {
    val (w, h, np, nf) = (9, 6, 16, 5)
    val pal = palette(np)
    val b = GifCodec.gifEncode(w, h, pal, nf, (f, x, y) => idxFn(f, x, y, np))
    val im = GifCodec.gifDecode(b).get
    assert(im.frames.size === nf)
    for (f <- 0 until nf; y <- 0 until h; x <- 0 until w)
      assert(im.frames(f)(y * w + x) === pal(idxFn(f, x, y, np)), s"f=$f")
    val stats = GifCodec.frameStats(b, every = 2).get
    assert(stats.map(_._1) === Seq(0L, 2L, 4L))
    stats.foreach { case (f, n, sr, _, _, lmin, lmax) =>
      assert(n === w.toLong * h)
      val rs = for (y <- 0 until h; x <- 0 until w)
        yield (pal(idxFn(f.toInt, x, y, np)) >> 16) & 0xFF
      assert(sr === rs.map(_.toLong).sum)
      val lums = for (y <- 0 until h; x <- 0 until w) yield {
        val p = pal(idxFn(f.toInt, x, y, np))
        299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) + 114 * (p & 0xFF)
      }
      assert(lmin === lums.min && lmax === lums.max)
    }
  }

  test("GIF re-encode of the same pixels yields the bit-identical embedding") {
    // the q102 lossless-re-encode invariant extended to the 4th
    // container: identical pixels ⇒ identical perceptual features,
    // regardless of BMP vs GIF byte-level representation
    val (w, h, np) = (24, 16, 64)
    val pal = palette(np)
    val gif = GifCodec.gifEncode(w, h, pal, 1, (f, x, y) => idxFn(f, x, y, np))
    val bmp = Multimodal.MediaCodec.bmpEncode(w, h,
      (x, y) => pal(idxFn(0, x, y, np)))
    val eg = Multimodal.MediaCodec.imageEmbedding(gif).get
    val eb = Multimodal.MediaCodec.imageEmbedding(bmp).get
    assert(eg.toSeq === eb.toSeq)
  }

  test("fuzz: mutated/truncated GIF bytes never throw") {
    val rnd = new Random(20260814)
    val base = GifCodec.gifEncode(16, 12, palette(32), 3,
      (f, x, y) => idxFn(f, x, y, 32))
    for (_ <- 0 until 4000) {
      val mutated = base.clone()
      val nMut = 1 + rnd.nextInt(8)
      for (_ <- 0 until nMut)
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      val cut =
        if (rnd.nextBoolean()) mutated.take(rnd.nextInt(mutated.length + 1))
        else mutated
      GifCodec.gifDecode(cut) // must return, never throw
      GifCodec.frameStats(cut, 2)
    }
    for (_ <- 0 until 500) {
      val junk = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      assert(GifCodec.gifDecode(junk).isEmpty || junk.length >= 13)
    }
  }
}
