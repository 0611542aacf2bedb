package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.fromBinaryColumn(
    Seq((1L, "abcdef"), (2L, "xy")).toDF("id", "payload"),
    "id", "payload", "image")

  test("fromBinaryColumn builds the envelope with bytes intact") {
    val rows = media.collect().sortBy(_.media_id)
    assert(rows.map(_.media_id).toSeq === Seq(1L, 2L))
    assert(new String(rows(0).bytes) === "abcdef")
    assert(rows(0).kind === "image")
  }

  test("decodeMeta emits deterministic metadata with byte counts") {
    val metas = Multimodal.decodeMeta(media).collect().sortBy(_.media_id)
    assert(metas.map(_.n_bytes).toSeq === Seq(6L, 2L))
    assert(metas.forall(_.width.isDefined)) // image kind fills dimensions
    val again = Multimodal.decodeMeta(media).collect().sortBy(_.media_id)
    assert(metas.map(_.checksum).toSeq === again.map(_.checksum).toSeq)
  }

  test("extractFeatures yields fixed-dim deterministic embeddings") {
    val f = Multimodal.extractFeatures(media, dim = 8).collect()
    assert(f.length === 2)
    f.foreach(r => assert(r.getSeq[Float](1).length === 8))
  }

  test("resize maps payloads partition-wise and stamps target dims") {
    val resized = Multimodal.resize(media, 640, 480).collect()
    assert(resized.forall(_.mime.endsWith(";w=640;h=480")))
    assert(resized.forall(r => r.bytes.nonEmpty))
  }

  // --- real container-header parsing (no external codec libs) ---

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    (Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
      ++ be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h)
      ++ Array[Byte](8, 6, 0, 0, 0))
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
    (Array(0xFF, 0xD8).map(_.toByte) // SOI
      ++ Array(0xFF, 0xE0).map(_.toByte) ++ be16(16) // APP0, len 16
      ++ "JFIF".getBytes ++ Array.fill[Byte](10)(0)
      ++ Array(0xFF, 0xC0).map(_.toByte) ++ be16(17) // SOF0, len 17
      ++ Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array.fill[Byte](10)(0))
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] = {
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    "GIF89a".getBytes ++ le16(w) ++ le16(h) ++ Array[Byte](0, 0, 0)
  }

  /** One WAV header builder for every test: zero-filled data of
    * `dataLen` bytes by default, or explicit 16-bit samples.
    */
  private def wavContainer(rate: Int, channels: Int, blockAlign: Int,
      data: Array[Byte]): Array[Byte] = {
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
      (v >> 24).toByte)
    ("RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes
      ++ "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels)
      ++ le32(rate) ++ le32(rate * blockAlign) ++ le16(blockAlign) ++ le16(16)
      ++ "data".getBytes ++ le32(data.length) ++ data)
  }

  private def wavBytes(rate: Int, blockAlign: Int, dataLen: Int): Array[Byte] =
    wavContainer(rate, channels = 2, blockAlign, Array.fill[Byte](dataLen)(0))

  test("decodeMeta parses real PNG/JPEG/GIF headers for dimensions") {
    assert(Multimodal.MediaCodec.imageDims(pngBytes(640, 360)) === Some((640, 360)))
    assert(Multimodal.MediaCodec.imageDims(jpegBytes(1024, 768)) === Some((1024, 768)))
    assert(Multimodal.MediaCodec.imageDims(gifBytes(320, 200)) === Some((320, 200)))
    assert(Multimodal.MediaCodec.imageDims("not an image".getBytes) === None)
    // end to end through the Spark dataflow
    val df = Seq((1L, pngBytes(640, 360)), (2L, jpegBytes(1024, 768)))
      .toDF("id", "payload")
    val metas = Multimodal.decodeMeta(
        Multimodal.fromBinaryColumn(df, "id", "payload", "image"))
      .collect().sortBy(_.media_id)
    assert(metas(0).width === Some(640) && metas(0).height === Some(360))
    assert(metas(1).width === Some(1024) && metas(1).height === Some(768))
  }

  private def wavWithSamples(rate: Int, samples: Seq[Short]): Array[Byte] =
    wavContainer(rate, channels = 1, blockAlign = 2,
      samples.toArray.flatMap(s =>
        Array(s.toByte, ((s & 0xFFFF) >> 8).toByte)))

  test("pcmStats decodes real 16-bit samples: n, peak, sum of squares") {
    val samples = Seq[Short](0, 1000, -2000, 32767, -32768, 5)
    val got = Multimodal.MediaCodec.pcmStats(wavWithSamples(8000, samples))
    val expSumSq = samples.map(s => s.toLong * s).sum
    assert(got === Some((6L, 32768, expSumSq)))
    // non-WAV and truncated payloads never throw
    assert(Multimodal.MediaCodec.pcmStats("nope".getBytes) === None)
    assert(Multimodal.MediaCodec.pcmStats(
      wavWithSamples(8000, samples).dropRight(3)) === None)
  }

  test("pcmStats rejects truncated fmt chunks and non-integer-PCM formats") {
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
      (v >> 24).toByte)
    // fmt chunk declares only 2 bytes — bits-per-sample must NOT be
    // read from the neighboring chunk's bytes
    val truncatedFmt =
      ("RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes
        ++ "fmt ".getBytes ++ le32(2) ++ le16(1)
        ++ "data".getBytes ++ le32(4) ++ Array.fill[Byte](4)(1))
    assert(Multimodal.MediaCodec.pcmStats(truncatedFmt) === None)
    // audioFormat 3 = IEEE float: 16-bit integer decode would be garbage
    val floatFmt =
      ("RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes
        ++ "fmt ".getBytes ++ le32(16) ++ le16(3) ++ le16(1)
        ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
        ++ "data".getBytes ++ le32(4) ++ Array.fill[Byte](4)(1))
    assert(Multimodal.MediaCodec.pcmStats(floatFmt) === None)
  }

  test("audioStats flows PCM statistics through the Spark dataflow") {
    val quiet = wavWithSamples(8000, Seq[Short](10, -10, 10, -10))
    val loud = wavWithSamples(8000, Seq[Short](30000, -30000))
    val df = Seq((1L, quiet), (2L, loud), (3L, "not audio".getBytes))
      .toDF("id", "p")
    val got = Multimodal.audioStats(
        Multimodal.fromBinaryColumn(df, "id", "p", "audio"))
      .orderBy("media_id").collect()
    assert(got(0).getLong(1) === 4L && got(0).getInt(2) === 10)
    assert(got(0).getLong(3) === 400L)
    assert(got(1).getLong(1) === 2L && got(1).getInt(2) === 30000)
    assert(got(2).isNullAt(1) && got(2).isNullAt(2) && got(2).isNullAt(3))
  }

  test("decodeMeta parses real WAV headers for rate and frame count") {
    val b = wavBytes(rate = 44100, blockAlign = 4, dataLen = 400)
    assert(Multimodal.MediaCodec.wavInfo(b) === Some((44100, 100)))
    val meta = Multimodal.decodeMeta(Multimodal.fromBinaryColumn(
        Seq((5L, b)).toDF("id", "p"), "id", "p", "audio"))
      .collect()(0)
    assert(meta.sample_rate === Some(44100) && meta.n_frames === Some(100))
  }

  test("sampleFrames explodes stride-spaced frame indices") {
    val audio = Multimodal.fromBinaryColumn(
      Seq((9L, "payload")).toDF("id", "p"), "id", "p", "audio")
    val meta = Multimodal.decodeMeta(audio)
    val n = meta.collect()(0).n_frames.get
    val frames = Multimodal.sampleFrames(meta, stride = 100).collect()
    assert(frames.length === (n + 99) / 100)
    assert(frames.forall(_.getLong(0) === 9L))
  }

  /** Minimal valid 24-bit BMP; pixels(y)(x) = 0xRRGGBB, row 0 = TOP row.
    * `bottomUp = true` writes the standard positive-height layout.
    */
  private def bmpBytes(pixels: Seq[Seq[Int]], bottomUp: Boolean = true)
      : Array[Byte] = {
    val h = pixels.length
    val w = pixels.head.length
    val stride = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + stride * h)
    def putLe32(at: Int, v: Int): Unit = (0 to 3).foreach(i =>
      out(at + i) = (v >> (8 * i)).toByte)
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    putLe32(2, out.length); putLe32(10, 54); putLe32(14, 40)
    putLe32(18, w); putLe32(22, if (bottomUp) h else -h)
    out(26) = 1; out(28) = 24
    for (y <- 0 until h; x <- 0 until w) {
      val row = if (bottomUp) h - 1 - y else y
      val p = 54 + row * stride + x * 3
      val px = pixels(y)(x)
      out(p) = (px & 0xFF).toByte
      out(p + 1) = ((px >> 8) & 0xFF).toByte
      out(p + 2) = ((px >> 16) & 0xFF).toByte
    }
    out
  }

  test("bmpStats decodes real pixels: exact channel sums and lum range") {
    // 2x2: red, green / blue, white — sums and luminances by hand
    val img = bmpBytes(Seq(Seq(0xFF0000, 0x00FF00), Seq(0x0000FF, 0xFFFFFF)))
    val (n, sr, sg, sb, lmin, lmax) = Multimodal.MediaCodec.bmpStats(img).get
    assert(n === 4L)
    assert((sr, sg, sb) === (510L, 510L, 510L))
    assert(lmin === 114 * 255) // pure blue is the darkest
    assert(lmax === 1000 * 255) // white
  }

  test("bmpStats reads top-down and bottom-up layouts identically") {
    val px = Seq(Seq(0x102030, 0x405060), Seq(0x708090, 0xA0B0C0))
    val up = Multimodal.MediaCodec.bmpStats(bmpBytes(px, bottomUp = true))
    val down = Multimodal.MediaCodec.bmpStats(bmpBytes(px, bottomUp = false))
    assert(up === down)
    // and pixel ACCESS (not just sums) agrees with the source matrix
    val img = Multimodal.MediaCodec.bmpDecode(bmpBytes(px)).get
    assert(img.rgb(1, 0) === 0x405060)
    assert(img.rgb(0, 1) === 0x708090)
  }

  test("bmpResize nearest-neighbor: exact pixels at a 2x upscale") {
    val px = Seq(Seq(0xFF0000, 0x00FF00), Seq(0x0000FF, 0xFFFFFF))
    val out = Multimodal.MediaCodec.bmpResize(bmpBytes(px), 4, 4).get
    val img = Multimodal.MediaCodec.bmpDecode(out).get
    assert(img.width === 4 && img.height === 4)
    // each source pixel becomes a 2x2 block
    for (y <- 0 until 4; x <- 0 until 4)
      assert(img.rgb(x, y) === px(y / 2)(x / 2), s"pixel ($x,$y)")
  }

  test("bmpResize downscale keeps exact source pixels (no blending)") {
    val px = Seq.tabulate(4, 4)((y, x) => (y * 4 + x) * 0x010101)
    val out = Multimodal.MediaCodec.bmpResize(bmpBytes(px), 2, 2).get
    val img = Multimodal.MediaCodec.bmpDecode(out).get
    // nearest mapping: dest (x,y) <- src (x*4/2, y*4/2) = (2x, 2y)
    for (y <- 0 until 2; x <- 0 until 2)
      assert(img.rgb(x, y) === px(2 * y)(2 * x))
  }

  test("bmpDecode rejects malformed containers instead of throwing") {
    val good = bmpBytes(Seq(Seq(0x123456)))
    assert(Multimodal.MediaCodec.bmpDecode(good).isDefined)
    val truncated = good.take(40)
    assert(Multimodal.MediaCodec.bmpDecode(truncated).isEmpty)
    val bpp8 = good.clone(); bpp8(28) = 8
    assert(Multimodal.MediaCodec.bmpDecode(bpp8).isEmpty)
    val compressed = good.clone(); compressed(30) = 1
    assert(Multimodal.MediaCodec.bmpDecode(compressed).isEmpty)
    val overrun = good.clone(); overrun(18) = 100 // width lies about data
    assert(Multimodal.MediaCodec.bmpDecode(overrun).isEmpty)
    assert(Multimodal.MediaCodec.bmpStats("not an image".getBytes).isEmpty)
  }

  test("imageStats flows BMP pixel statistics through the Spark dataflow") {
    val rows = Seq(
      (1L, bmpBytes(Seq(Seq(0xFF0000, 0x00FF00), Seq(0x0000FF, 0xFFFFFF)))),
      (2L, "not a bitmap".getBytes))
    val ds = Multimodal.fromBinaryColumn(
      rows.toDF("id", "payload"), "id", "payload", "image")
    val out = Multimodal.imageStats(ds).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_pixels") === 4L)
    assert(out(1L).getAs[Long]("sum_r") === 510L)
    assert(out(1L).getAs[Int]("lum_max") === 255000)
    assert(out(2L).isNullAt(1), "non-BMP payload must yield null stats")
  }

  test("resize applies the REAL rescale to BMP payloads in the dataflow") {
    val ds = Multimodal.fromBinaryColumn(
      Seq((1L, bmpBytes(Seq(Seq(0xFF0000, 0x00FF00),
        Seq(0x0000FF, 0xFFFFFF))))).toDF("id", "payload"),
      "id", "payload", "image")
    val out = Multimodal.resize(ds, 4, 4).collect()(0)
    assert(out.mime.endsWith(";w=4;h=4"))
    val img = Multimodal.MediaCodec.bmpDecode(out.bytes).get
    assert(img.width === 4 && img.height === 4)
    assert(img.rgb(0, 0) === 0xFF0000 && img.rgb(3, 3) === 0xFFFFFF)
  }

  // --- real PNG pixel decode ------------------------------------------

  /** Reference PNG encoder for the spec: real chunks, real CRC32, real
    * zlib deflate, caller-chosen per-scanline filter types — so the
    * decoder is tested against independently-constructed files, not its
    * own output. Filtering here follows RFC 2083 §6.1 forward
    * (filtered = raw − predictor), the inverse of what the decoder
    * reconstructs.
    */
  private def pngEncode(width: Int, height: Int, channels: Int,
      pixels: Array[Byte], filterTypes: Seq[Int]): Array[Byte] = {
    require(filterTypes.length == height && pixels.length == width * height * channels)
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def chunk(ctype: String, body: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val tb = ctype.getBytes("US-ASCII")
      crc.update(tb); crc.update(body)
      be32(body.length) ++ tb ++ body ++ be32(crc.getValue.toInt)
    }
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
    }
    val ihdr = be32(width) ++ be32(height) ++
      Array(8.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte)
    val rowBytes = width * channels
    val raw = new Array[Byte]((rowBytes + 1) * height)
    for (y <- 0 until height) {
      val ft = filterTypes(y)
      raw(y * (rowBytes + 1)) = ft.toByte
      for (x <- 0 until rowBytes) {
        val cur = pixels(y * rowBytes + x) & 0xFF
        val left = if (x >= channels) pixels(y * rowBytes + x - channels) & 0xFF else 0
        val up = if (y > 0) pixels((y - 1) * rowBytes + x) & 0xFF else 0
        val ul = if (y > 0 && x >= channels)
          pixels((y - 1) * rowBytes + x - channels) & 0xFF else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw(y * (rowBytes + 1) + 1 + x) = ((cur - pred) & 0xFF).toByte
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0D.toByte, 0x0A.toByte, 0x1A.toByte, 0x0A.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", buf.take(n)) ++
      chunk("IEND", Array.empty[Byte])
  }

  test("pngDecode reconstructs pixels bit-exactly under all 5 filter types") {
    val w = 7; val h = 5; val ch = 3
    val rnd = new scala.util.Random(42)
    val pixels = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
    // one scanline per filter type, including Paeth on the first row
    for (filters <- Seq(Seq(0, 1, 2, 3, 4), Seq(4, 3, 2, 1, 0),
        Seq(2, 2, 2, 2, 2), Seq(4, 4, 4, 4, 4))) {
      val png = pngEncode(w, h, ch, pixels, filters)
      val img = Multimodal.MediaCodec.pngDecode(png)
        .getOrElse(fail(s"decode failed for filters $filters"))
      assert(img.width === w && img.height === h && img.channels === ch)
      assert(img.pixels.toSeq === pixels.toSeq,
        s"pixel mismatch under filters $filters")
    }
  }

  test("pngDecode handles gray, gray+alpha and RGBA channel layouts") {
    for (ch <- Seq(1, 2, 4)) {
      val w = 4; val h = 3
      val pixels = Array.tabulate(w * h * ch)(i => ((i * 37) % 256).toByte)
      val png = pngEncode(w, h, ch, pixels, Seq(0, 1, 4))
      val img = Multimodal.MediaCodec.pngDecode(png)
        .getOrElse(fail(s"decode failed for channels=$ch"))
      assert(img.channels === ch && img.pixels.toSeq === pixels.toSeq)
    }
  }

  test("pngStats matches exact hand-computed sums; alpha excluded") {
    // 2x1 RGBA: red@alpha0, white@alpha255 — alpha must not affect sums
    val pixels = Array(255, 0, 0, 0, 255, 255, 255, 255).map(_.toByte)
    val png = pngEncode(2, 1, 4, pixels, Seq(0))
    val (n, sr, sg, sb, lmin, lmax) =
      Multimodal.MediaCodec.pngStats(png).get
    assert(n === 2L && sr === 510L && sg === 255L && sb === 255L)
    assert(lmin === 299 * 255 && lmax === 1000 * 255)
    // grayscale: gray counts as all three channels
    val gray = pngEncode(2, 1, 1, Array(10, 200).map(_.toByte), Seq(2))
    val gs = Multimodal.MediaCodec.pngStats(gray).get
    assert(gs === ((2L, 210L, 210L, 210L, 10000, 200000)))
  }

  test("pngDecode rejects malformed payloads instead of throwing") {
    val good = pngEncode(4, 4, 3, Array.fill(48)(7.toByte), Seq(0, 1, 2, 3))
    def mutate(f: Array[Byte] => Array[Byte]): Option[_] =
      Multimodal.MediaCodec.pngDecode(f(good.clone()))
    assert(mutate(_.take(20)).isEmpty, "truncated header")
    assert(mutate { b => b(25) = 3.toByte; b }.isEmpty, "palette color type")
    assert(mutate { b => b(24) = 16.toByte; b }.isEmpty, "16-bit depth")
    assert(mutate { b => b(28) = 1.toByte; b }.isEmpty, "interlaced")
    // dimension bomb: huge declared height with a tiny IDAT must be
    // rejected by the Long-size bound, not attempted
    assert(mutate { b => b(20) = 0x7F.toByte; b }.isEmpty, "height bomb")
    // corrupt the DEFLATE stream body
    assert(mutate { b => b(45) = (b(45) ^ 0xFF).toByte; b.take(b.length - 12) }
      .isEmpty, "corrupt idat + missing IEND")
    assert(Multimodal.MediaCodec.pngStats("not a png".getBytes).isEmpty)
  }

  test("pngDecode rejects a zip-bomb whose dims pass the per-axis cap") {
    // 1M x 500 RGBA: each dimension is within the 1<<20 per-axis cap
    // and the raw scanline size still fits an Int, but total pixels
    // (2^29) inflate to ~2 GiB of buffers from a few-KB payload. The
    // total-pixel bound (1<<26) must reject it BEFORE any allocation —
    // this returning quickly (and not OOMing the test JVM) is the test.
    val good = pngEncode(4, 4, 3, Array.fill(48)(7.toByte), Seq(0, 1, 2, 3))
    val b = good.clone()
    // IHDR width bytes are at offset 16..19, height at 20..23
    b(16) = 0; b(17) = 0x10.toByte; b(18) = 0; b(19) = 0 // width = 1<<20
    b(20) = 0; b(21) = 0; b(22) = 0x01.toByte; b(23) = 0xF4.toByte // height = 500
    assert(Multimodal.MediaCodec.pngDecode(b).isEmpty, "total-pixel bomb")
    // and the bound is not over-tight: 4096x4096 (1<<24 px) still decodes
    val wide = pngEncode(2048, 2, 1, Array.fill(4096)(9.toByte), Seq(0, 2))
    assert(Multimodal.MediaCodec.pngDecode(wide).nonEmpty)
  }

  test("imageStats prefers BMP and falls back to PNG decode in the dataflow") {
    val png = pngEncode(2, 2, 3,
      Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255).map(_.toByte),
      Seq(0, 4))
    val rows = Seq(
      (1L, bmpBytes(Seq(Seq(0xFF0000, 0x00FF00), Seq(0x0000FF, 0xFFFFFF)))),
      (2L, png), (3L, "neither".getBytes))
    val ds = Multimodal.fromBinaryColumn(
      rows.toDF("id", "payload"), "id", "payload", "image")
    val out = Multimodal.imageStats(ds).collect()
      .map(r => r.getLong(0) -> r).toMap
    // identical 2x2 color content: PNG stats must equal BMP stats
    for (c <- Seq("n_pixels", "sum_r", "sum_g", "sum_b"))
      assert(out(1L).getAs[Long](c) === out(2L).getAs[Long](c), c)
    assert(out(3L).isNullAt(1))
  }

  // --- real perceptual features (round 8) ---

  /** Deterministic distinct "photo-like" test image per seed: smooth
    * per-channel gradients with seed-dependent orientation.
    */
  private def testPixel(seed: Long)(x: Int, y: Int): Int = {
    val a = (seed * 2654435761L) & 0xFF
    val r = ((x * (1 + (a & 7)) + y * 2 + a) % 256).toInt
    val g = ((y * (1 + ((a >> 3) & 7)) + x + (a >> 1)) % 256).toInt
    val b = ((x + y + (a >> 2) * 3) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  test("pngEncode round-trips bit-exactly through pngDecode") {
    val bytes = Multimodal.MediaCodec.pngEncode(24, 16, testPixel(7L))
    val img = Multimodal.MediaCodec.pngDecode(bytes).get
    assert(img.width === 24 && img.height === 16 && img.channels === 3)
    for (y <- 0 until 16; x <- 0 until 24) {
      val p = (y * 24 + x) * 3
      val got = ((img.pixels(p) & 0xFF) << 16) |
        ((img.pixels(p + 1) & 0xFF) << 8) | (img.pixels(p + 2) & 0xFF)
      assert(got === testPixel(7L)(x, y), s"pixel ($x,$y)")
    }
  }

  test("imageEmbedding: lossless re-encode (BMP vs PNG) is bit-identical, " +
      "unit norm, distinct across images") {
    val mc = Multimodal.MediaCodec
    val viaBmp = mc.imageEmbedding(mc.bmpEncode(24, 16, testPixel(3L))).get
    val viaPng = mc.imageEmbedding(mc.pngEncode(24, 16, testPixel(3L))).get
    assert(viaBmp.toSeq === viaPng.toSeq,
      "lossless re-encode must not move the embedding")
    assert(viaBmp.length === mc.imageEmbeddingDim)
    val norm = math.sqrt(viaBmp.map(v => v.toDouble * v).sum)
    assert(math.abs(norm - 1.0) < 1e-5, s"norm $norm")
    val other = mc.imageEmbedding(mc.bmpEncode(24, 16, testPixel(4L))).get
    assert(other.toSeq !== viaBmp.toSeq, "distinct images must differ")
  }

  test("re-encoded twin is the top-1 ANN neighbor through the dataflow") {
    val mc = Multimodal.MediaCodec
    val corpus = Multimodal.extractFeatures(
      Multimodal.fromBinaryColumn(
        (0L until 20L).map(i => (i, mc.bmpEncode(24, 16, testPixel(i))))
          .toDF("id", "payload"), "id", "payload", "image"),
      dim = mc.imageEmbeddingDim)
    val queries = Multimodal.extractFeatures(
      Multimodal.fromBinaryColumn(
        (0L until 20L).map(i =>
          (i + 1000L, mc.pngEncode(24, 16, testPixel(i))))
          .toDF("id", "payload"), "id", "payload", "image"),
      dim = mc.imageEmbeddingDim)
    val top1 = Similarity.bruteForceTopK(corpus, queries,
        "media_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 20L).foreach { i =>
      assert(top1(i + 1000L) === i, s"query ${i + 1000L} paired wrong")
    }
  }

  test("features: opaque payloads get the byte-profile content signature") {
    val mc = Multimodal.MediaCodec
    val f1 = mc.features("not an image".getBytes, 8)
    val f2 = mc.features("not an image".getBytes, 8)
    assert(f1.toSeq === f2.toSeq, "deterministic")
    assert(f1.length === 8)
    // a real content function: same length + a byte-DISTRIBUTION change
    // moves it (the profile is a 16-bin nibble histogram — a swap
    // within one bin is invisible by design, a cross-bin one is not)
    val f3 = mc.features("not an imagZ".getBytes, 8)
    assert(f1.toSeq !== f3.toSeq)
    // and it matches the byte-profile arm directly (no hidden fake)
    assert(f1.toSeq === mc.byteProfileEmbedding("not an image".getBytes, 8).toSeq)
  }

  test("audioEmbedding: container metadata edit is bit-identical; content is not") {
    val mc = Multimodal.MediaCodec
    def tone(freqBin: Int, n: Int): Array[Short] =
      Array.tabulate(n)(i => (8000 * math.sin(
        2 * math.Pi * freqBin * i / 256.0)).toShort)
    val wav = mc.wavEncode(16000, tone(12, 2048))
    val commented = mc.wavWithComment(wav, "round-10 metadata edit")
    // the re-encode is a genuinely different payload...
    assert(!java.util.Arrays.equals(wav, commented))
    // ...that still parses and decodes to the SAME samples
    assert(mc.pcmSamples(commented).get.toSeq ===
      mc.pcmSamples(wav).get.toSeq)
    val e1 = mc.audioEmbedding(wav).get
    val e2 = mc.audioEmbedding(commented).get
    assert(e1.toSeq === e2.toSeq, "sample-identical => embedding-identical")
    assert(e1.length === mc.audioEmbeddingDim)
    // unit norm
    val n2 = e1.map(x => x.toDouble * x).sum
    assert(math.abs(n2 - 1.0) < 1e-6)
    // a different tone moves the SPECTRAL half of the embedding, and
    // the two tones' embeddings are far apart in cosine
    val e3 = mc.audioEmbedding(mc.wavEncode(16000, tone(40, 2048))).get
    val cos = e1.zip(e3).map { case (a, b) => a.toDouble * b }.sum
    assert(cos < 0.99, s"distinct tones too close: $cos")
    // non-WAV payloads are None (the arm never fabricates)
    assert(mc.audioEmbedding("junk".getBytes).isEmpty)
  }

  test("videoEmbedding: fps metadata edit is bit-identical; a frame edit is not") {
    val mc = Multimodal.MediaCodec
    def pix(f: Int, x: Int, y: Int): Int =
      (((x * 7 + y * 11 + f * 29) % 256) << 16) |
        (((y * 5 + f * 3) % 256) << 8) | ((x + y + f) % 256)
    val v1 = AviCodec.aviEncode(24, 16, 40000, 6, pix)
    val v2 = AviCodec.aviEncode(24, 16, 20000, 6, pix) // fps-only change
    assert(!java.util.Arrays.equals(v1, v2))
    val e1 = mc.videoEmbedding(v1).get
    val e2 = mc.videoEmbedding(v2).get
    assert(e1.toSeq === e2.toSeq, "frame-identical => embedding-identical")
    assert(e1.length === mc.imageEmbeddingDim)
    val vDiff = AviCodec.aviEncode(24, 16, 40000, 6,
      (f, x, y) => if (f == 2) 0xFFFFFF else pix(f, x, y))
    val e3 = mc.videoEmbedding(vDiff).get
    assert(e1.toSeq !== e3.toSeq, "an edited sampled frame must move it")
    // single-frame GIF pools to exactly the still embedding
    val pal = Array.tabulate(64)(i => (i << 16) | (i << 8) | i)
    val gif = GifCodec.gifEncode(10, 8, pal, 1,
      (_, x, y) => (x * 3 + y) % 64)
    val still = mc.imageEmbedding(gif).get
    val pooled = mc.videoEmbedding(gif).get
    assert(still.toSeq === pooled.toSeq)
    assert(mc.videoEmbedding("junk".getBytes).isEmpty)
  }

  test("features routes each container kind to its real arm") {
    val mc = Multimodal.MediaCodec
    val wav = mc.wavEncode(16000,
      Array.tabulate(1024)(i => (1000 * math.sin(i / 5.0)).toShort))
    assert(mc.features(wav, mc.audioEmbeddingDim).toSeq ===
      mc.audioEmbedding(wav).get.toSeq)
    val avi = AviCodec.aviEncode(16, 12, 40000, 3,
      (f, x, y) => ((x + y * 7 + f * 13) % 256) * 0x010101)
    assert(mc.features(avi, mc.imageEmbeddingDim).toSeq ===
      mc.videoEmbedding(avi).get.toSeq)
    val bmp = mc.bmpEncode(16, 12, (x, y) => ((x * 5 + y) % 256) * 0x010101)
    assert(mc.features(bmp, mc.imageEmbeddingDim).toSeq ===
      mc.imageEmbedding(bmp).get.toSeq)
  }
}
