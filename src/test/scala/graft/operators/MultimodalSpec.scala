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
}
