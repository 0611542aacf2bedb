package graft

import graft.operators.{AviCodec, Multimodal}

/** [[AviCodec]] round-trips: the encoder and parser are independent
  * implementations of the RIFF/AVI spec, so agreement on geometry,
  * frame count, sampling, and per-frame pixel statistics certifies
  * both (the q98 oracle then re-certifies against DuckDB closed
  * forms).
  */
class AviCodecSpec extends SparkSpec {

  private def pix(f: Int, x: Int, y: Int): Int = {
    val r = (f * 19 + x * 7 + y * 13) % 256
    val g = (f * 23 + x * 5 + y * 11) % 256
    val b = (f * 29 + x * 3 + y * 17) % 256
    (r << 16) | (g << 8) | b
  }

  test("header round-trip: aviInfo recovers the encoded geometry") {
    val b = AviCodec.aviEncode(6, 4, 40000, 5, pix)
    assert(AviCodec.aviInfo(b).contains(AviCodec.AviInfo(6, 4, 5, 40000)))
  }

  test("frameChunks enumerates every frame with the DIB payload size") {
    val w = 5; val h = 3 // w=5 -> 15-byte rows padded to 16
    val b = AviCodec.aviEncode(w, h, 1000, 4, pix)
    val chunks = AviCodec.frameChunks(b).toSeq
    assert(chunks.map(_._1) == Seq(0, 1, 2, 3))
    assert(chunks.forall(_._3 == 16 * h), "padded stride rows")
  }

  test("frameStats matches a direct closed-form computation (padded width)") {
    val w = 5; val h = 3; val n = 4
    val b = AviCodec.aviEncode(w, h, 1000, n, pix)
    val got = AviCodec.frameStats(b, every = 1).get
    val want = (0 until n).map { f =>
      val px = for { x <- 0 until w; y <- 0 until h } yield pix(f, x, y)
      val rs = px.map(p => (p >> 16) & 0xFF)
      val gs = px.map(p => (p >> 8) & 0xFF)
      val bs = px.map(p => p & 0xFF)
      val lums = px.indices.map(i => 299 * rs(i) + 587 * gs(i) + 114 * bs(i))
      (f, (w * h).toLong, rs.map(_.toLong).sum, gs.map(_.toLong).sum,
        bs.map(_.toLong).sum, lums.min, lums.max)
    }
    assert(got == want)
  }

  test("sampling keeps every k-th frame only, frame 0 included") {
    val b = AviCodec.aviEncode(4, 4, 1000, 7, pix)
    assert(AviCodec.frameStats(b, every = 3).get.map(_._1) == Seq(0, 3, 6))
  }

  test("oversized geometry fails with a clear RIFF-limit error, " +
      "not an Int overflow") {
    // 1920x1080x400 frames ~ 2.5 GB: Int arithmetic silently wrapped
    // this to a negative allocation before the Long-sizing guard
    val e = intercept[IllegalArgumentException] {
      AviCodec.aviEncode(1920, 1080, 40000, 400, pix)
    }
    assert(e.getMessage.contains("32-bit"), e.getMessage)
  }

  test("non-AVI payloads probe as None (WAV is RIFF but not AVI)") {
    assert(AviCodec.aviInfo(Array[Byte](1, 2, 3)).isEmpty)
    val wav = Multimodal.MediaCodec.wavEncode(8000, Array[Short](1, 2, 3))
    assert(AviCodec.aviInfo(wav).isEmpty)
    assert(AviCodec.frameStats("x".getBytes, 1).isEmpty)
  }

  test("decode() surfaces AVI geometry in MediaMeta") {
    val b = AviCodec.aviEncode(8, 6, 40000, 9, pix)
    val m = Multimodal.MediaCodec.decode(
      Multimodal.MediaRecord(7L, "video", b, "video/x-msvideo", "t"))
    assert(m.width.contains(8) && m.height.contains(6)
      && m.n_frames.contains(9) && m.sample_rate.isEmpty)
  }

  test("videoFrameStats explodes sampled frames per asset, skips non-AVI") {
    import spark.implicits._
    val ds = Seq(
      Multimodal.MediaRecord(1L, "video",
        AviCodec.aviEncode(4, 3, 1000, 4, pix), "video/x-msvideo", "t"),
      Multimodal.MediaRecord(2L, "video",
        "not a container".getBytes, "video/x-msvideo", "t")).toDS()
    val rows = Multimodal.videoFrameStats(ds, every = 2)
      .orderBy("media_id", "frame_idx").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq
      == Seq((1L, 0), (1L, 2)))
    assert(rows.forall(_.getLong(2) == 12L))
  }
}
