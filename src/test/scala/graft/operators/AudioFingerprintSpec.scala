package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private val F = 256

  private def tone(bin: Int, frames: Int, amp: Double = 1000.0,
      phase: Double = 0.0): Array[Short] = {
    val out = new Array[Short](frames * F)
    var i = 0
    while (i < out.length) {
      out(i) = math.round(
        amp * math.cos(2 * math.Pi * bin * (i % F) / F + phase)).toShort
      i += 1
    }
    out
  }

  private def wav(samples: Array[Short]): Array[Byte] =
    Multimodal.MediaCodec.wavEncode(8000, samples)

  private def peaksOf(bytes: Array[Byte]): Seq[Int] = {
    val out = AudioFingerprint.framePeaks(
        Seq((1L, bytes)).toDF("id", "wav"), "id", "wav", F)
      .orderBy("frame").collect().map(_.getInt(2)).toSeq
    out
  }

  test("pure integer-bin tones peak exactly on their bin, across the band") {
    for (bin <- Seq(1, 10, 63, 100, 127)) {
      val p = peaksOf(wav(tone(bin, 3)))
      assert(p === Seq(bin, bin, bin), s"bin $bin")
    }
  }

  test("phase shifts and amplitude do not move the peak") {
    for (phase <- Seq(0.4, 1.1, 2.9); amp <- Seq(40.0, 12000.0)) {
      val p = peaksOf(wav(tone(37, 2, amp, phase)))
      assert(p === Seq(37, 37), s"phase $phase amp $amp")
    }
  }

  test("the stronger of two mixed tones wins the frame") {
    val a = tone(20, 2, 1000.0)
    val b = tone(90, 2, 300.0)
    val mix = a.zip(b).map { case (x, y) => (x + y).toShort }
    assert(peaksOf(wav(mix)) === Seq(20, 20))
  }

  test("trailing partial frame is dropped; malformed bytes yield no rows") {
    val p = peaksOf(wav(tone(15, 2) ++ tone(15, 1).take(100)))
    assert(p === Seq(15, 15))
    assert(peaksOf(Array[Byte](1, 2, 3, 4)) === Seq.empty)
  }

  test("malformed bytes survive the whole-stage-codegen path (non-local input)") {
    // Seq.toDF is folded to a LocalRelation (interpreted eval);
    // repartition forces a real exchange so the generated code runs.
    // The kernel returns null for garbage — the codegen must propagate
    // that into isNull instead of NPE-ing on ArrayData access.
    val df = Seq((1L, wav(tone(9, 2))), (2L, Array[Byte](1, 2, 3, 4)),
        (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "wav").repartition(2)
    val out = AudioFingerprint.framePeaks(df, "id", "wav", F)
      .orderBy("id", "frame").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 1L))
    assert(out.map(_.getInt(2)).toSeq === Seq(9, 9))
    // direct expression check: null result, not a crash, under codegen
    val peaks = AudioFingerprint.audioPeaks(col("wav"), F)
    val vals = df.select(col("id"), peaks.as("p")).orderBy("id").collect()
    assert(vals.length === 3)
    assert(!vals(0).isNullAt(1))
    assert(vals(1).isNullAt(1) && vals(2).isNullAt(1))
  }

  test("clip matches its source track at the cut offset with full votes") {
    // track: 20 frames of a pseudo-random schedule; clip = frames 5..12
    def sched(k: Int) = 10 + (k * 29) % 110
    val track = (0 until 20).toArray.flatMap(k => tone(sched(k), 1))
    val clip = (5 until 13).toArray.flatMap(k => tone(sched(k), 1))
    val th = AudioFingerprint.constellation(AudioFingerprint.framePeaks(
      Seq((7L, wav(track))).toDF("id", "wav"), "id", "wav", F), F, 3)
    val ch = AudioFingerprint.constellation(AudioFingerprint.framePeaks(
      Seq((99L, wav(clip))).toDF("id", "wav"), "id", "wav", F), F, 3)
    val m = AudioFingerprint.matchClips(th, ch).collect()
    assert(m.length === 1)
    val r = m.head
    assert(r.getLong(0) === 99L && r.getLong(1) === 7L)
    assert(r.getInt(2) === 5)
    // 8 clip frames, dt 1..3 fully inside the track: 7+6+5 votes
    assert(r.getLong(3) === 18L)
  }

  test("matching is an equi-join on hashes: unrelated tracks get scattered votes") {
    def schedA(k: Int) = 10 + (k * 29) % 110
    def schedB(k: Int) = 12 + (k * 31) % 100
    val tA = (0 until 16).toArray.flatMap(k => tone(schedA(k), 1))
    val tB = (0 until 16).toArray.flatMap(k => tone(schedB(k), 1))
    val clip = (4 until 10).toArray.flatMap(k => tone(schedA(k), 1))
    val tracks = Seq((1L, wav(tA)), (2L, wav(tB))).toDF("id", "wav")
    val th = AudioFingerprint.constellation(
      AudioFingerprint.framePeaks(tracks, "id", "wav", F), F, 3)
    val ch = AudioFingerprint.constellation(AudioFingerprint.framePeaks(
      Seq((50L, wav(clip))).toDF("id", "wav"), "id", "wav", F), F, 3)
    val m = AudioFingerprint.matchClips(th, ch).collect().head
    assert(m.getLong(1) === 1L && m.getInt(2) === 4)
  }
}
