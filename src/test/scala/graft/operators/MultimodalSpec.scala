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
