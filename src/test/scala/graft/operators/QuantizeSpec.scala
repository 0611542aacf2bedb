package graft.operators

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def summary(vecs: Seq[(Long, Seq[Float])]) =
    Quantize.int8Summary(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("extreme element quantizes to exactly ±127, zero to 0") {
    val got = summary(Seq((1L, Seq(2.0f, -1.0f, 0.0f))))
    val (_, scale, qsum, ql1, qmax, dim) = got.head
    assert(scale === 2.0 / 127.0)
    // q = floor(x/scale + 0.5): 2.0 -> 127, -1.0 -> floor(-63.0) = -63? no:
    // -1.0/scale = -63.5, +0.5 = -63.0, floor = -63; 0 -> 0
    assert(qsum === 127L - 63L)
    assert(ql1 === 127L + 63L)
    assert(qmax === 127L)
    assert(dim === 3L)
  }

  test("negative-dominant vector bottoms out at -127") {
    val got = summary(Seq((1L, Seq(-4.0f, 1.0f))))
    val (_, scale, qsum, _, qmax, _) = got.head
    assert(scale === 4.0 / 127.0)
    // -4.0/scale = -127 exactly -> floor(-126.5) = -127
    // 1.0/scale = 31.75 -> floor(32.25) = 32
    assert(qsum === -127L + 32L)
    assert(qmax === 32L)
  }

  test("all-zero vector gets scale 0 and all-zero codes") {
    assert(summary(Seq((1L, Seq(0.0f, 0.0f)))) ===
      Seq((1L, 0.0, 0L, 0L, 0L, 2L)))
  }

  test("reconstruction error bounded by half a step") {
    val vec = Seq(0.73f, -0.22f, 1.91f, -3.14f, 0.005f)
    val maxAbs = vec.map(v => math.abs(v.toDouble)).max
    val scale = maxAbs / 127.0
    val qs = vec.map(v => math.floor(v.toDouble / scale + 0.5))
    vec.zip(qs).foreach { case (v, q) =>
      assert(math.abs(v.toDouble - q * scale) <= scale / 2 + 1e-12)
    }
    // and the engine agrees with the driver-side arithmetic
    val (_, s, qsum, ql1, qmax, dim) = summary(Seq((1L, vec))).head
    assert(s === scale && dim === 5L)
    assert(qsum === qs.map(_.toLong).sum)
    assert(ql1 === qs.map(q => math.abs(q).toLong).sum)
    assert(qmax === qs.map(_.toLong).max)
  }
}
