package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val M = 4096
  private val K = 4

  private def build(keys: Seq[Long]) =
    Bloom.build(keys.toDF("key"), "key", M, K)

  test("no false negatives: every built key probes true") {
    val bloom = build(1L to 100L)
    val probed = Bloom.probe((1L to 100L).toDF("key"), "key", bloom, M, K)
    assert(probed.where(!col("maybe_member")).count() === 0)
  }

  test("false-positive rate is near the analytic bound at light load") {
    val bloom = build(1L to 100L)
    // 400 set bits of 4096 → p(bit) ≈ 0.093, fp ≈ p^4 ≈ 7e-5: expect ~0
    // of 1000 non-members; 2% leaves ~300σ headroom without flaking
    val fp = Bloom.probe((10001L to 11000L).toDF("key"), "key", bloom, M, K)
      .where(col("maybe_member")).count()
    assert(fp <= 20, s"fp=$fp of 1000 at load 0.1 — hashing is broken")
  }

  test("duplicate build keys change nothing (bit_or idempotence)") {
    val once = build(1L to 50L).orderBy("word_idx").as[(Long, Long)].collect()
    val twice = build((1L to 50L) ++ (1L to 50L))
      .orderBy("word_idx").as[(Long, Long)].collect()
    assert(once === twice)
  }

  test("word table is bounded by m/32 regardless of key count") {
    assert(build(1L to 5000L).count() <= M / 32)
  }

  test("bits match a driver-side reference bloom (portable md5-60)") {
    val keys = Seq(7L, 42L, 99999L)
    val md = java.security.MessageDigest.getInstance("MD5")
    def pos(i: Int, key: Long): Long = {
      val hex = md.digest(s"$i:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % M
    }
    val expected = keys.flatMap(k => (0 until K).map(pos(_, k)))
      .groupBy(_ / 32)
      .map { case (w, ps) => w -> ps.map(p => 1L << (p % 32).toInt).reduce(_ | _) }
    val got = build(keys).as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("probe of a key missing every word row is false, not null") {
    val bloom = build(Seq(1L)).where(lit(false)) // empty word table
    val out = Bloom.probe(Seq(123L).toDF("key"), "key", bloom, M, K)
    assert(out.select("maybe_member").as[Boolean].collect() === Seq(false))
  }

  test("parameter validation fails fast") {
    intercept[IllegalArgumentException](Bloom.build(Seq(1L).toDF("key"), "key", 100, 4))
    intercept[IllegalArgumentException](Bloom.build(Seq(1L).toDF("key"), "key", 4096, 0))
  }
}
