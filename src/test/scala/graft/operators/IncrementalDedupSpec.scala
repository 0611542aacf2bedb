package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox"),
    (2L, "jumps over the lazy dog"),
    (3L, "pack my box with jugs")).toDF("id", "text")

  test("corpus re-crawls die, fresh docs survive, batch dups keep-first") {
    val batch = Seq(
      (10L, "The  Quick brown FOX"), // corpus dup modulo normalization
      (11L, "genuinely new content"),
      (12L, "genuinely new content"), // within-batch dup of 11
      (13L, "another new one")).toDF("id", "text")
    val out = TextDedup.incrementalExact(batch, corpus, "text",
        Seq(col("id").asc), mBits = 1024, k = 4)
      .select("id").as[Long].collect().sorted
    assert(out.toSeq === Seq(11L, 13L))
  }

  test("no false negatives: every distinct fresh fingerprint survives") {
    // 200 fresh docs vs a tiny filter (high fp rate) — false positives
    // fall through to the exact anti-join; nothing fresh may be lost.
    val batch = (0 until 200).map(i => (i.toLong, s"fresh doc number $i"))
      .toDF("id", "text")
    val out = TextDedup.incrementalExact(batch, corpus, "text",
      Seq(col("id").asc), mBits = 64, k = 2)
    assert(out.count() === 200)
  }

  test("an empty batch yields an empty result") {
    val batch = Seq.empty[(Long, String)].toDF("id", "text")
    assert(TextDedup.incrementalExact(batch, corpus, "text",
      Seq(col("id").asc), mBits = 1024, k = 4).count() === 0)
  }
}
