package graft.operators

import graft.SparkSpec

class DecontamSpec extends SparkSpec {
  import spark.implicits._

  private def report(train: Seq[(Long, String)], ev: Seq[(Long, String)],
      n: Int = 3) =
    Decontam.contaminationReport(
        train.toDF("doc_id", "text"), "doc_id", "text",
        ev.toDF("eid", "etext"), "eid", "etext", n)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("verbatim overlap is detected with exact shared-ngram count") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text with no overlap whatsoever"))
    val ev = Seq((100L, "quick brown fox jumps"))
    // eval 3-grams: {quick brown fox, brown fox jumps} — both in doc 1
    assert(report(train, ev) === Seq((1L, 1L, 2L)))
  }

  test("clean corpora produce an empty report") {
    val train = Seq((1L, "alpha beta gamma delta"))
    val ev = Seq((100L, "epsilon zeta eta theta"))
    assert(report(train, ev).isEmpty)
  }

  test("one training doc hit by two eval docs counts both") {
    val train = Seq((1L, "a b c d e f g"))
    val ev = Seq((100L, "a b c"), (101L, "e f g"))
    assert(report(train, ev) === Seq((1L, 2L, 2L)))
  }

  test("shared ngrams are counted distinct, not per occurrence") {
    val train = Seq((1L, "x y z x y z x y z"))
    val ev = Seq((100L, "x y z"))
    // "x y z" appears 3 times in training but is ONE distinct 3-gram
    assert(report(train, ev) === Seq((1L, 1L, 1L)))
  }

  test("empty and whitespace-only docs are never counted as contaminated") {
    val train = Seq((1L, ""), (2L, "   "), (3L, "real content here"))
    val ev = Seq((100L, ""), (101L, "unrelated eval text"))
    // without the empty-doc guard, docs 1/2 would share the "" fallback
    // gram with eval 100 and appear as vacuously contaminated
    assert(report(train, ev).isEmpty)
  }

  test("docs shorter than n match on whole-text fallback only") {
    val train = Seq((1L, "tiny doc"), (2L, "tiny"))
    val ev = Seq((100L, "tiny doc"))
    // eval "tiny doc" < 3 tokens -> single whole-text gram; matches
    // train doc 1's fallback gram exactly, not doc 2's "tiny"
    assert(report(train, ev) === Seq((1L, 1L, 1L)))
  }
}
