package graft.operators

import graft.SparkSpec

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  // Bigram table: "a b"x3, "b a"x1, "b c"x1, "c"x1 (degenerate).
  // Prefix counts from it: a->3, b->2, c->1.
  // P: "a b"=3/3, "b a"=1/2, "b c"=1/2, "c"=1/1.
  private val docs = Seq(
    (1L, "a b a b"),
    (2L, "a b c"),
    (3L, "c")
  ).toDF("doc_id", "text")

  test("bigram MLE probabilities in fixed point, hand-computed") {
    val got = LanguageModel.bigramFluency(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((3L, 2500000000L, 2.5e9 / 3.0 / 1e9)))
    assert(got(2L) === ((2L, 1500000000L, 0.75)))
    assert(got(3L) === ((1L, 1000000000L, 1.0)))
  }

  test("fluency orders a predictable doc above a one-off token stream") {
    // "x y" repeated is maximally predictable under its own LM; the
    // all-distinct doc's bigrams each occur once against shared
    // prefixes, so its mean probability lands strictly lower.
    val corpus = Seq(
      (1L, "x y x y x y x y"),
      (2L, "x q x r x s x t")
    ).toDF("doc_id", "text")
    val avg = LanguageModel.bigramFluency(corpus)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(avg(1L) > avg(2L))
  }

  test("every document is scored, including sub-bigram-width ones") {
    val tiny = Seq((1L, ""), (2L, "solo"), (3L, "a b"))
      .toDF("doc_id", "text")
    val got = LanguageModel.bigramFluency(tiny)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
