package graft.operators

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // "click here to unsubscribe" is the planted boilerplate: its trigrams
  // appear in 3 of 4 docs (df = 0.75); every other trigram is unique to
  // its doc (df = 0.25).
  private val docs = Seq(
    (1L, "alpha beta gamma click here to unsubscribe"),
    (2L, "delta epsilon zeta click here to unsubscribe"),
    (3L, "click here to unsubscribe eta theta iota"),
    (4L, "kappa lambda mu nu xi omicron pi rho")
  ).toDF("doc_id", "text")

  test("profile counts distinct shingles and boilerplate hits per doc") {
    val got = Boilerplate.profile(docs, minDfFrac = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // 7 tokens -> 5 trigrams; the planted phrase contributes its 2
    // in-phrase trigrams plus the 2 straddling ones are doc-unique.
    // Boilerplate trigrams (df 3/4 >= 0.5): "click here to",
    // "here to unsubscribe".
    assert(got(1L) === ((5L, 2L, 0.4)))
    assert(got(2L) === ((5L, 2L, 0.4)))
    assert(got(3L) === ((5L, 2L, 0.4)))
    assert(got(4L) === ((6L, 0L, 0.0)))
  }

  test("threshold is relative to corpus size, not absolute") {
    // At minDfFrac=0.8 nothing reaches df 4/4 -> no boilerplate at all.
    val frac = Boilerplate.profile(docs, minDfFrac = 0.8)
      .collect().map(_.getDouble(3))
    assert(frac.forall(_ === 0.0))
  }

  test("filter drops chrome-dominated docs and keeps the rest intact") {
    // Doc 5 is ENTIRELY the planted phrase: all of its trigrams are
    // boilerplate (frac 1.0) -> dropped at maxBoilerFrac 0.5; docs 1-4
    // stay (frac <= 0.4 once df includes doc 5).
    val withChrome = docs.union(
      Seq((5L, "click here to unsubscribe")).toDF("doc_id", "text"))
    val kept = Boilerplate.filter(withChrome, minDfFrac = 0.5,
        maxBoilerFrac = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept === Array(1L, 2L, 3L, 4L))
  }

  test("degenerate docs (fewer tokens than the shingle width) survive") {
    val tiny = Seq((1L, "solo"), (2L, ""), (3L, "two words"))
      .toDF("doc_id", "text")
    val got = Boilerplate.profile(tiny, minDfFrac = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // < n tokens -> the single whole-text shingle (q27's CASE arm).
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
