package graft.operators

import graft.SparkSpec

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // doc 1 and doc 2 share a verbatim 8-token passage embedded in
  // otherwise-unique prose; doc 3 repeats its own 6-token phrase twice;
  // doc 4 is clean; doc 5 is too short to host a window.
  private val shared =
    "alpha bravo charlie delta echo foxtrot golf hotel"
  private val docs = Seq(
    (1L, s"unique one prologue text here $shared and a unique epilogue"),
    (2L, s"different lead in words $shared trailing words differ two"),
    (3L, "self rep one two three four five six mid filler words " +
      "rep one two three four five six tail"),
    (4L, "nothing here repeats anything anywhere in this corpus at all"),
    (5L, "tiny doc")
  ).toDF("doc_id", "text")

  private def report =
    SubstringDedup.dupSpanReport(docs, "doc_id", "text", w = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap

  test("cross-doc shared passage becomes one maximal span on each side") {
    val r = report
    // 8 shared tokens host 4 overlapping 5-windows that merge into ONE
    // span of exactly the 8 shared tokens.
    assert(r(1L)._3 === 1L && r(1L)._2 === 8L)
    assert(r(2L)._3 === 1L && r(2L)._2 === 8L)
    assert(r(1L)._4 === 8L) // max_span
  }

  test("within-doc repetition is caught without a second document") {
    val r = report
    // "rep one two three four five six" (7 tokens) occurs twice in doc 3
    // → both occurrences' windows are duplicated, two disjoint spans.
    assert(r(3L)._3 === 2L)
    assert(r(3L)._2 === 14L)
  }

  test("clean and too-short docs report zeros and keep=true") {
    val r = report
    assert(r(4L) === ((10L, 0L, 0L, 0L, true)))
    assert(r(5L) === ((2L, 0L, 0L, 0L, true)))
  }

  test("keep flips when duplicated mass reaches half the document") {
    val r = report
    r.values.foreach { case (n, dup, _, _, keep) =>
      assert(keep === (dup * 2 < n))
    }
    assert(!r(2L)._5) // 8 of 16 tokens duplicated → dropped
    assert(r(1L)._5) // 8 of 17 stays under half → kept
  }

  test("removeDupSpans cuts exactly the reported spans") {
    val cleaned = SubstringDedup.removeDupSpans(docs, "doc_id", "text", w = 5)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(cleaned(1L)._1 === "unique one prologue text here and a unique epilogue")
    assert(cleaned(1L)._2 === 8L)
    assert(cleaned(4L) === (("nothing here repeats anything anywhere in this corpus at all", 0L)))
    assert(cleaned(3L)._1 === "self mid filler words tail")
    assert(cleaned(3L)._2 === 14L)
    assert(cleaned(5L) === (("tiny doc", 0L)))
  }

  test("identical short docs flag each other via the whole-text window") {
    val shorts = Seq(
      (1L, "same tiny doc"), (2L, "same tiny doc"), (3L, "other tiny doc")
    ).toDF("doc_id", "text")
    val r = SubstringDedup.dupSpanReport(shorts, "doc_id", "text", w = 5)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getBoolean(5)))).toMap
    // the fallback window covers [0, min(w, n)) = the whole 3-token doc
    assert(r(1L) === ((3L, 3L, false)))
    assert(r(2L) === ((3L, 3L, false)))
    assert(r(3L) === ((3L, 0L, true)))
  }

  test("no quadratic blowup: an m-fold repeated window stays linear") {
    // 200 docs all containing the same 5-token phrase: the flag join
    // emits one row per OCCURRENCE (200), never per pair (19,900).
    val many = (1L to 200L)
      .map(i => (i, s"prefix$i words lead common phrase appears right here tail$i"))
      .toDF("doc_id", "text")
    val rep = SubstringDedup.dupSpanReport(many, "doc_id", "text", w = 5)
    assert(rep.count() === 200L)
    val flagged = rep.where("dup_tokens > 0").count()
    assert(flagged === 200L)
  }
}
