package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the r11 claim that [[Retrieval.bm25TopK]]'s two physical
  * strategies are output-IDENTICAL: the sparse inverted-index path and
  * the dense pivot+[[graft.expressions.SlotSum]]+heap path share the
  * score algebra verbatim, so forcing either side on the same corpus
  * must produce the same rows bit for bit (scores included). The dense
  * path exists for candidate-degenerate corpora — r11's sf10r sweep
  * measured Σ df(query terms) = 5.69e9 on 500k docs (3.3k-word
  * vocabulary: every prefix token is a stopword), where the sparse
  * join's pair stream dwarfs |docs|·|queries|.
  */
class Bm25DenseSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = {
    // small vocabulary => overlapping postings, dense ties, repeated
    // terms inside one doc (tf > 1), docs with NO query-term overlap
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (1L to 200L).map { id =>
      val n = 3 + (id % 7).toInt
      val text = (0 until n)
        .map(j => words(((id * 31 + j * 17) % words.size).toInt))
        .mkString(" ")
      (id, if (id % 19 == 0) "quux only" else text) // 0-overlap docs
    }
    docs.toDF("doc_id", "text")
  }

  test("dense path output equals sparse path output, scores included") {
    val docs = corpus()
    val queries = docs.where(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("qtext"))
    for (rational <- Seq(true, false)) {
      val sparse = Retrieval.bm25TopK(docs, "doc_id", "text",
        queries, "qid", "qtext", k = 5, rationalIdf = rational,
        denseMinDocs = Long.MaxValue) // force sparse
      val dense = Retrieval.bm25TopK(docs, "doc_id", "text",
        queries, "qid", "qtext", k = 5, rationalIdf = rational,
        denseMinDocs = 0L, denseAboveCandidateRatio = 0.0,
      denseMinCandidatePairs = 0L) // force dense
      assert(sparse.exceptAll(dense).isEmpty &&
        dense.exceptAll(sparse).isEmpty,
        s"dense/sparse BM25 diverged (rationalIdf=$rational)")
      assert(dense.count() > 0)
    }
  }

  test("strategy boundary: non-integral ids fall back to sparse above the doc threshold") {
    // r12 (ADVICE): Bm25DaatAgg heaps key by LONG, so string/decimal id
    // corpora in the dense regime must run sparse (which supports any
    // id type) instead of failing analysis / dropping rows on a null
    // cast. Output must equal the explicitly-forced sparse result.
    val docs = corpus().select(
      concat(lit("d"), col("doc_id")).as("doc_id"), col("text"))
    val queries = docs.limit(5)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    graft.StrategyLog.drain()
    val auto = Retrieval.bm25TopK(docs, "doc_id", "text",
      queries, "qid", "qtext", k = 3, rationalIdf = true,
      denseMinDocs = 0L, denseAboveCandidateRatio = 0.0,
      denseMinCandidatePairs = 0L) // floor+ratio say dense; id types must veto it
    val decs = graft.StrategyLog.drain()
    assert(decs.exists(d => d.op == "bm25TopK"
      && d.strategy == "sparse-window"
      && d.detail.contains("non-integral")), s"got $decs")
    val sparse = Retrieval.bm25TopK(docs, "doc_id", "text",
      queries, "qid", "qtext", k = 3, rationalIdf = true,
      denseMinDocs = Long.MaxValue)
    assert(auto.exceptAll(sparse).isEmpty && sparse.exceptAll(auto).isEmpty)
  }

  test("strategy boundary: null query ids fall back to sparse; int ids round-trip dense") {
    val docs = corpus()
    // INT-typed ids (narrower than long): dense must widen to long for
    // the heap and cast back, preserving the caller's schema
    val intDocs = docs.select(col("doc_id").cast("int").as("doc_id"),
      col("text"))
    val intQueries = intDocs.limit(5)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    graft.StrategyLog.drain()
    val dense = Retrieval.bm25TopK(intDocs, "doc_id", "text",
      intQueries, "qid", "qtext", k = 3, rationalIdf = true,
      denseMinDocs = 0L, denseAboveCandidateRatio = 0.0,
      denseMinCandidatePairs = 0L)
    assert(graft.StrategyLog.drain().exists(d =>
      d.op == "bm25TopK" && d.strategy == "dense"))
    assert(dense.schema("doc_id").dataType ===
      org.apache.spark.sql.types.IntegerType)
    val sparse = Retrieval.bm25TopK(intDocs, "doc_id", "text",
      intQueries, "qid", "qtext", k = 3, rationalIdf = true,
      denseMinDocs = Long.MaxValue)
    assert(dense.exceptAll(sparse).isEmpty && sparse.exceptAll(dense).isEmpty)
    // a NULL query id in the dense regime: sparse fallback, no NPE
    val nullQ = intQueries.unionByName(
      Seq((null.asInstanceOf[Integer], "alpha beta"))
        .toDF("qid", "qtext").select(col("qid").cast("int"), col("qtext")))
    graft.StrategyLog.drain()
    val guarded = Retrieval.bm25TopK(intDocs, "doc_id", "text",
      nullQ, "qid", "qtext", k = 3, rationalIdf = true,
      denseMinDocs = 0L, denseAboveCandidateRatio = 0.0,
      denseMinCandidatePairs = 0L)
    assert(graft.StrategyLog.drain().exists(d =>
      d.op == "bm25TopK" && d.strategy == "sparse"
        && d.detail.contains("null query ids")))
    val sparseNullQ = Retrieval.bm25TopK(intDocs, "doc_id", "text",
      nullQ, "qid", "qtext", k = 3, rationalIdf = true,
      denseMinDocs = Long.MaxValue)
    assert(guarded.exceptAll(sparseNullQ).isEmpty &&
      sparseNullQ.exceptAll(guarded).isEmpty)
  }

  test("measured cutover: degenerate vocabulary chooses dense on a SMALL corpus, discriminative stays sparse") {
    // r13 (VERDICT r12 item 6): the cutover is the sampled candidate
    // statistic (ratio + absolute volume), not a doc-count constant. A
    // 6000-doc corpus over a 5-word vocabulary (every query term is a
    // stopword, df ≈ N) with enough queries to clear the volume floor
    // must choose dense even though it is 16× under the old 100k-doc
    // constant; with only a handful of queries the SAME degenerate
    // corpus is one small shuffle and must stay sparse (volume axis);
    // the same-size corpus with per-doc-unique terms (df = 1) must
    // stay sparse at any query count (ratio axis). Decisions carry the
    // measured statistics in the log. (Dense/sparse output parity is
    // pinned by the forced-path tests above; this test pins the
    // DECISIONS, so the degenerate run only sanity-checks shape.)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps")
    val degen = (1L to 6000L).map { id =>
      (id, (0 until 5).map(j => words(((id + j) % 5).toInt)).mkString(" "))
    }.toDF("doc_id", "text")
    // ratio ≈ 5 (5 stopword terms/query, df=N each) × 6000 docs × 1200
    // queries ⇒ estPairs ≈ 36M > the 2²⁴ volume floor ⇒ dense
    val degenQ = degen.where(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    graft.StrategyLog.drain()
    val auto = Retrieval.bm25TopK(degen, "doc_id", "text",
      degenQ, "qid", "qtext", k = 3, rationalIdf = true)
    val nOut = auto.count()
    val denseDecs = graft.StrategyLog.drain().filter(_.op == "bm25TopK")
    assert(denseDecs.exists(d => d.strategy == "dense"
      && d.detail.contains("candidateRatio=")), s"got $denseDecs")
    assert(nOut === 1200 * 3)
    // volume axis: 10 queries over the same degenerate corpus ⇒
    // estPairs ≈ 300k — one small shuffle; sparse must win with the
    // estPairs reason in the log
    val fewQ = degen.where(col("doc_id") % 600 === 0)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    graft.StrategyLog.drain()
    Retrieval.bm25TopK(degen, "doc_id", "text",
      fewQ, "qid", "qtext", k = 3, rationalIdf = true).collect()
    val fewDecs = graft.StrategyLog.drain().filter(_.op == "bm25TopK")
    assert(fewDecs.exists(d => d.strategy == "sparse"
      && d.detail.contains("estPairs=")), s"got $fewDecs")
    // discriminative: every doc's terms are unique to it => df ≈ 1,
    // ratio ≈ |terms-per-query|/|docs| ≈ 0 => the inverted index wins
    // at ANY size and must be chosen even above the old constant's
    // threshold shape
    val uniq = (1L to 6000L).map(id => (id, s"w${id}a w${id}b w${id}c"))
      .toDF("doc_id", "text")
    val uniqQ = uniq.where(col("doc_id") % 600 === 0)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    graft.StrategyLog.drain()
    Retrieval.bm25TopK(uniq, "doc_id", "text",
      uniqQ, "qid", "qtext", k = 3, rationalIdf = true).collect()
    val sparseDecs = graft.StrategyLog.drain().filter(_.op == "bm25TopK")
    assert(sparseDecs.exists(d => d.strategy == "sparse"
      && d.detail.contains("candidateRatio=")), s"got $sparseDecs")
  }

  test("dense switch falls back to sparse when the term dict is too wide") {
    val docs = corpus()
    val queries = docs.limit(3)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    // maxDenseTerms = 1 cannot hold the dict -> sparse runs even in
    // the dense regime; result must still be the sparse result
    val forced = Retrieval.bm25TopK(docs, "doc_id", "text",
      queries, "qid", "qtext", k = 3, rationalIdf = true,
      denseMinDocs = 0L, denseAboveCandidateRatio = 0.0,
      denseMinCandidatePairs = 0L,
      maxDenseTerms = 1)
    val sparse = Retrieval.bm25TopK(docs, "doc_id", "text",
      queries, "qid", "qtext", k = 3, rationalIdf = true,
      denseMinDocs = Long.MaxValue)
    assert(forced.exceptAll(sparse).isEmpty &&
      sparse.exceptAll(forced).isEmpty)
  }
}
