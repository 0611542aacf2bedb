package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Self-trained bigram language-model fluency scoring — the shape of
  * CCNet-style perplexity filtering (score each document by how
  * predictable its token stream is under an n-gram LM; gibberish and
  * boilerplate-mangled text score low) with the LM estimated from the
  * corpus itself rather than a shipped model file.
  *
  * Per-bigram probability is the maximum-likelihood estimate
  * `P(w2|w1) = c(w1 w2) / c(w1 ·)`, where the prefix count is derived
  * from the bigram table (so both counts describe the same event
  * space). Scores are FIXED-POINT (`floor(1e9 * P + 0.5)` per bigram,
  * summed as integers — the q28 `score_fp` pattern): integer sums are
  * addition-order-independent, so the result is bit-identical across
  * engines and partitionings, where a floating sum of probabilities
  * would hash-diverge on aggregation order. The arithmetic mean of P
  * (not log-space perplexity) is deliberate: ln/exp are
  * correctly-rounded to within 1 ulp but NOT bit-identical across
  * JVM and C runtimes, which would break oracle hash equality; the
  * mean preserves the same ordering signal for filtering.
  *
  * Scale design: three shuffles, each over a REDUCED stream —
  *   1. per-(doc, bigram) occurrence counts (partial-aggregated; the
  *      wire carries distinct bigrams per doc, not raw positions);
  *   2. corpus bigram counts, aggregated from stream 1's output key
  *      minus the doc — partial again;
  *   3. the probability join on the bigram key + the final
  *      groupBy(doc) — the probe side is stream 1 (already deduped
  *      per doc), never the raw exploded positions.
  * The prefix-count table is one row per distinct FIRST TOKEN (the
  * unigram vocabulary) — orders of magnitude smaller than the bigram
  * table — and is broadcast. On a corpus whose unigram vocabulary
  * outgrows broadcast (hundreds of millions of distinct tokens), that
  * join degrades gracefully to a shuffle join on `w1` by dropping the
  * broadcast hint; the relative cost stays dominated by the bigram
  * join either way.
  *
  * Documents shorter than the bigram width fall back to the kernel's
  * whole-text single shingle ([[graft.expressions.TextKernels.shingles]],
  * mirrored by the oracle's CASE arm), so every document receives a
  * score and the output is total over the corpus.
  */
object LanguageModel {

  /** Per-document fluency: `doc_id, n_bigrams, score_fp, avg_p` where
    * `score_fp = Σ_positions floor(1e9·P(w2|w1) + 0.5)` and
    * `avg_p = score_fp / n_bigrams / 1e9` (de-scaled mean probability
    * in [0, 1], higher = more fluent under the corpus LM).
    */
  def bigramFluency(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // explode_OUTER + null filter: avoids the inferred size() > 0
    // guard re-running the shingle kernel at the scan (PLANS.md r7)
    val bg = docs.select(col(idCol),
        explode_outer(TextFunctions.shingles(col(textCol), 2)).as("__bg"))
      .where(col("__bg").isNotNull)
    // Stream 1: per-(doc, bigram) occurrences — the only pass over raw
    // positions, immediately collapsed by partial aggregation.
    val perDoc = bg.groupBy(col(idCol), col("__bg"))
      .agg(count(lit(1)).as("__occ"))
    // Stream 2: corpus bigram counts, from stream 1 (sum of occ), so
    // the raw explode is scanned once per stream, never re-shuffled.
    val c2 = perDoc.groupBy(col("__bg")).agg(sum(col("__occ")).as("__c2"))
    // Prefix (unigram-as-first-token) counts from the bigram table:
    // tiny relative to c2 — broadcast.
    val c1 = c2
      .groupBy(element_at(split(col("__bg"), " "), 1).as("__w1"))
      .agg(sum(col("__c2")).as("__c1"))
    val p = perDoc
      .join(c2, Seq("__bg"))
      .join(broadcast(c1),
        element_at(split(col("__bg"), " "), 1) === col("__w1"))
      .select(col(idCol), col("__occ"),
        floor(col("__c2").cast("double") * 1e9 /
          col("__c1").cast("double") + 0.5).as("__p_fp"))
    p.groupBy(col(idCol))
      .agg(sum(col("__occ")).as("n_bigrams"),
        sum(col("__occ") * col("__p_fp")).as("score_fp"))
      .select(col(idCol), col("n_bigrams"), col("score_fp"),
        (col("score_fp").cast("double") / col("n_bigrams").cast("double")
          / lit(1e9)).as("avg_p"))
  }
}
