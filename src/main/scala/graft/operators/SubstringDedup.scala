package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact substring-level deduplication: find the token SPANS that occur
  * more than once across the corpus (or within one document) and report,
  * per document, how much of it is duplicated text — the span-granular
  * dedup modality of "Deduplicating Training Data Makes Language Models
  * Better" (Lee et al., 2021), complementing the doc-level (exact q25,
  * MinHash q26) and fragment-frequency (boilerplate q93) passes: those
  * flag whole documents, this one localizes the duplicated REGIONS, the
  * signal used to cut repeated licence headers / navigation chrome /
  * quoted passages out of otherwise-unique pages.
  *
  * Algorithm (suffix-array-free, shuffle-friendly): slide a `w`-token
  * window over every document (one generator pass), hash each window to
  * the portable 60-bit md5 key, count occurrences corpus-wide, keep
  * windows seen >= 2 times, then merge each document's overlapping
  * duplicated windows into maximal spans (gaps-and-islands over window
  * start positions). A span's tokens are covered by at least one
  * duplicated window, exactly Lee et al.'s "duplicated substring of at
  * least w tokens" up to window resolution.
  *
  * Scale shape: ONE pass over the corpus text (tokenize → windows →
  * hash, all codegen'd); one hash-key aggregate with map-side partials;
  * the flag join is an equi-join on the same 60-bit key so the
  * aggregate's exchange is reused; span merge runs per-document windows
  * over only the DUPLICATED rows (a small fraction of windows on real
  * corpora); the per-doc base rides a narrow (doc_id, n_tokens)
  * aggregate instead of a second tokenize pass. Nothing is quadratic:
  * an m-occurrence window contributes m rows, not m² pairs.
  */
object SubstringDedup {

  /** Per-document duplicated-span report over `df(idCol, textCol)`:
    * `doc_id, n_tokens, dup_tokens, n_spans, max_span, keep` (keep =
    * duplicated mass under half the document). Documents shorter than
    * `w` tokens have zero windows and report zeros.
    */
  def dupSpanReport(df: DataFrame, idCol: String, textCol: String,
      w: Int = 5): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("__t"))
    val nt = size(col("__t"))
    // Positional w-windows via the NATIVE shingle kernel (one codegen'd
    // pass; a transform/slice HOF here would run interpreted — the
    // engine-wide no-lambda plan invariant). posexplode's position IS
    // the window's start token index because ShingleArray emits windows
    // in order. The `when` guard keeps sub-w docs windowless (the
    // kernel's whole-text fallback would otherwise alias them with
    // doc-level exact dedup), and posexplode_outer keeps them as a null
    // row (so the per-doc base below sees every document) while, as in
    // Decontam.gramHashes, dodging InferFiltersFromGenerate pushing a
    // size()-predicate into the scan where it would re-run the
    // tokenizer kernel per row.
    val wins = toks
      .select(col("doc_id"), nt.as("n_tokens"),
        posexplode_outer(when(nt >= w,
          TextFunctions.shinglesFromTokens(col("__t"), w))))
      .toDF("doc_id", "n_tokens", "__pos", "__win")
    val hashed = wins.withColumn("__h", TextDedup.md5Hash60(col("__win")))

    // Corpus-wide occurrence count; >= 2 ⇒ the window text is duplicated
    // (across documents OR repeated inside one). Both sides of the flag
    // join are hash-partitioned on __h, so the planner reuses the
    // aggregate's exchange rather than reshuffling the corpus.
    val dupKeys = hashed.where(col("__h").isNotNull)
      .groupBy(col("__h")).count().where(col("count") >= 2)
      .select(col("__h"))
    val dupRows = hashed.join(dupKeys, Seq("__h"), "left_semi")
      .select(col("doc_id"), col("__pos"))

    // Merge overlapping/adjacent windows into maximal spans: a new span
    // starts where the window's start clears every previous window's
    // end (rows are per-document and ordered by position, so "previous
    // max end" is a running max; two windows overlap or touch iff
    // pos <= prevEnd).
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("__pos"))
    val prevEnd = max(col("__pos") + w)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val islands = dupRows
      .withColumn("__ni",
        when(prevEnd.isNull || col("__pos") > prevEnd, 1).otherwise(0))
      .withColumn("__island", sum(col("__ni"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val spans = islands.groupBy(col("doc_id"), col("__island"))
      .agg(min(col("__pos")).as("__s"), (max(col("__pos")) + w).as("__e"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("__e") - col("__s")).as("dup_tokens"),
        max(col("__e") - col("__s")).cast("long").as("max_span"))

    // Per-doc base WITHOUT a second corpus pass: (doc_id, n_tokens) is
    // constant per doc, so the aggregate is narrow after partial combine.
    val base = hashed.groupBy(col("doc_id"))
      .agg(max(col("n_tokens")).cast("long").as("n_tokens"))
    base.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("max_span"), lit(0L)).as("max_span"),
        (coalesce(col("dup_tokens"), lit(0L)) * 2 < col("n_tokens"))
          .as("keep"))
  }

  /** The cleaning counterpart: rebuild each kept document's text with
    * its duplicated spans REMOVED (Lee et al. cut the spans rather than
    * drop the document). Returns `doc_id, clean_text, removed_tokens`.
    * Same scale shape as [[dupSpanReport]] plus one per-doc span
    * collect (spans per doc are few by construction — merged maximal
    * intervals) and a final projection that filters the token array
    * against the span list, all in codegen-able Column algebra.
    */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
      w: Int = 5): DataFrame = {
    // Spans are re-derived rather than threaded through from
    // [[dupSpanReport]] (cheap relative to text) — callers wanting both
    // outputs should cache; keeping the operators independent keeps
    // each plan simple.
    val toks = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("__t"))
    val nt = size(col("__t"))
    val wins = toks
      .select(col("doc_id"), posexplode_outer(when(nt >= w,
        TextFunctions.shinglesFromTokens(col("__t"), w))))
      .toDF("doc_id", "__pos", "__win")
    val hashed = wins.withColumn("__h", TextDedup.md5Hash60(col("__win")))
    val dupKeys = hashed.where(col("__h").isNotNull)
      .groupBy(col("__h")).count().where(col("count") >= 2)
      .select(col("__h"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("__pos"))
    val prevEnd = max(col("__pos") + w)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = hashed.join(dupKeys, Seq("__h"), "left_semi")
      .select(col("doc_id"), col("__pos"))
      .withColumn("__ni",
        when(prevEnd.isNull || col("__pos") > prevEnd, 1).otherwise(0))
      .withColumn("__island", sum(col("__ni"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__island"))
      .agg(min(col("__pos")).as("__s"), (max(col("__pos")) + w).as("__e"))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("__s"), col("__e"))).as("__spans"))
    toks.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        array_join(
          filter(col("__t"), (tok, i) => !exists(
            coalesce(col("__spans"),
              array().cast("array<struct<__s:int,__e:int>>")),
            sp => i >= sp("__s") && i < sp("__e"))),
          " ").as("clean_text"),
        coalesce(aggregate(col("__spans"),
          lit(0), (acc, sp) => acc + (sp("__e") - sp("__s"))), lit(0))
          .cast("long").as("removed_tokens"))
  }
}
