package graft.operators

import org.apache.spark.sql.DataFrame
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
  * window over every document (one generator pass; documents shorter
  * than `w` contribute their whole text as a single window, so two
  * identical short docs still flag each other and every document is
  * present in the output), hash each window to the portable 60-bit md5
  * key, count occurrences corpus-wide, flag windows seen >= 2 times,
  * then merge each document's overlapping flagged windows into maximal
  * spans (gaps-and-islands over window start positions). A span's
  * tokens are covered by at least one duplicated window — exactly Lee
  * et al.'s "duplicated substring of at least w tokens" up to window
  * resolution.
  *
  * Scale shape — a strictly LINEAR pipeline, zero joins: tokenize →
  * windows → hash (all codegen'd, one corpus pass by construction),
  * ONE wide exchange on the fixed-width window hash (the window text
  * dies before the shuffle) for the occurrence count, one narrow
  * exchange on doc_id for the span merge, then two stacked hash
  * aggregates. The count rides an unordered window over the hash
  * partition instead of a groupBy+self-join — Catalyst's column pruning
  * and join-inferred not-null filters diverged the three join-shaped
  * consumers into three corpus scans (the r7 q26 trap, re-measured
  * here), while the window formulation cannot rescan anything. The
  * trade, stated: WindowExec buffers one hash-group at a time
  * (spillable, fixed-width rows), so a pathologically hot window —
  * boilerplate repeated 10⁹ times — buffers linearly; it never goes
  * quadratic (m occurrences → m rows, never m² pairs).
  */
object SubstringDedup {

  /** Per-document duplicated-span report over `df(idCol, textCol)`:
    * `doc_id, n_tokens, dup_tokens, n_spans, max_span, keep` (keep =
    * duplicated mass under half the document).
    */
  def dupSpanReport(df: DataFrame, idCol: String, textCol: String,
      w: Int = 5): DataFrame = {
    val flagged = flaggedWindows(df, idCol, textCol, w)
    val flag = col("__c") >= 2
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("__pos"))
    // Merge overlapping/adjacent flagged windows into maximal spans: a
    // new span starts where a flagged window's start clears every
    // previous flagged window's end (running max over the preceding
    // frame). Unflagged rows ride along with island = the latest
    // island id (or 0 before any span) and are excluded from the span
    // extents by the flag-conditional min/max.
    val prevEnd = max(when(flag, col("__pos") + w))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val islands = flagged
      .withColumn("__ni",
        when(flag && (prevEnd.isNull || col("__pos") > prevEnd), 1)
          .otherwise(0))
      .withColumn("__island", sum(col("__ni"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // Two stacked aggregates on the doc partitioning (no further
    // exchange): spans, then the per-doc report. Span ends clip at
    // n_tokens so a short doc's whole-text window never claims w
    // tokens.
    val spans = islands.groupBy(col("doc_id"), col("__island"))
      .agg(max(col("n_tokens")).as("__nt"),
        min(when(flag, col("__pos"))).as("__s"),
        max(when(flag, col("__pos"))).as("__e0"))
      .withColumn("__e", least(col("__e0") + w, col("__nt")))
    spans.groupBy(col("doc_id"))
      .agg(max(col("__nt")).cast("long").as("n_tokens"),
        coalesce(sum(when(col("__s").isNotNull, col("__e") - col("__s"))),
          lit(0L)).cast("long").as("dup_tokens"),
        count(when(col("__s").isNotNull, lit(1))).as("n_spans"),
        coalesce(max(when(col("__s").isNotNull, col("__e") - col("__s"))),
          lit(0L)).cast("long").as("max_span"))
      .withColumn("keep", col("dup_tokens") * 2 < col("n_tokens"))
  }

  /** The cleaning counterpart: rebuild each document's text with its
    * duplicated spans REMOVED (Lee et al. cut the spans rather than
    * drop the document). Returns `doc_id, clean_text, removed_tokens`.
    * Two corpus passes — the span pipeline above plus the
    * reconstruction join, which genuinely needs the token arrays back;
    * the per-doc span list is small by construction (merged maximal
    * intervals).
    */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
      w: Int = 5): DataFrame = {
    val flagged = flaggedWindows(df, idCol, textCol, w)
    val flag = col("__c") >= 2
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("__pos"))
    val prevEnd = max(when(flag, col("__pos") + w))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spanList = flagged
      .withColumn("__ni",
        when(flag && (prevEnd.isNull || col("__pos") > prevEnd), 1)
          .otherwise(0))
      .withColumn("__island", sum(col("__ni"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__island"))
      .agg(max(col("n_tokens")).as("__nt"),
        min(when(flag, col("__pos"))).as("__s"),
        max(when(flag, col("__pos"))).as("__e0"))
      .where(col("__s").isNotNull)
      .withColumn("__e", least(col("__e0") + w, col("__nt")))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("__s"), col("__e"))).as("__spans"))
    val toks = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("__t"))
    toks.join(spanList, Seq("doc_id"), "left")
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

  /** Shared head of both operators: positional windows with their
    * corpus-wide occurrence count (`doc_id, n_tokens, __pos, __c`).
    * The count is an unordered window over the hash partition — see
    * the object doc for why this beats groupBy+join here.
    */
  private def flaggedWindows(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("__t"))
    // posexplode position IS the window's start token index (the
    // kernel emits windows in order); _outer keeps the Generate from
    // inferring a size()-filter that pushdown would land in the scan,
    // re-running the tokenizer per row (engine-wide plan invariant).
    val wins = toks
      .select(col("doc_id"), size(col("__t")).as("n_tokens"),
        posexplode_outer(TextFunctions.shinglesFromTokens(col("__t"), w)))
      .toDF("doc_id", "n_tokens", "__pos", "__win")
    // The window TEXT dies here: the wide shuffle moves four
    // fixed-width columns, no strings.
    wins
      .select(col("doc_id"), col("n_tokens"), col("__pos"),
        TextDedup.md5Hash60(col("__win")).as("__h"))
      .withColumn("__c",
        count(lit(1)).over(Window.partitionBy(col("__h"))))
  }
}
