package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-frequency boilerplate detection — the n-gram generalization
  * of C4/RefinedWeb-style repeated-line filtering (strip content that
  * recurs across MANY documents: navigation chrome, license headers,
  * share buttons). A fragment is "boilerplate" when its document
  * frequency reaches `minDfFrac` of the corpus; a document's quality
  * signal is the fraction of its distinct fragments that are
  * boilerplate.
  *
  * The unit here is the word n-gram shingle (the corpus tables carry
  * single-line texts, so the line unit of the published filters
  * degenerates; the operator is unit-agnostic — any
  * explode-able fragment column slots into the same plan).
  *
  * Scale design (the 100 TB plan, in order of data movement):
  *   1. distinct-shingles per doc is a NARROW map over the scan
  *      (native [[graft.expressions.ShingleArray]] kernel +
  *      `array_distinct`), so per-doc totals never shuffle;
  *   2. document frequency is ONE hash aggregation keyed by shingle —
  *      partial (map-side) aggregation means the wire carries at most
  *      one row per distinct shingle per input partition, NOT the raw
  *      exploded stream;
  *   3. the boilerplate set (df ≥ threshold) is by construction tiny —
  *      heavy-hitter n-grams — and is BROADCAST back; the per-doc hit
  *      count is then a narrow broadcast join + partial-aggregated
  *      groupBy(doc_id) over only the matching rows.
  * The raw exploded stream therefore never crosses the network: the
  * alternative single-scan plan (shuffle-join exploded against df on
  * shingle, re-using the df exchange) was rejected because it ships
  * every (doc, shingle) row raw — exactly the volume partial
  * aggregation exists to avoid. The second source scan this costs is
  * columnar-pruned to (doc_id, text) and is the cheaper side of the
  * trade at any scale where the corpus outweighs its distinct-shingle
  * directory.
  */
object Boilerplate {

  /** Per-document boilerplate profile:
    * `doc_id, n_shingles (distinct), n_boiler, boiler_frac`.
    *
    * @param minDfFrac a shingle is boilerplate when it appears in at
    *                  least this fraction of all documents (relative
    *                  threshold, so the semantics survive corpus
    *                  growth unchanged — an absolute df cutoff
    *                  silently reclassifies at every scale-up)
    */
  def profile(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 3,
      minDfFrac: Double = 0.10): DataFrame = {
    val perDoc = docs.select(col(idCol),
      array_distinct(TextFunctions.shingles(col(textCol), n)).as("__sh"))
    // explode_OUTER + null filter: the non-outer variant's inferred
    // size(__sh) > 0 guard pushes into the scan, re-running the
    // shingle+distinct kernel per row (PLANS.md r7 addendum, trap 3)
    val exploded = perDoc
      .select(col(idCol), explode_outer(col("__sh")).as("__g"))
      .where(col("__g").isNotNull)
    // Document frequency: rows are distinct per doc already, so a
    // plain count IS the df. One partial-aggregated shuffle.
    val df = exploded.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
    val nDocs = docs.agg(count(lit(1)).as("__n_docs"))
    val boiler = df.join(broadcast(nDocs),
        col("__df").cast("double") >=
          col("__n_docs").cast("double") * minDfFrac)
      .select(col("__g"))
    val hits = exploded.join(broadcast(boiler), Seq("__g"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_boiler"))
    perDoc.select(col(idCol), size(col("__sh")).cast("long").as("n_shingles"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        when(col("n_shingles") > 0,
          coalesce(col("n_boiler"), lit(0L)).cast("double") /
            col("n_shingles").cast("double"))
          .otherwise(lit(0.0)).as("boiler_frac"))
  }

  /** Quality filter on top of [[profile]]: keep documents whose
    * boilerplate fraction stays below `maxBoilerFrac` (the C4 move:
    * drop chrome-dominated pages entirely rather than edit them).
    * Join is on the id only — the full rows re-attach via a
    * broadcast-able or shuffled id join, never carrying text through
    * the aggregation.
    */
  def filter(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 3, minDfFrac: Double = 0.10,
      maxBoilerFrac: Double = 0.5): DataFrame = {
    val keep = profile(docs, textCol, idCol, n, minDfFrac)
      .where(col("boiler_frac") < maxBoilerFrac)
      .select(col(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }
}
