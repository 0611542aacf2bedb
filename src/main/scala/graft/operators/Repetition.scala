package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Within-document repetition statistics — the Gopher-family quality
  * filters (Rae et al. 2021, table A1): documents dominated by a few
  * repeated n-grams (boilerplate, navigation chrome, keyword stuffing,
  * degenerate generations) are poor training data even when every
  * individual line looks fine.
  *
  * Two signals per document, both exact integer counts so any engine
  * reproduces them bit-for-bit:
  *  - `top_2gram_frac` — share of all 2-gram occurrences taken by the
  *    single most frequent 2-gram (header/footer chrome detector);
  *  - `dup_5gram_frac` — share of 5-gram occurrences whose gram occurs
  *    more than once in the document (long-range self-copy detector).
  *
  * Shape: one tokenize projection, ONE explode producing (n, gram)
  * tagged rows for both gram sizes in a single generator pass, then two
  * hash aggregates — (doc_id, n, gram) occurrence counts, then per-doc
  * conditional rollups. Both aggregates carry map-side partials and the
  * second reuses the first's hash partitioning prefix, so the operator
  * costs one wide shuffle over the gram stream. No UDFs, no driver
  * state; scales as a straight corpus scan at 100 TB.
  */
object Repetition {

  /** Gopher-style defaults: drop docs whose top 2-gram covers > 20% of
    * 2-gram slots or whose duplicated 5-grams cover > 30% of 5-gram
    * slots. (Gopher uses character-mass fractions; token-slot fractions
    * are the same detector with an exact, engine-portable denominator.)
    */
  val defaultTop2Max: Double = 0.20
  val defaultDup5Max: Double = 0.30

  /** Per-document repetition stats + keep verdict.
    *
    * Output: `idCol, total_2grams, distinct_2grams, top_2gram_count,
    * top_2gram_frac, total_5grams, dup_5gram_tokens, dup_5gram_frac,
    * keep` — counts are exact longs; the two fractions are single
    * correctly-rounded double divisions of those longs.
    */
  def stats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      top2Max: Double = defaultTop2Max,
      dup5Max: Double = defaultDup5Max): DataFrame = {
    val id = col(idCol)
    // Separate projection: `__t` is referenced twice below, which is
    // exactly what stops CollapseProject from inlining the tokenizer
    // into both shingle builders (non-cheap alias, multiple references).
    val toks = docs.select(id, TextFunctions.tokens(col(textCol)).as("__t"))
    // One explode per n-gram order, unioned with a literal tag column —
    // replaces the former transform(…, g -> struct(n, g)) lambda (the
    // interpreted-HOF family; see graft.expressions.TextKernels). The
    // union re-runs the (native, single-pass) tokenizer once per side,
    // which is cheaper than one interpreted struct-wrap per gram.
    // explode_outer: shingle arrays are never empty (< n tokens yields
    // the whole-text gram), and the outer variant is exempt from
    // InferFiltersFromGenerate, whose pushed-down size(...)>0 filter
    // would re-run the shingle kernel per row (TextDedup precedent)
    def tagged(n: Int): DataFrame = toks
      .select(id, lit(n).as("__n"),
        explode_outer(TextFunctions.shinglesFromTokens(col("__t"), n))
          .as("__gram"))
    val grams = tagged(2).unionByName(tagged(5))
    val occ = grams.groupBy(id, col("__n"), col("__gram"))
      .agg(count(lit(1)).as("__c"))
    def only(n: Int, c: Column): Column = when(col("__n") === n, c)
    val perDoc = occ.groupBy(id).agg(
      sum(only(2, col("__c"))).as("total_2grams"),
      count(only(2, lit(1))).as("distinct_2grams"),
      max(only(2, col("__c"))).as("top_2gram_count"),
      sum(only(5, col("__c"))).as("total_5grams"),
      coalesce(sum(only(5, when(col("__c") > 1, col("__c")))), lit(0L))
        .as("dup_5gram_tokens"))
    perDoc.select(id,
      col("total_2grams"), col("distinct_2grams"), col("top_2gram_count"),
      (col("top_2gram_count").cast("double") /
        col("total_2grams").cast("double")).as("top_2gram_frac"),
      col("total_5grams"), col("dup_5gram_tokens"),
      (col("dup_5gram_tokens").cast("double") /
        col("total_5grams").cast("double")).as("dup_5gram_frac"))
      .withColumn("keep",
        col("top_2gram_frac") <= top2Max && col("dup_5gram_frac") <= dup5Max)
  }
}
