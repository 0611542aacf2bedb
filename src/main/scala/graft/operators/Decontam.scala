package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Train/eval decontamination: find training documents that share
  * verbatim n-grams with a held-out evaluation set — the standard
  * "did the benchmark leak into the training corpus?" check run
  * before every large training run.
  *
  * Reference scope note: no analog in the reference pipeline; part of
  * the LLM-data-pipeline surface (SURVEY §2.6).
  */
object Decontam {

  /** Distinct word n-grams per doc, pre-hashed to the PORTABLE 60-bit
    * md5 key ([[TextDedup.md5Hash60]]): fixed-width join keys instead
    * of variable-length shingle strings — the n-gram text never leaves
    * its scan stage, which is what keeps the shuffle narrow at corpus
    * scale. Hashing runs in the projection AFTER the explode so the
    * per-element work is codegen'd, not an interpreted lambda.
    */
  private def gramHashes(df: DataFrame, idCol: String, textCol: String,
      outId: String, n: Int): DataFrame = {
    val toks = df.select(col(idCol).as(outId),
      TextFunctions.tokens(col(textCol)).as("__t"))
    // explode_outer dodges InferFiltersFromGenerate's size(...)>0
    // filter, whose pushdown would re-run the shingle kernel + distinct
    // once more per row (same trade as TextDedup.shingleHashRows).
    // Empty/whitespace-only docs must produce no grams — the size<n
    // whole-text fallback would otherwise emit the "" gram and make two
    // empty docs count as sharing a verbatim n-gram. That exclusion is
    // the `=!= ""` filter on the GENERATOR OUTPUT: a doc has the ""
    // gram iff it has zero tokens (every token is non-empty, so any
    // real shingle is non-empty), and a post-Generate filter cannot be
    // pushed into the scan — the former `where(size(__t) > 0)` landed
    // there via alias substitution and re-ran the tokenizer per row.
    val grams = toks.select(col(outId),
      explode_outer(
          array_distinct(TextFunctions.shinglesFromTokens(col("__t"), n)))
        .as("__sh"))
      .where(col("__sh").isNotNull && col("__sh") =!= "")
    grams.select(col(outId), TextDedup.md5Hash60(col("__sh")).as("__h"))
  }

  /** One row per CONTAMINATED training doc: how many eval docs it
    * collides with and how many distinct n-grams are shared. Clean
    * docs are absent (callers left-join if they need zeros).
    *
    * Scale shape: the training side streams through explode→hash once;
    * the eval side (benchmarks are small by nature) is broadcast, so
    * there is no shuffle of the corpus at all — the only wide
    * operation is the final per-doc aggregate. A multi-TB eval side
    * would drop the broadcast hint and become a plain shuffled
    * equi-join on the hash; semantics are unchanged.
    */
  def contaminationReport(train: DataFrame, trainIdCol: String,
      trainTextCol: String, evalDocs: DataFrame, evalIdCol: String,
      evalTextCol: String, n: Int = 5): DataFrame = {
    val tr = gramHashes(train, trainIdCol, trainTextCol, "doc_id", n)
    val ev = gramHashes(evalDocs, evalIdCol, evalTextCol, "__eid", n)
    tr.join(broadcast(ev), Seq("__h"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("__eid")).as("n_eval_docs"),
        countDistinct(col("__h")).as("n_shared_ngrams"))
  }
}
