package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Token-level feature selection for classifier-based corpus filtering.
  *
  * Quality/domain classifiers (the fastText-style filters used to
  * curate web corpora) are trained on labeled documents; the standard
  * first step is scoring every vocabulary token's association with the
  * label so the feature set (or an interpretable filter list) can be
  * capped to the top discriminators. Chi-square over the presence
  * contingency table is the classic score (Yang & Pedersen, ICML 1997).
  *
  * Reference scope note: the reference pipeline has no text stage at
  * all — this operator serves the LLM-data-pipeline surface
  * (SURVEY §2.6) alongside lang-id (q24) and quality scoring (q23).
  *
  * Scale shape: ONE corpus-sized pass (tokenize → distinct-presence
  * explode → partial-aggregated (token, class) counts); everything
  * after is vocabulary-sized — the per-token document frequency is a
  * window sum over the (token, class) aggregate (vocab × classes rows),
  * class totals and the corpus size broadcast, and the per-class top-k
  * is a rank window that WindowGroupLimit prunes to k rows per
  * partition before the final shuffle.
  *
  * Determinism contract: the contingency cells a/b/c/d, the cross
  * term `ad−bc` and the pairwise marginal products are exact int64
  * (each bounded by N² — exact while N ≲ 3e9 docs); the square and
  * the 4-way denominator product are formed in DOUBLE (the all-int64
  * numerator is ~N⁵/16 and overflows at ~20k docs), and `chi2_fp` is
  * a FIXED sequence of correctly-rounded IEEE double ops finished by
  * one divide + floor into fixed-point millionths — any engine
  * replaying the sequence agrees bit-for-bit.
  */
object FeatureSelect {

  /** Top-k tokens per class by presence chi-square.
    *
    * Returns `(cls, rank, token, df_in_cls, df, chi2_fp)`: `df_in_cls`
    * = docs of the class containing the token (the `a` cell), `df` =
    * docs containing it overall, `chi2_fp` = chi-square statistic in
    * millionths. Only (token, class) pairs that co-occur are scored —
    * the score of an absent pair is driven by the same table and adds
    * no filtering signal.
    */
  def chiSquareTokens(docs: DataFrame, idCol: String, textCol: String,
      classCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val base = docs.select(col(classCol).as("cls"),
      array_distinct(TextFunctions.tokens(col(textCol))).as("__t"))
    // explode_OUTER + null filter: the inferred size() > 0 guard must
    // not re-run the tokenizer at the scan (PLANS.md r7)
    val present = base.select(col("cls"), explode_outer(col("__t")).as("token"))
      .where(col("token").isNotNull)
    val a = present.groupBy(col("token"), col("cls"))
      .agg(count(lit(1)).as("df_in_cls"))
    val withDf = a.withColumn("df",
      sum(col("df_in_cls")).over(Window.partitionBy(col("token"))))
    val byCls = base.groupBy(col("cls")).agg(count(lit(1)).as("__nc"))
      .withColumnRenamed("cls", "__c")
    val nTot = base.agg(count(lit(1)).as("__N"))
    val cells = withDf
      .join(broadcast(byCls), col("cls") === col("__c"))
      .crossJoin(broadcast(nTot))
      .select(col("cls"), col("token"), col("df_in_cls"), col("df"),
        col("df_in_cls").as("__a"),
        (col("df") - col("df_in_cls")).as("__b"),
        (col("__nc") - col("df_in_cls")).as("__c2"),
        (col("__N") - col("df") - col("__nc") + col("df_in_cls")).as("__d"),
        col("__N"))
    // overflow discipline (r8 sf1 lesson: the all-int64 numerator
    // N*(ad-bc)^2 is ~N^5/16 and dies at ~20k docs): every int64
    // intermediate is bounded by N^2 (ad, bc, the pairwise marginal
    // products — exact while N <= 3e9 docs); the square and the final
    // 4-way product happen in DOUBLE, a fixed correctly-rounded
    // sequence both engines replay identically.
    val diff = (col("__a") * col("__d") - col("__b") * col("__c2"))
      .cast("double")
    val numD = col("__N").cast("double") * diff * diff
    val denD = ((col("__a") + col("__b")) * (col("__c2") + col("__d")))
      .cast("double") *
      ((col("__a") + col("__c2")) * (col("__b") + col("__d")))
        .cast("double")
    val scored = cells.select(col("cls"), col("token"),
      col("df_in_cls"), col("df"),
      when(denD > 0.0,
        floor(lit(1000000.0) * numD / denD).cast("long"))
        .otherwise(lit(0L)).as("chi2_fp"))
    val w = Window.partitionBy(col("cls"))
      .orderBy(col("chi2_fp").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("cls"), col("rank"), col("token"), col("df_in_cls"),
        col("df"), col("chi2_fp"))
  }
}
