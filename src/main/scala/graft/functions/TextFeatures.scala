package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-free text featurization: deterministic feature-hashing
  * embeddings (HashingTF-style), the bridge from raw documents into the
  * vector operators ([[graft.operators.Similarity]]) without any
  * external model — docs → vectors → ANN/near-dup runs entirely inside
  * the engine.
  *
  * Relational shape (round-4 rewrite): explode tokens, count per
  * (doc, bucket) — the narrow codegen'd aggregate that collapses the
  * token stream to at most `dim` rows per doc — then one more
  * HashAggregate per doc of `dim` conditional sums
  * (`sum(when(bucket = i, n))`, unrolled at plan-build time) assembled
  * into the dense array and L2-normalized as flat column algebra. The
  * round-3 second stage (collect_list into a map → HOF fold) was
  * measured fragile on two axes: collect_list is an
  * ObjectHashAggregate that falls back to slow sort-based object
  * aggregation past 128 groups per partition, and nested interpreted
  * higher-order lambdas degrade run-over-run as interpreter call sites
  * go megamorphic. Putting the conditional sums on the PRE-AGGREGATED
  * counts (not the raw token rows — measured 2.3× slower: dim
  * comparisons per token add up) keeps both stages codegen'd with
  * zero object aggregates and zero lambdas.
  */
object TextFeatures {

  /** @param dim embedding dimensionality (hash buckets)
    * @return (idCol, embedding array<float> L2-normalized; zero vector
    *         for empty docs)
    */
  def hashEmbed(df: DataFrame, idCol: String, textCol: String,
      dim: Int, seed: Int = 42): DataFrame = {
    // The cap is a CODEGEN bound, not a memory bound: the second stage
    // unrolls `dim` sum(when(...)) columns, and whole-stage codegen
    // bails out past spark.sql.codegen.maxFields (default 100) — past
    // that, the stage silently runs interpreted, reintroducing exactly
    // the fragile path this rewrite exists to avoid (and near the old
    // 4096 cap the generated class additionally risked the 64KB
    // method / constant-pool fallback). 64 unrolled columns + id stays
    // under the 100-field default with headroom; PlanAuditSpec asserts
    // the q50 embed stage actually stays inside WholeStageCodegen.
    // Need wider vectors? Raise maxFields in the session AND re-verify
    // the plan; don't just lift this require.
    require(dim > 0 && dim <= 64,
      s"dim must be in 1..64 (codegen'd unrolled aggregate; see comment), got $dim")
    // explode_OUTER + null filter: avoids the inferred size() > 0
    // guard re-running the tokenizer at the scan (PLANS.md r7)
    val bucketed = df
      .select(col(idCol),
        explode_outer(TextFunctions.tokens(coalesce(col(textCol), lit(""))))
          .as("__tok"))
      .where(col("__tok").isNotNull)
      .select(col(idCol),
        pmod(xxhash64(lit(seed), col("__tok")), lit(dim)).as("__b"))
      .groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
    val cnts = (0 until dim).map(i =>
      sum(when(col("__b") === i, col("__cnt")).otherwise(0L)).as(s"__c$i"))
    val dense = bucketed.groupBy(col(idCol)).agg(cnts.head, cnts.tail: _*)
    // left join back onto the id set: token-less docs dropped by the
    // explode still get their promised zero vector
    val all = df.select(col(idCol)).join(dense, Seq(idCol), "left")
    val comps = (0 until dim).map(c =>
      coalesce(col(s"__c$c"), lit(0L)).cast("double"))
    // norm staged as its own projection (attribute, not per-element
    // recompute); all flat codegen — no higher-order functions
    all
      .withColumn("__norm",
        sqrt(comps.map(c => c * c).reduce(_ + _)))
      .select(col(idCol),
        array(comps.map(c =>
          when(col("__norm") > 0, c / col("__norm")).otherwise(0.0)
            .cast("float")): _*).as("embedding"))
  }
}
