package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-free text featurization: deterministic feature-hashing
  * embeddings (HashingTF-style), the bridge from raw documents into the
  * vector operators ([[graft.operators.Similarity]]) without any
  * external model — docs → vectors → ANN/near-dup runs entirely inside
  * the engine.
  *
  * Relational shape: explode tokens, count per (doc, hash bucket), fold
  * the sparse counts into a dense L2-normalized float array — codegen'd
  * aggregates end to end, shuffle bounded by (docs × distinct buckets).
  */
object TextFeatures {

  /** @param dim embedding dimensionality (hash buckets)
    * @return (idCol, embedding array<float> L2-normalized; zero vector
    *         for empty docs)
    */
  def hashEmbed(df: DataFrame, idCol: String, textCol: String,
      dim: Int, seed: Int = 42): DataFrame = {
    require(dim > 0, "dim must be positive")
    val counts = df
      .select(col(idCol),
        explode(TextFunctions.tokens(coalesce(col(textCol), lit(""))))
          .as("__tok"))
      .select(col(idCol),
        pmod(xxhash64(lit(seed), col("__tok")), lit(dim)).as("__b"))
      .groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__n"))
    val sparse = counts
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__n"))))
        .as("__m"))
    // left join back onto the id set: token-less docs dropped by the
    // explode still get their promised zero vector
    val all = df.select(col(idCol)).join(sparse, Seq(idCol), "left")
    // dense + L2 normalize; norm referenced by every element, so staged
    // as its own projection (attribute, not per-element recompute)
    all
      .withColumn("__dense", transform(sequence(lit(0L), lit(dim - 1L)),
        i => coalesce(element_at(col("__m"), i), lit(0L)).cast("double")))
      .withColumn("__norm", sqrt(aggregate(col("__dense"), lit(0.0),
        (a, x) => a + x * x)))
      .select(col(idCol),
        transform(col("__dense"),
          x => when(col("__norm") > 0, x / col("__norm")).otherwise(0.0)
            .cast("float")).as("embedding"))
  }
}
