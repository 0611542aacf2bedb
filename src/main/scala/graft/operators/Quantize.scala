package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding compression for vector stores: symmetric per-vector int8
  * quantization — the standard way a 100 TB embedding corpus drops to
  * a quarter of its float32 footprint before ANN serving.
  *
  * Reference scope note: no analog in the reference; LLM-data-pipeline
  * surface (SURVEY §2.6) alongside the ANN operators.
  */
object Quantize {

  /** Per-vector symmetric int8 quantization summary.
    *
    * `scale = max|x| / 127`; each element maps to
    * `FLOOR(x/scale + 0.5)` which lands exactly in [-127, 127] (the
    * extreme element hits ±127 by construction, so no clamp is
    * needed). All arithmetic is correctly-rounded IEEE double ops in a
    * fixed order, so an independent engine reproduces every quantized
    * value bit-for-bit — the returned BIGINT aggregates (sum, L1, max)
    * pin every element: any single-element divergence shifts them.
    *
    * Relational shape: posexplode to (id, element) rows, per-id max
    * via a window that rides the same exchange as the final per-id
    * aggregate — 2 narrow passes, no driver-side vectors, scales
    * linearly in corpus x dimension.
    */
  def int8Summary(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val rows = df.select(col(idCol).as("__id"),
      posexplode(col(vecCol)).as(Seq("__i", "__xf")))
      .select(col("__id"), abs(col("__xf").cast("double")).as("__ax"),
        col("__xf").cast("double").as("__x"))
    val w = Window.partitionBy(col("__id"))
    val q = rows
      .withColumn("__scale", max(col("__ax")).over(w) / lit(127.0))
      .withColumn("__q",
        when(col("__scale") > 0,
          floor(col("__x") / col("__scale") + lit(0.5)).cast("long"))
          .otherwise(lit(0L)))
    q.groupBy(col("__id"))
      .agg(min(col("__scale")).as("scale"),
        sum(col("__q")).as("q_sum"),
        sum(abs(col("__q"))).as("q_l1"),
        max(col("__q")).as("q_max"),
        count(lit(1)).as("dim"))
      .withColumnRenamed("__id", idCol)
  }
}
