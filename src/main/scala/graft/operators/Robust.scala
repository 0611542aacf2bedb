package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust (median/MAD) outlier screening — the quality gate for metric
  * columns whose tails are exactly what you must not let distort the
  * threshold. Mean/stddev screens (q61's z-scores) move with the
  * outliers they hunt; the median and the median absolute deviation
  * are 50%-breakdown estimators, so a corrupted minority cannot shift
  * the fence. This is the standard screen for telemetry values,
  * document-quality metrics and label distributions before training.
  *
  * Exactness: medians come from [[Percentiles.exact]] (sort-based, no
  * per-group value buffer), deviations are single IEEE subtract/abs,
  * and the fence compare `dev > k·mad` multiplies once — every step is
  * correctly-rounded IEEE, so an independent engine reproduces the
  * verdict set bit-for-bit (the q61 sqrt argument; no libm anywhere).
  *
  * Scale shape: two window sorts partitioned by the group key (one for
  * the value median, one for the deviation median) + one broadcast-size
  * join of per-group medians back onto the rows + one final hash
  * aggregate. Group cardinality bounds the joined state, not row count.
  */
object Robust {

  /** Per-group robust summary: n, median, MAD, outlier count at the
    * `k·MAD` fence, and the worst absolute deviation.
    */
  def madSummary(df: DataFrame, groupCol: String, valueCol: String,
      k: Double): DataFrame = {
    require(k > 0, s"fence multiplier $k must be positive")
    val med = Percentiles.exact(df, Seq(groupCol), valueCol,
        Seq(0.5 -> "50"))
      .withColumnRenamed("p50", "__med")
      .withColumnRenamed(groupCol, "__mg")
    val withDev = df
      .where(col(valueCol).isNotNull)
      .join(broadcast(med), col(groupCol) === col("__mg"))
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
    val mad = Percentiles.exact(withDev, Seq(groupCol), "__dev",
        Seq(0.5 -> "50"))
      .withColumnRenamed("p50", "__mad")
      .withColumnRenamed(groupCol, "__madg")
    withDev
      .join(broadcast(mad), col(groupCol) === col("__madg"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        min(col("__med")).as("median"),
        min(col("__mad")).as("mad"),
        sum(when(col("__dev") > lit(k) * col("__mad"), 1L)
          .otherwise(0L)).as("n_outliers"),
        max(col("__dev")).as("worst_dev"))
      .orderBy(col(groupCol))
  }
}
