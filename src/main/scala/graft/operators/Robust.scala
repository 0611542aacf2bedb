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
    // The median table is broadcast-sized by contract (one row per
    // group), and it sits INSIDE the second Percentiles.exact call's
    // input — whose adaptive strategy runs an eager bounds/count job
    // (r12) that would otherwise re-execute the full median ranking
    // once per downstream job. localCheckpoint materializes those
    // |groups| rows exactly once; every later job (the MAD bounds job,
    // the MAD ranking, the final fence aggregate) reads the cached
    // blocks instead of re-sorting the value stream.
    val med = Percentiles.exact(df, Seq(groupCol), valueCol,
        Seq(0.5 -> "50"))
      .withColumnRenamed("p50", "__med")
      .withColumnRenamed(groupCol, "__mg")
      .localCheckpoint()
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

  /** Winsorized per-group statistics: clip values to the exact
    * [p_lo, p_hi] percentile fences, then aggregate — tail-robust
    * summary stats without discarding rows (metric-column cleaning
    * before training; the keep-the-row counterpart of a filter).
    *
    * Output per group: n, the two fences, the clipped mean, and the
    * count of rows the clip touched. The clipped mean is an exact
    * cents sum (`FLOOR(x·100+0.5)` BIGINT, order-independent) with ONE
    * double division at the end — the engine's standard hash-portable
    * money/metric pattern. Fences are [[Percentiles.exact]] (no
    * per-group value buffer), broadcast back onto rows.
    */
  def winsorizedStats(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"fences ($pLo, $pHi) must satisfy 0 <= lo < hi <= 1")
    val fences = Percentiles.exact(df, Seq(groupCol), valueCol,
        Seq(pLo -> "_lo", pHi -> "_hi"))
      .withColumnRenamed("p_lo", "fence_lo")
      .withColumnRenamed("p_hi", "fence_hi")
      .withColumnRenamed(groupCol, "__fg")
    val clipped = df
      .where(col(valueCol).isNotNull)
      .join(broadcast(fences), col(groupCol) === col("__fg"))
      .withColumn("__clip",
        least(greatest(col(valueCol), col("fence_lo")), col("fence_hi")))
    clipped.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        min(col("fence_lo")).as("fence_lo"),
        min(col("fence_hi")).as("fence_hi"),
        (sum(floor(col("__clip") * 100 + lit(0.5)).cast("long"))
          .cast("double") / 100 / count(lit(1))).as("clipped_mean"),
        sum(when(col("__clip") =!= col(valueCol), 1L).otherwise(0L))
          .as("n_clipped"))
      .orderBy(col(groupCol))
  }
}
