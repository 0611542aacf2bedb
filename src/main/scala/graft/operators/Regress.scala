package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-wise ordinary least squares — the "ML-lite" aggregate of a
  * curation pipeline (per-source quality-vs-length trends, per-domain
  * cost models, drift lines per cohort): y = a + b·x fit per group in
  * ONE aggregation pass from the five sufficient statistics
  * (n, Σx, Σy, Σxy, Σx²); no iteration, no per-group collect.
  *
  * Determinism contract: inputs are quantized to integer cents
  * (2-dp money values recover exactly — the engine-wide moneySum
  * pattern), the five sums are EXACT order-independent int64
  * aggregates, and the slope/intercept are a fixed sequence of
  * correctly-rounded IEEE double ops over those sums —
  * `b = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)`, `a = (Sy − b·Sx)/n` —
  * replayed verbatim by the oracle, so the fixed-point outputs match
  * bit-for-bit. (The cross terms are formed in DOUBLE: n·Sxy overflows
  * int64 at ~1e6 rows; int64→double conversion is itself correctly
  * rounded, so both engines see identical operands.)
  */
object Regress {

  /** Per-group OLS of `yCol` on `xCol` (both 2-dp money-like doubles).
    * Returns `(group, n, slope_fp, intercept_fp)` with the fitted line
    * in fixed-point millionths (y-cents per x-cent, and cents).
    * Groups with zero x-variance get null fits.
    */
  def olsByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val qx = floor(col(xCol) * 100 + 0.5).cast("long")
    val qy = floor(col(yCol) * 100 + 0.5).cast("long")
    val sums = df.select(col(groupCol).as("grp"), qx.as("__x"), qy.as("__y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
    val nD = col("n").cast("double")
    val sxD = col("__sx").cast("double")
    val syD = col("__sy").cast("double")
    val num = nD * col("__sxy").cast("double") - sxD * syD
    val den = nD * col("__sxx").cast("double") - sxD * sxD
    val slope = num / den
    sums.select(col("grp"), col("n"),
      when(den =!= 0.0,
        floor(lit(1000000.0) * slope).cast("long")).as("slope_fp"),
      when(den =!= 0.0,
        floor(lit(1000000.0) * ((syD - slope * sxD) / nD)).cast("long"))
        .as("intercept_fp"))
  }
}
