package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Poisson bootstrap — per-group confidence intervals
  * without resampling rows through the driver (Chamandy et al.,
  * "Estimating Uncertainty for Massive Data Streams", Google 2012):
  * each (row, replica) pair draws a Poisson(1) weight, so every
  * replica is a weighted mean computed in the SAME aggregation pass —
  * B replicas cost one B-way row explode + one hash aggregate, not B
  * shuffles, and no collect ever happens.
  *
  * Determinism contract: the Poisson draw inverts the exact cumulative
  * thresholds (literal doubles shared verbatim with the oracle SQL)
  * at a portable md5-60 uniform of (seed, id, replica) — the same
  * hash-uniform family as [[Sampling]] — so every weight, every
  * replica mean (exact int64 cents sums + one correctly-rounded
  * divide) and every rank-based CI endpoint reproduces bit-for-bit on
  * any engine.
  */
object Bootstrap {

  /** Cumulative Poisson(1) probabilities P(X <= k), k = 0..6; weights
    * above 7 are truncated (P ≈ 1e-5 per draw — a bias far below
    * bootstrap noise, and exactness of the CONTRACT matters more than
    * the tail: both engines truncate identically).
    */
  val poisson1Cdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712)

  /** The same thresholds as SQL literals (oracle splice). */
  val poisson1CdfSql: Seq[String] = poisson1Cdf.map(_.toString)

  /** Per-group mean of a 2-dp money column with a rank-based bootstrap
    * band: `(grp, n_rows, mean, ci_lo, ci_hi)` where the band is the
    * 2nd-smallest .. 2nd-largest of `replicas` Poisson-bootstrap
    * replica means (≈ 94% coverage at B = 32), ties broken by replica
    * index. Zero-total-weight replicas (possible only for tiny groups)
    * are excluded identically on both engines.
    */
  def poissonBootstrapCI(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, replicas: Int = 32, seed: Int = 42,
      portableHash: Boolean = true): DataFrame = {
    require(replicas >= 4, "need at least 4 replicas for a rank band")
    val cents = floor(col(valueCol) * 100 + 0.5).cast("long")
    val base = df.select(col(groupCol).as("grp"), col(idCol).as("__id"),
      cents.as("__c"))
    val point = base.groupBy(col("grp")).agg(
      count(lit(1)).as("n_rows"),
      (sum(col("__c")).cast("double") / count(lit(1)).cast("double")
        / lit(100.0)).as("__mean"))
    val reps = base.select(col("grp"), col("__id"), col("__c"),
      explode(array((0 until replicas).map(b => lit(b)): _*)).as("__b"))
    // The uniform's hash family is a deployment knob: md5-60 is the
    // cross-engine PORTABLE contract (the q130 oracle replays it in
    // DuckDB); xxhash64 is ~an order of magnitude cheaper per draw and
    // equally deterministic IN-ENGINE — a production pipeline that
    // doesn't need an external replayer should run portableHash=false
    // (measured: the md5 path dominates q130's bench time).
    val u = (if (portableHash)
        TextDedup.md5Hash60(concat_ws(":", lit(s"bs-$seed"),
          col("__id"), col("__b")))
      else
        shiftrightunsigned(
          xxhash64(lit(s"bs-$seed"), col("__id"), col("__b")), 4))
      .cast("double") /
      lit(1152921504606846976L).cast("double") // 2^60, exact in double
    val w = poisson1Cdf.zipWithIndex
      .foldRight(lit(poisson1Cdf.size.toLong)) { case ((t, k), rest) =>
        when(u < t, k.toLong).otherwise(rest)
      }
    val repMeans = reps.withColumn("__w", w)
      .groupBy(col("grp"), col("__b"))
      .agg(sum(col("__w") * col("__c")).as("__s"),
        sum(col("__w")).as("__n"))
      .where(col("__n") > 0)
      .select(col("grp"), col("__b"),
        (col("__s").cast("double") / col("__n").cast("double")
          / lit(100.0)).as("__m"))
    val wAsc = Window.partitionBy(col("grp"))
      .orderBy(col("__m").asc, col("__b").asc)
    val ranked = repMeans
      .withColumn("__rk", row_number().over(wAsc))
      .withColumn("__cnt", count(lit(1))
        .over(Window.partitionBy(col("grp"))))
    val band = ranked.groupBy(col("grp")).agg(
      max(when(col("__rk") === 2, col("__m"))).as("ci_lo"),
      max(when(col("__rk") === col("__cnt") - 1, col("__m"))).as("ci_hi"))
    point.join(band, Seq("grp"))
      .select(col("grp"), col("n_rows"), col("__mean").as("mean"),
        col("ci_lo"), col("ci_hi"))
  }
}
