package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training pipelines.
  *
  * Assignment is a pure function of the row's ID (seeded xxhash64), so
  * splits are: stable across runs and cluster layouts, disjoint by
  * construction, and reproducible from the id alone — the properties
  * that matter when 100 TB of training data must never leak val rows
  * into train between pipeline versions. No RNG state, no
  * `randomSplit` (whose assignment depends on partitioning).
  *
  * The bucket count participates in the hash, so operators with
  * different granularities (percent vs basis-point) draw INDEPENDENT
  * hashes — composing hashSample with hashSplit does not correlate
  * (nested-moduli hashing would make a 50% sample land entirely in
  * "train").
  */
object Sampling {

  private def bucket(id: Column, seed: Int, buckets: Int): Column =
    pmod(xxhash64(lit(seed), lit(buckets), id), lit(buckets))

  /** Basis points from a percentage, rounded (truncation would undercut
    * e.g. 0.29% — 0.29*100 is 28.999... as a double).
    */
  private def basisPoints(pct: Double): Int = math.round(pct * 100).toInt

  /** Append a `split` column: "train" / "val" / "test" with the given
    * percentages (test gets the remainder).
    */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int, valPct: Int,
      seed: Int = 42): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "percentages must be within [0, 100]")
    val b = bucket(col(idCol), seed, 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic ~`pct`% sample (basis points of precision). */
  def hashSample(df: DataFrame, idCol: String, pct: Double,
      seed: Int = 42): DataFrame = {
    require(pct >= 0 && pct <= 100, "pct in [0, 100]")
    df.filter(bucket(col(idCol), seed, 10000) < basisPoints(pct))
  }

  /** Deterministic source-weighted corpus mixing ("data mixing"): keep
    * each row with probability `weights(source)` — upsample/downsample
    * corpus sources to a target recipe, the knob every training-data
    * pipeline turns last. Membership is a pure function of a PORTABLE
    * hash of (seed, id): the top-60 md5 bits scaled by 2^-60 give a
    * uniform in [0,1) that any engine with md5 reproduces bit-for-bit
    * (2^60 is a power of two, so the scaling is exact; the long→double
    * round is identical on both sides), unlike the xxhash64 samplers
    * above whose kept sets are only invariant-checkable. Unlisted
    * sources fall back to `defaultWeight`; weight 0 drops a source
    * entirely, 1 keeps it whole. NB: weights are PROBABILITIES in
    * [0, 1], not the percent scale of [[hashSample]]/[[stratifiedSample]]
    * — validated here so a percent-scale 50.0 fails fast instead of
    * silently keeping everything.
    */
  def weightedMix(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], seed: Long,
      defaultWeight: Double = 1.0): DataFrame = {
    (weights.values.toSeq :+ defaultWeight).foreach(w =>
      require(w >= 0 && w <= 1, s"every weight must be in [0, 1], got $w"))
    val u = graft.operators.TextDedup
      .md5Hash60(concat_ws(":", lit(seed), col(idCol)))
      .cast("double") / lit(math.pow(2, 60))
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (k, v)) => when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    df.where(u < w)
  }

  /** Per-stratum deterministic sampling rates, e.g. downsample one
    * over-represented language: unlisted strata keep everything.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], seed: Int = 42): DataFrame = {
    require(rates.values.forall(p => p >= 0 && p <= 100),
      "every rate must be in [0, 100]")
    val b = bucket(col(idCol), seed, 10000)
    val keep = rates.foldLeft(lit(true)) { case (acc, (stratum, pct)) =>
      when(col(strataCol) === stratum, b < basisPoints(pct)).otherwise(acc)
    }
    df.filter(keep)
  }

  /** Deterministic FIXED-SIZE sample per stratum — the distributed
    * answer to "give me exactly k examples from every source/language":
    * rank rows inside each stratum by the portable md5-60 uniform of
    * (seed, id) with the id as tie-break, keep ranks ≤ k. Unlike a
    * reservoir it is reproducible under any partitioning (the rank is a
    * pure function of the data), composable (same seed → same sample on
    * re-runs and across engines), and one shuffle on the stratum key.
    * Spark's WindowGroupLimit pushes the rank≤k filter into the sort,
    * so per-stratum state is O(k), not O(stratum). Strata far larger
    * than k are the point; strata smaller than k pass through whole.
    *
    * Output keeps every input column plus `sample_rank` (1-based).
    */
  def stratumTopK(df: DataFrame, strataCol: String, idCol: String,
      k: Int, seed: Long = 42L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = TextDedup.md5Hash60(concat_ws(":", lit(seed), col(idCol)))
    val w = Window.partitionBy(col(strataCol)).orderBy(u, col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= k)
  }
}
