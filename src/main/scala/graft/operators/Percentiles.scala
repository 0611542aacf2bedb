package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort-based exact percentiles — the scale-correct replacement for
  * Spark's `Percentile` aggregate, which materializes every value of a
  * group into an in-memory multiset buffer (an OpenHashMap per partial)
  * and cannot exist at 100 TB group sizes. Here the value column is
  * SORTED per group by a window (Tungsten radix sort, spillable,
  * distributed by group key), each probe's two neighboring ranks are
  * selected by `row_number`, and the interpolation runs on ≤ 2·|probes|
  * rows per group. Memory per task is the sort buffer, not the group.
  *
  * Interpolation replicates `Percentile.getPercentile` EXACTLY —
  * `position = p·(n−1)`, and the weighted form
  * `(higher − position)·v_lo + (position − lower)·v_hi` (NOT
  * `v_lo + frac·Δ`, which rounds differently) — so results are
  * bit-identical to the aggregate it replaces.
  *
  * Still group-bounded by the window sort's partitioning; for groups
  * beyond that, use the mergeable sketch (`percentile_approx`, q64) —
  * the two are complementary tiers, exact/sorted vs approximate/merged.
  */
object Percentiles {

  /** One row per group: `p<label>` exact interpolated percentile for
    * each probe. Labels default to the probability's digits.
    */
  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
      probes: Seq[(Double, String)]): DataFrame = {
    require(probes.nonEmpty, "need at least one probe")
    probes.foreach { case (p, _) =>
      require(p >= 0 && p <= 1, s"probability $p outside [0, 1]") }
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col(valueCol))
    val wAll = Window.partitionBy(g: _*)
    val ranked = df
      .where(col(valueCol).isNotNull) // Percentile skips nulls; so do we
      .select(g :+ col(valueCol) :+
        (row_number().over(w) - 1).cast("double").as("__rk") :+
        count(lit(1)).over(wAll).as("__n"): _*)
    // a row survives iff it is the floor or ceil rank of some probe
    def pos(p: Double): Column = lit(p) * (col("__n") - 1).cast("double")
    val needed = probes.map { case (p, _) =>
      col("__rk") === floor(pos(p)) || col("__rk") === ceil(pos(p))
    }.reduce(_ || _)
    val aggs = probes.map { case (p, label) =>
      val lo = min(when(col("__rk") === floor(pos(p)), col(valueCol)))
      val hi = min(when(col("__rk") === ceil(pos(p)), col(valueCol)))
      val position = first(pos(p))
      // exact ranks: interpolation degenerates to the value itself
      when(first(floor(pos(p))) === first(ceil(pos(p))), lo)
        .otherwise((first(ceil(pos(p))) - position) * lo
          + (position - first(floor(pos(p)))) * hi)
        .as(s"p$label")
    }
    ranked.where(needed)
      .groupBy(g: _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
