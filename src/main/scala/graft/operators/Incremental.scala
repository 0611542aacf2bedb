package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (incremental view maintenance for
  * the distributive case): keep a materialized per-key aggregate up to
  * date by merging only the DELTA batch, never rescanning the base —
  * at 100 TB the difference between touching yesterday's partition and
  * recomputing the lake.
  *
  * Works for distributive/algebraic aggregates expressed in mergeable
  * form: SUM and COUNT merge by addition, MIN/MAX by min/max, AVG is
  * carried as (sum, count) and divided at read time — the same
  * partial-state discipline Spark's own two-phase HashAggregate uses,
  * lifted to batch boundaries. Holistic aggregates (exact median,
  * exact distinct) do not merge; route those to the sketch operators
  * (q40 HLL, q64 quantile sketch), which exist precisely because their
  * state DOES merge.
  *
  * Shape: unionByName + one groupBy on the key — the merge costs
  * O(|state| + |delta|), not O(|base|). The state table stays one row
  * per key, so successive merges don't grow it.
  */
object Incremental {

  /** Merge a maintained aggregate `state` with the same-schema partial
    * aggregate of a new batch. `merges` maps each state column to its
    * merge function over the pre-aggregated inputs (e.g. sum for
    * sums-of-cents and counts, min/max for bounds).
    */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String],
      merges: Seq[(String, Column => Column)]): DataFrame = {
    require(merges.nonEmpty, "at least one merge column")
    val all = state.unionByName(delta)
    all.groupBy(keys.map(col): _*)
      .agg(merges.head._2(col(merges.head._1)).as(merges.head._1),
        merges.tail.map { case (c, f) => f(col(c)).as(c) }: _*)
  }
}
