package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: project an irregular event stream onto a
  * fixed per-key time grid and fill the gaps — the resample/ffill step
  * every telemetry or sensor pipeline (reference: daily weather
  * observations) runs before windowed feature extraction.
  *
  * Shape (all relational, no driver loops):
  *  1. caller buckets observations to grid cells and aggregates within
  *     each cell (one shuffle on (key, cell));
  *  2. [[gridFill]] derives each key's [min, max] cell span with a
  *     reuse of the same keyed aggregation, generates the dense grid
  *     with `sequence` + `explode` (narrow — no shuffle, no driver
  *     materialization of the grid), left-joins the observed cells,
  *     and forward-fills value columns with `last(ignoreNulls)` over a
  *     per-key ordered window.
  *
  * Scale: the dense grid is `keys × span/step` rows — the operator's
  * intrinsic output size; `sequence` generates it distributed, per
  * key. The ffill window shuffles once on the key; within a key the
  * ordering is by cell index (a long), so the sort is cheap and the
  * running `last` is O(1) state per value column. Skewed key spans
  * (one sensor with a 10-year history) parallelize per key only —
  * callers needing intra-key parallelism can first split the span into
  * coarse segments, ffill per segment, then stitch boundaries with one
  * extra pass (the standard prefix-scan decomposition).
  */
object Resample {

  /** Densify bucket-aggregated observations onto each key's full cell
    * span and forward-fill `valueCols` (each also kept raw; gaps get
    * `<col>_ffill` from the most recent observed cell). Adds `is_gap`.
    *
    * `obs` must have one row per (keys..., cellCol) — the caller's
    * bucketing aggregate guarantees that.
    */
  def gridFill(obs: DataFrame, keys: Seq[String], cellCol: String,
      valueCols: Seq[String]): DataFrame = {
    val k = keys.map(col)
    val span = obs.groupBy(k: _*)
      .agg(min(col(cellCol)).as("__lo"), max(col(cellCol)).as("__hi"))
    val grid = span.select(k :+
      explode(sequence(col("__lo"), col("__hi"))).as(cellCol): _*)
    val joined = grid.join(obs, keys :+ cellCol, "left")
    val w = Window.partitionBy(k: _*).orderBy(col(cellCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_ffill", last(col(c), ignoreNulls = true).over(w))
    }
    filled.withColumn("is_gap", col(valueCols.head).isNull)
  }

  /** Convenience: epoch-long bucketing column. Integral `div`, NOT
    * `/` — Spark's Divide casts both operands to double first, and
    * epoch-nanos exceed a double's exact-integer range. (Truncated
    * division — callers with pre-epoch timestamps should offset
    * first.)
    */
  def cell(tsExpr: String, step: Long): Column = expr(s"($tsExpr) div ${step}L")
}
