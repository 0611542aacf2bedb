package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance (Kimball SCD Type 2): turn an
  * append-only change log into validity-interval dimension rows —
  * `(key, attrs, valid_from, valid_to, version, is_current)` — the
  * standard shape for point-in-time joins (and for training-data
  * pipelines, the lineage of any mutable metadata a corpus snapshot
  * depends on: license, domain reputation, source status at crawl time).
  *
  * Reference scope note: the reference pipeline's upsert (py:404-463)
  * is Type-1 (overwrite); Type-2 history is the natural extension once
  * the store is a data-lake table rather than one mutable PG row per
  * key.
  *
  * Scale shape: both passes are windows PARTITIONED BY the dimension
  * key — per-key sorts over naturally small per-key logs, hash
  * partitioning across keys, no global sort anywhere. The
  * change-collapse filter runs between two same-key windows, so the
  * second window reuses the first's hash partitioning (one exchange
  * total; the re-sort within partitions is over already-filtered rows).
  */
object Scd {

  /** Collapse an ordered change log to Type-2 validity intervals.
    *
    * Rows are ordered per `keyCol` by (`tsCol`, `tieCol`); a row is a
    * CHANGE when any of `attrCols` differs (null-safely) from the
    * previous row's values. Non-change rows are dropped; each change
    * row becomes a version with `valid_from` = its timestamp,
    * `valid_to` = the next change's timestamp (null while current),
    * `version` = 1-based change index, `is_current` = last change.
    */
  def type2(df: DataFrame, keyCol: String, attrCols: Seq[String],
      tsCol: String, tieCol: String): DataFrame = {
    require(attrCols.nonEmpty, "type2 needs at least one tracked attribute")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val attrs = struct(attrCols.map(col): _*)
    val changes = df
      .withColumn("__prev", lag(attrs, 1).over(w))
      // null-safe: first row per key (lag null) and genuine attr flips
      .where(!(col("__prev") <=> attrs))
      .drop("__prev")
    val cols = Seq(col(keyCol)) ++ attrCols.map(col) ++ Seq(
      col(tsCol).as("valid_from"),
      lead(col(tsCol), 1).over(w).as("valid_to"),
      row_number().over(w).cast("long").as("version"),
      lead(col(tsCol), 1).over(w).isNull.as("is_current"))
    changes.select(cols: _*)
  }
}
