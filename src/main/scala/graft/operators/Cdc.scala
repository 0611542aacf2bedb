package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff / change-data derivation: given two versions of a
  * keyed table, emit the change set `(key..., change)` with `change ∈
  * {insert, delete, update}` — the reconciliation primitive of
  * snapshot-based pipelines (corpus version N vs N+1: which documents
  * appeared, vanished, or mutated — feeding incremental dedup,
  * retraining-set selection, and audit diffs).
  *
  * Scale shape: one full-outer hash equi-join on the key — the only
  * corpus-sized operation — with a null-safe struct compare deciding
  * `update` vs unchanged (unchanged rows are filtered out BEFORE any
  * downstream consumer, so the output is delta-sized). No window, no
  * sort, no driver state.
  */
object Cdc {

  /** Change rows between `oldDf` and `newDf` keyed by `keyCols`;
    * `compareCols` define row equality (null-safely). Output columns:
    * the key columns, `change`, and for each compared column `c` the
    * pair `old_c` / `new_c` (null on the absent side of
    * inserts/deletes).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs key columns")
    require(compareCols.nonEmpty, "snapshotDiff needs compare columns")
    val o = oldDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__op", lit(1))
    val n = newDf.select((keyCols ++ compareCols).map(col): _*)
      .toDF((keyCols ++ compareCols).map("__n_" + _): _*)
      .withColumn("__np", lit(1))
    val cond = keyCols.map(k => col(k) <=> col(s"__n_$k")).reduce(_ && _)
    val joined = o.join(n, cond, "full_outer")
    val same = compareCols.map(c => col(c) <=> col(s"__n_$c"))
      .reduce(_ && _)
    val change = when(col("__op").isNull, lit("insert"))
      .when(col("__np").isNull, lit("delete"))
      .when(same, lit(null)) // unchanged -> dropped
      .otherwise(lit("update"))
    val keyed = keyCols.map(k => coalesce(col(k), col(s"__n_$k")).as(k))
    val pairs = compareCols.flatMap(c =>
      Seq(col(c).as(s"old_$c"), col(s"__n_$c").as(s"new_$c")))
    joined.withColumn("__chg", change)
      .where(col("__chg").isNotNull)
      .select(keyed ++ Seq(col("__chg").as("change")) ++ pairs: _*)
  }
}
