package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the single right row with the
  * greatest `rightTime <= leftTime` among equal join keys (the standard
  * point-in-time enrichment for event streams against slowly-changing
  * state).
  *
  * Spark has no native as-of join in the Scala DataFrame API, but it does
  * not need a custom SparkPlan either: the scalable composition is
  * union-both-sides → one hash shuffle on the key → per-key time sort →
  * running `last(right_payload, ignoreNulls)` window → keep left rows.
  * One exchange + per-key sort, identical plan shape to any windowed
  * aggregation, no broadcast requirement on either side, no row
  * explosion — this is the formulation that survives 100 TB (a
  * naive `join + filter + max` needs a per-pair aggregation that
  * re-shuffles the cross product).
  *
  * Tie rule: a right row at exactly `leftTime` matches (<=), and right
  * rows sort before left rows at equal timestamps. Callers wanting
  * deterministic output must make the right side unique per (key, time)
  * — see [[Queries.q32AsOfJoin]].
  */
object AsOfJoin {

  /** @param keys      equality key column names present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param rightCols right payload columns to carry onto matches
    * @return left rows having a match, with `rightCols` appended
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lpaySchema = left.schema
    val rpaySchema = right.select(rightCols.map(col): _*).schema
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__is_left"),
        struct(leftCols.map(col): _*).as("__lpay"),
        lit(null).cast(rpaySchema).as("__rpay")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__is_left"),
        lit(null).cast(lpaySchema).as("__lpay"),
        struct(rightCols.map(col): _*).as("__rpay")): _*)
    val unioned = l.unionByName(r)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1 && col("__match").isNotNull)
      .select(leftCols.map(c => col(s"__lpay.$c").as(c)) ++
        rightCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
