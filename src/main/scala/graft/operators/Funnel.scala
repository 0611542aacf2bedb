package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: for each user, the earliest completion of a
  * step sequence (step i+1 must occur strictly after the user's chosen
  * step i) — the product-analytics operator behind "view → cart →
  * purchase" conversion reports.
  *
  * Semantics are the standard greedy first-completion: the user's
  * earliest step-1 event anchors the chain, then the earliest step-2
  * event strictly after it, and so on. Greedy is correct for "did the
  * user ever complete the ordered funnel": any completion implies the
  * greedy one (each greedy anchor is ≤ the corresponding event of the
  * completing chain, by induction).
  *
  * Shape: one filtered min-aggregate per step, each joined to the
  * previous step's per-user anchor. Every stage shuffles only the rows
  * matching that step's predicate (funnels narrow fast), keyed by user
  * — no window over the full event stream, no per-user event
  * materialization. Step count is the (small, static) number of
  * passes; each pass's anchor table is per-user (small) and
  * broadcastable when the funnel has already narrowed.
  */
object Funnel {

  /** Per-user anchor timestamps for each step. Output: one row per user
    * that completed step 1, with `step_1_ts .. step_N_ts` (null once the
    * chain breaks) and `steps_completed` / `completed`.
    *
    * `tsCol` must be totally ordered per user for deterministic
    * results when duplicates exist (an integral epoch column is ideal).
    */
  def firstCompletion(df: DataFrame, userCol: String, tsCol: String,
      steps: Seq[Column]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = df.select(Seq(col(userCol), col(tsCol)) ++ steps.zipWithIndex.map {
      case (p, i) => p.as(s"__is_$i")
    }: _*)
    val first = ev.where(col("__is_0"))
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("step_1_ts"))
    val anchored = steps.indices.drop(1).foldLeft(first) { (acc, i) =>
      val next = ev.where(col(s"__is_$i"))
        .join(acc.select(col(userCol), col(s"step_${i}_ts")), Seq(userCol))
        .where(col(tsCol) > col(s"step_${i}_ts"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"step_${i + 1}_ts"))
      acc.join(next, Seq(userCol), "left")
    }
    val completedCount = steps.indices
      .map(i => when(col(s"step_${i + 1}_ts").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    anchored
      .withColumn("steps_completed", completedCount)
      .withColumn("completed", col(s"step_${steps.size}_ts").isNotNull)
  }
}
