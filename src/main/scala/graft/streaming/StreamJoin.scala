package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins.
  *
  * Reference scope note: the reference is daily batch (py:62) — this
  * completes the engine's Structured Streaming surface (SURVEY §2.5)
  * next to watermark dedup, windowed aggregation and
  * flatMapGroupsWithState sessionization.
  */
object StreamJoin {

  /** Event-time interval join of two streams: rows pair when the keys
    * match and `leftTime ∈ [rightTime − before, rightTime + after]`.
    * The canonical enrichment shape — readings joined to the alerts
    * raised around them, clicks to impressions, spans to traces.
    *
    * BOTH sides carry the same watermark delay and the join condition
    * bounds event time in BOTH directions, which is exactly what lets
    * Spark evict buffered rows: each side's state holds only rows
    * younger than `watermark + the interval width`, so state is bounded
    * at any scale instead of growing with the stream. Inner joins emit
    * a pair as soon as both rows have arrived (no watermark wait);
    * rows older than the watermark are dropped on arrival.
    *
    * Column names must be disjoint across the two sides (standard for
    * stream-stream joins — alias before calling).
    */
  def intervalJoin(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      watermark: String, beforeMs: Long, afterMs: Long,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTime, watermark)
    val r = right.withWatermark(rightTime, watermark)
    val cond: Column = col(leftKey) === col(rightKey) &&
      col(leftTime) >= col(rightTime) - expr(s"INTERVAL $beforeMs MILLISECOND") &&
      col(leftTime) <= col(rightTime) + expr(s"INTERVAL $afterMs MILLISECOND")
    l.join(r, cond, joinType)
  }
}
