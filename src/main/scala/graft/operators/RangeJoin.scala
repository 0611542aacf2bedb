package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Scalable point-in-interval range join.
  *
  * Spark plans a raw `p BETWEEN s AND e` join condition as a broadcast
  * nested loop — O(|L|·|R|) and a driver-memory hazard. The scalable
  * composition bins the domain: each interval explodes to the bins it
  * overlaps, each point lands in exactly one bin, the join becomes an
  * EQUI-join on the bin id (hash shuffle, AQE-skew-splittable), and the
  * exact predicate filters within the bin. Each (point, interval) match
  * appears exactly once because a point has one bin and an interval is
  * listed once per bin.
  *
  * `binWidth` trades duplication for selectivity: interval rows replicate
  * `len/binWidth + 1` times; bins much wider than intervals degrade to
  * more filtering, much narrower to more replication. Pick ≈ median
  * interval length.
  */
object RangeJoin {

  /** Inner join of `points` to every interval containing the point
    * (inclusive bounds). Output: point columns ++ interval columns —
    * the two sides must not share column names.
    *
    * @param maxBinsPerInterval fail-fast ceiling on interval replication:
    *        one corrupt row with a huge [start, end] would otherwise ask
    *        sequence() for an unbounded array and kill the job with an
    *        opaque limit/OOM error deep in the shuffle
    */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Double, maxBinsPerInterval: Int = 10000): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points and intervals must not share column names: $shared")
    require(!(points.columns ++ intervals.columns).contains("__bin"),
      "__bin is reserved")
    val pb = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val loBin = floor(col(startCol) / binWidth).cast("long")
    val hiBin = floor(col(endCol) / binWidth).cast("long")
    val guarded = when(hiBin - loBin >= maxBinsPerInterval,
      raise_error(concat(lit(s"interval spans more than $maxBinsPerInterval "
        + "bins (corrupt bounds or binWidth too small): start="),
        col(startCol), lit(" end="), col(endCol))))
      .otherwise(hiBin)
    val ib = intervals.withColumn("__bin", explode(sequence(loBin, guarded)))
    pb.join(ib, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol)
        && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
