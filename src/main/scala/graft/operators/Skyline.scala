package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, minimize both dimensions) — the
  * dominance filter of multi-criteria curation: "keep documents no
  * other document beats on BOTH cost and quality-loss", model/data
  * frontier selection, price/latency frontiers. A point survives iff no
  * other point is <= in both dimensions and < in at least one
  * (Börzsönyi et al., "The Skyline Operator", ICDE 2001).
  *
  * Scale shape — NO single-task global sort and NO all-pairs join. The
  * classic sort-filter skyline needs a running minimum over the x
  * order; here that is the q70 chunk decomposition: (1) same-x
  * dominance collapses to one `groupBy(x).min(y)` hash aggregate
  * (corpus-sized pass, partial-aggregated); (2) the per-x minima —
  * at most |distinct x| rows — are range-partitioned by x, each chunk
  * computes its LOCAL strict-prefix running min in parallel, and the
  * per-chunk minima (one row per chunk) are prefix-combined and
  * broadcast back, so the frontier test `y < min(all y at smaller x)`
  * is exact without any global sort; (3) one semi-join brings back the
  * surviving original rows (equal duplicate frontier points all
  * survive, per the strict-dominance definition).
  */
object Skyline {

  /** Rows of `df` on the (minimize xCol, minimize yCol) frontier.
    * Null coordinates never survive (a null cannot be compared, so such
    * rows are dropped up front — filter them explicitly beforehand if
    * they need different treatment).
    */
  def frontier2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val nChunks = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val clean = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
    val g = clean.groupBy(col(xCol).as("__x"))
      .agg(min(col(yCol)).as("__y"))
    val chunked = g.repartitionByRange(nChunks, col("__x"))
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = chunked.withColumn("__lm", min(col("__y")).over(wLocal))
    // one row per chunk; the prefix window runs over nChunks rows only
    val chunkMins = chunked.groupBy(col("__pid"))
      .agg(min(col("__y")).as("__cm"))
    val wPrefix = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = chunkMins
      .withColumn("__pm", min(col("__cm")).over(wPrefix))
      .select(col("__pid"), col("__pm"))
    // least() skips nulls; null prev-min (first chunk, first row) means
    // nothing precedes -> survive
    val prevMin = least(col("__lm"), col("__pm"))
    val surviving = local.join(broadcast(prefix), Seq("__pid"))
      .where(prevMin.isNull || col("__y") < prevMin)
      .select(col("__x"), col("__y"))
    clean.join(surviving,
      col(xCol) === col("__x") && col(yCol) === col("__y"), "left_semi")
  }
}
