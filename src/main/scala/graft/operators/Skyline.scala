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
    // VALUE-DERIVED chunk id (r10; the q106 fix class): `local` and
    // `chunkMins` are two consumers of the chunked frame — a
    // spark_partition_id() over a sampled repartitionByRange can
    // disagree between them when AQE plans separate exchanges, and the
    // (pid)-keyed join below then mixes prefix minima across wrong
    // chunks. A min/max-scaled bucket of __x is a pure row function:
    // monotone in the x order (chunks stay order-aligned, equal x
    // shares a chunk), identical on every consumer, one bounded 1-row
    // aggregate for the bounds. The frontier test is chunking-invariant
    // by construction, so the double-arithmetic bucket boundaries only
    // need determinism, which IEEE floor provides.
    val b = g.agg(min(col("__x").cast("double")),
      max(col("__x").cast("double"))).head()
    val (mn, mx) =
      if (b.isNullAt(0)) (0.0, 0.0) else (b.getDouble(0), b.getDouble(1))
    val span = math.max(mx - mn, java.lang.Double.MIN_NORMAL)
    val chunked = g.withColumn("__chunk",
      least(lit(nChunks - 1L),
        floor((col("__x").cast("double") - lit(mn))
          / lit(span) * lit(nChunks.toDouble)).cast("long")))
    val wLocal = Window.partitionBy(col("__chunk")).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = chunked.withColumn("__lm", min(col("__y")).over(wLocal))
    // one row per chunk; the prefix window runs over nChunks rows only
    val chunkMins = chunked.groupBy(col("__chunk"))
      .agg(min(col("__y")).as("__cm"))
    // constant partition key: semantically identical to a global window
    // over this nChunks-row grid, but keeps WindowExec from WARNing
    // "No Partition Defined" on every execution (the grid-size
    // invariant lives in PlanAuditSpec, not in executor logs)
    val wPrefix = Window.partitionBy(lit(0)).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = chunkMins
      .withColumn("__pm", min(col("__cm")).over(wPrefix))
      .select(col("__chunk"), col("__pm"))
    // least() skips nulls; null prev-min (first chunk, first row) means
    // nothing precedes -> survive
    val prevMin = least(col("__lm"), col("__pm"))
    val surviving = local.join(broadcast(prefix), Seq("__chunk"))
      .where(prevMin.isNull || col("__y") < prevMin)
      .select(col("__x"), col("__y"))
    clean.join(surviving,
      col(xCol) === col("__x") && col(yCol) === col("__y"), "left_semi")
  }
}
