package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table statistics profiling — the `ANALYZE TABLE ... FOR COLUMNS`
  * analog that feeds a cost-based optimizer: per-partition-group,
  * per-column row/null/distinct counts, min/max, and exact quartile
  * boundaries (an equi-depth histogram skeleton). At 100 TB these
  * numbers decide broadcast-vs-shuffle and join order; collecting them
  * must itself scale, which is why the unit here is a partition GROUP
  * (e.g. the table's partition key), never the whole table in one
  * unpartitioned pass: every stage below is keyed on the group, so the
  * profile of a 100 TB table is as parallel as the table. Global
  * figures roll up from the group rows (counts/min/max additively;
  * distincts via the mergeable HLL tier — q40).
  *
  * Scale shape: counts/null-counts/min/max/NDVs for ALL columns come
  * from one column-pruned scan per column (cheap, narrow); exact NDV is
  * a per-group count_distinct (one shuffle on the group key), emitted
  * NEXT TO the mergeable `approx_count_distinct` so a caller sees the
  * sketch's real error before trusting it at scale. Quartiles ride
  * [[Percentiles.exact]] (sort-based, group-partitioned window, no
  * value buffer).
  */
object Profile {

  /** One row per (group, profiled column): n, n_null, ndv_exact,
    * ndv_approx, min/max and p25/p50/p75 as doubles.
    */
  def columnStats(df: DataFrame, groupCol: String,
      columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "need at least one column")
    // ONE shared PER-GROUP scan computes every column's NaN-free bounds
    // and non-null count, then feeds them to
    // [[Percentiles.exactWithGroupStats]] — the adaptive percentile's
    // per-call eager bounds job would otherwise re-scan the table once
    // per profiled column (C extra full passes at plan-build time for a
    // C-column profile). Per-group (r13, ADVICE): with GLOBAL bounds a
    // large group confined to a sliver of the column's global range
    // landed in one chunk — the exact collapse the r12.2 per-group fix
    // killed on the self-measuring path recurred through Profile.
    val statAggs = columns.flatMap { c =>
      val vd = col(c).cast("double")
      Seq(min(when(!isnan(vd), vd)).as(s"__mn_$c"),
        max(when(!isnan(vd), vd)).as(s"__mx_$c"),
        count(col(c)).as(s"__n_$c"))
    }
    // |groups| rows, checkpointed ONCE and shared by every column's
    // bounds-broadcast join (lifetime: dies with the plans, see the
    // Percentiles checkpoint note)
    val gstats = df.groupBy(col(groupCol))
      .agg(statAggs.head, statAggs.tail: _*).localCheckpoint()
    val rollRow = gstats.agg(count(lit(1)).as("__ng"),
      columns.map(c => sum(col(s"__n_$c")).as(s"__t_$c")): _*).head()
    val nGroups = rollRow.getLong(0)
    val perColumn = columns.zipWithIndex.map { case (c, i) =>
      val base = df.groupBy(col(groupCol))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          count_distinct(col(c)).as("ndv_exact"),
          // rsd 0.02 (q40's setting): the default 0.05 measurably
          // drifts past 5% even at NDV ~50
          approx_count_distinct(col(c), 0.02).as("ndv_approx"),
          min(col(c)).cast("double").as("min"),
          max(col(c)).cast("double").as("max"))
      val gb = gstats.select(col(groupCol),
        col(s"__mn_$c").as("__bmn"), col(s"__mx_$c").as("__bmx"))
      val total = if (rollRow.isNullAt(1 + i)) 0L else rollRow.getLong(1 + i)
      val quartiles = Percentiles.exactWithGroupStats(df, Seq(groupCol), c,
          Seq(0.25 -> "25", 0.5 -> "50", 0.75 -> "75"),
          gb, total, nGroups)
        .withColumnRenamed(groupCol, "__qg")
      // LEFT + null-safe: a (group, column) pair whose column is entirely
      // NULL produces no quartile row (Percentiles.exact filters NULLs) —
      // an inner join would silently drop the whole profile row, losing
      // exactly the n/n_null/ndv=0 signal a profiler exists to report.
      // <=> keeps NULL group keys rather than dropping them.
      base.join(broadcast(quartiles), col(groupCol) <=> col("__qg"), "left")
        .select(col(groupCol), lit(c).as("column"), col("n"),
          col("n_null"), col("ndv_exact"), col("ndv_approx"),
          col("min"), col("max"), col("p25"), col("p50"), col("p75"))
    }
    perColumn.reduce(_ unionByName _).orderBy(col(groupCol), col("column"))
  }
}
