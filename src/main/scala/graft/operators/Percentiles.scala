package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort-based exact percentiles — the scale-correct replacement for
  * Spark's `Percentile` aggregate, which materializes every value of a
  * group into an in-memory multiset buffer (an OpenHashMap per partial)
  * and cannot exist at 100 TB group sizes.
  *
  * r12 (VERDICT r11 item 1): ranking is CHUNK-DECOMPOSED — the engine's
  * q70/q106 chunked-rank shape — instead of one window partition per
  * group. The pre-r12 `Window.partitionBy(group).orderBy(value)` put
  * each group's ENTIRE value stream through a single sort task: correct
  * and spillable, but one task per group at any scale (at 100 TB a
  * 3-group input would sort terabytes on 3 tasks). Now:
  *
  *  1. rows bucket into ORDER-ALIGNED chunks by a min/max-scaled VALUE
  *     bucket (a pure row function — every consumer computes the same
  *     chunk id by construction; the `spark_partition_id` +
  *     `repartitionByRange` alternative can silently drop rows when AQE
  *     plans consumers as separate exchanges, the q106 class). The
  *     bucket is monotone in the value, so every row in chunk c ranks
  *     before every row in chunk c+1 and ties share a chunk;
  *  2. a window per (chunk, group) computes LOCAL ranks — ≈ n/P rows
  *     per sort task, never n/|groups|;
  *  3. per-(chunk, group) row counts (= max local rank, reusing the
  *     window's partitioning — no extra exchange) prefix-sum into chunk
  *     OFFSETS on a P×|groups|-row side table whose own windows are
  *     trivially small; group totals `n` ride the same table;
  *  4. offsets broadcast back: global rank = offset + local rank.
  *
  * The global rank of a value is chunking-INVARIANT (equal values are
  * interchangeable within a rank range, and the probe selection below
  * reads only rank→value), so results are bit-identical to the
  * single-window form — PercentilesSpec pins both the equivalence and
  * Percentile-aggregate parity. Cost vs pre-r12: one extra bounded
  * 1-row min/max aggregate over the value column (narrow scan) to place
  * the chunk boundaries.
  *
  * Interpolation replicates `Percentile.getPercentile` EXACTLY —
  * `position = p·(n−1)`, and the weighted form
  * `(higher − position)·v_lo + (position − lower)·v_hi` (NOT
  * `v_lo + frac·Δ`, which rounds differently) — so results are
  * bit-identical to the aggregate it replaces.
  */
object Percentiles {

  /** One row per group: `p<label>` exact interpolated percentile for
    * each probe. Labels default to the probability's digits. The value
    * column must be numeric (interpolation is arithmetic); NaN values,
    * if present, rank last (Spark's ordering) in the top chunk.
    */
  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
      probes: Seq[(Double, String)]): DataFrame = {
    require(probes.nonEmpty, "need at least one probe")
    probes.foreach { case (p, _) =>
      require(p >= 0 && p <= 1, s"probability $p outside [0, 1]") }
    val g = groupCols.map(col)
    val nChunks = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt.max(1)
    val base = df.where(col(valueCol).isNotNull) // Percentile skips nulls
    val vd = col(valueCol).cast("double")
    // chunk bounds: ONE bounded 1-row aggregate (global, not per-group —
    // monotonicity in the value is all the decomposition needs, and a
    // global scaling is monotone within every group)
    val b = base.agg(min(vd).as("mn"), max(vd).as("mx")).head()
    // empty / all-null input: degrade to a single chunk rather than NPE
    // at plan-build time (the Skyline.scala guard pattern)
    val (mn, mx) =
      if (b.isNullAt(0)) (0.0, 0.0) else (b.getDouble(0), b.getDouble(1))
    val span = mx - mn
    // (vd−mn)/span ∈ [0,1] then ×C: no overflow at extreme doubles, and
    // IEEE divide/multiply by positive constants are monotone in vd.
    // NaN → null after the long cast → coalesce to the TOP chunk
    // (Spark orders NaN greater than any double — consistent).
    val chunk =
      if (span > 0)
        coalesce(least(lit(nChunks - 1L),
          floor((vd - lit(mn)) / lit(span) * lit(nChunks.toDouble))
            .cast("long")), lit(nChunks - 1L))
      else lit(0L)
    val chunked = base.select(g :+ col(valueCol) :+ chunk.as("__chunk"): _*)
    val wLocal = Window.partitionBy(col("__chunk") +: g: _*)
      .orderBy(col(valueCol))
    val ranked = chunked
      .withColumn("__lr", row_number().over(wLocal).cast("long"))
    // counts come from the PRE-window frame, not max(local rank) over
    // the window output: the window subtree feeding two consumers would
    // duplicate the sort (branch duplication; only the exchange is
    // runtime-reused), so q70's max(__lr) shape pays a second full sort
    // here. A plain count aggregate is one columnar re-scan + map-side
    // partials into a (chunks×|groups|)-row shuffle — sort-free. The
    // chunk id is a pure row function, so both consumers compute
    // identical chunks by construction (the q106 safety argument).
    val counts = chunked.groupBy(col("__chunk") +: g: _*)
      .agg(count(lit(1)).as("__c"))
    val wOff = Window.partitionBy(g: _*).orderBy(col("__chunk"))
    val offs = counts
      .withColumn("__off", sum(col("__c")).over(wOff) - col("__c"))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(g: _*)))
      .select(col("__chunk") +: g :+ col("__off") :+ col("__n"): _*)
    val rk = ranked
      .join(broadcast(offs), "__chunk" +: groupCols.toSeq)
      .withColumn("__rk", (col("__off") + col("__lr") - 1).cast("double"))
    // a row survives iff it is the floor or ceil rank of some probe
    def pos(p: Double): Column = lit(p) * (col("__n") - 1).cast("double")
    val needed = probes.map { case (p, _) =>
      col("__rk") === floor(pos(p)) || col("__rk") === ceil(pos(p))
    }.reduce(_ || _)
    val aggs = probes.map { case (p, label) =>
      val lo = min(when(col("__rk") === floor(pos(p)), col(valueCol)))
      val hi = min(when(col("__rk") === ceil(pos(p)), col(valueCol)))
      val position = first(pos(p))
      // exact ranks: interpolation degenerates to the value itself
      when(first(floor(pos(p))) === first(ceil(pos(p))), lo)
        .otherwise((first(ceil(pos(p))) - position) * lo
          + (position - first(floor(pos(p)))) * hi)
        .as(s"p$label")
    }
    rk.where(needed)
      .groupBy(g: _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
