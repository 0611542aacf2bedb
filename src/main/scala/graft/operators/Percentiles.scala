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
  *  4. offsets broadcast back: global rank = offset + local rank;
  *  5. (r12.2, group count permitting) PROBE PRUNING: the offsets
  *     table knows each chunk's global rank range, and only rows at a
  *     probe's floor/ceil rank ever reach the output — so only the
  *     chunks CONTAINING such a rank are semi-join-kept before the
  *     local sort. With C chunks and k probes the sorted volume is
  *     ≈ 2k·n/C of the input: the stream is scanned (bounds, counts,
  *     prune filter) but never globally ordered.
  *
  * The global rank of a value is chunking-INVARIANT (equal values are
  * interchangeable within a rank range, and the probe selection below
  * reads only rank→value), so results are bit-identical to the
  * single-window form — PercentilesSpec pins both the equivalence and
  * Percentile-aggregate parity.
  *
  * The decomposition pays fixed costs a small input never earns back
  * (the bounds aggregate is an extra job; the counts aggregate and the
  * offsets broadcast are extra exchanges — callers like q81's MAD run
  * the operator twice over a joined subtree, multiplying them). So the
  * strategy is ADAPTIVE, the adaptiveTopK pattern: the bounds aggregate
  * also counts rows (free — same 1-row shuffle), and inputs at or under
  * [[smallInputRows]] take the single-window plan, whose one sort task
  * per group is exactly right at that size. Both paths share the probe
  * selection/interpolation tail verbatim and are bit-identical
  * (PercentilesSpec pins it); every decision is recorded in
  * [[graft.StrategyLog]] so a mis-cutover at a new scale is visible
  * from bench/verify artifacts alone.
  *
  * Interpolation replicates `Percentile.getPercentile` EXACTLY —
  * `position = p·(n−1)`, and the weighted form
  * `(higher − position)·v_lo + (position − lower)·v_hi` (NOT
  * `v_lo + frac·Δ`, which rounds differently) — so results are
  * bit-identical to the aggregate it replaces.
  */
object Percentiles {

  /** Inputs at or under this row count take the single-window path: a
    * 4M-double group sorts in well under a second on one task, and the
    * chunked form's extra job + exchanges cost more than that. Above
    * it, per-group single tasks stop scaling and chunking wins.
    */
  val smallInputRows: Long = 1L << 22

  /** One row per group: `p<label>` exact interpolated percentile for
    * each probe. Labels default to the probability's digits. The value
    * column must be numeric (interpolation is arithmetic); NaN values,
    * if present, rank last (Spark's ordering) in the top chunk.
    */
  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
      probes: Seq[(Double, String)]): DataFrame =
    exact(df, groupCols, valueCol, probes, smallInputRows)

  /** As [[exact]], with an explicit window/chunked cutover (tests force
    * one path by passing 0 / Long.MaxValue).
    */
  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
      probes: Seq[(Double, String)], windowBelowRows: Long): DataFrame =
    exact(df, groupCols, valueCol, probes, windowBelowRows, None)

  /** As [[exact]], with CALLER-SUPPLIED `(min, max, nonNullCount)` of
    * the NaN-free value stream — for callers that already hold GLOBAL
    * column stats from their own shared scan and want to skip the
    * per-call eager bounds job. (Profile used this shape through r12;
    * it now supplies PER-GROUP bounds via [[exactWithGroupStats]],
    * which keeps a narrow-range group spread across chunks — prefer
    * that when a per-group scan is affordable.) The
    * count drives the window/chunked cutover; the bounds drive chunk
    * ALIGNMENT only — a stale-but-finite pair skews chunk balance,
    * never results (out-of-range values land in the end chunks, which
    * stay order-aligned), and an all-NaN/empty stream passes (None,
    * 0). Pass what `df.where(valueCol IS NOT NULL)` measures or the
    * cutover decision degrades to the wrong (still bit-identical)
    * strategy.
    */
  def exactWithStats(df: DataFrame, groupCols: Seq[String],
      valueCol: String, probes: Seq[(Double, String)],
      bounds: Option[(Double, Double)], nonNullCount: Long): DataFrame =
    exactWithStats(df, groupCols, valueCol, probes, bounds, nonNullCount,
      groupCountEstimate = None)

  /** As [[exactWithStats]], plus an estimate of the group cardinality
    * (an `approx_count_distinct` from the caller's shared scan is
    * fine): at or under [[maxPruneGroups]] it enables probe pruning on
    * the chunked path. The estimate gates a strategy only — an
    * over/under-estimate changes which plan runs, never its output.
    */
  def exactWithStats(df: DataFrame, groupCols: Seq[String],
      valueCol: String, probes: Seq[(Double, String)],
      bounds: Option[(Double, Double)], nonNullCount: Long,
      groupCountEstimate: Option[Long]): DataFrame =
    exact(df, groupCols, valueCol, probes, smallInputRows,
      Some((bounds, nonNullCount, groupCountEstimate)))

  private def exact(df: DataFrame, groupCols: Seq[String],
      valueCol: String, probes: Seq[(Double, String)],
      windowBelowRows: Long,
      stats: Option[(Option[(Double, Double)], Long, Option[Long])])
      : DataFrame = {
    require(probes.nonEmpty, "need at least one probe")
    probes.foreach { case (p, _) =>
      require(p >= 0 && p <= 1, s"probability $p outside [0, 1]") }
    val g = groupCols.map(col)
    val base = df.where(col(valueCol).isNotNull) // Percentile skips nulls
    val vd = col(valueCol).cast("double")
    // chunk bounds + input size: ONE bounded aggregate pass over the
    // input. r12.2: the pass is PER-GROUP (`groupBy(g).agg(min, max,
    // count)`, checkpointed at |groups| rows, rolled up for the
    // totals) instead of one global row — global scaling is monotone
    // within every group, but a large group confined to a NARROW slice
    // of the global range lands entirely in one chunk and is back on a
    // single sort task; per-group bounds spread every group across all
    // chunks regardless of range mismatch. Bounds are NaN-FREE: `max`
    // propagates NaN, which would poison the span and collapse every
    // row into one chunk — NaN rows instead get the top chunk
    // explicitly in rankByChunks (they order last in Spark). Skipped
    // entirely when the caller supplied the stats (global scaling,
    // [[exactWithStats]]).
    stats match {
      case Some((boundsOpt, total, groupsEst)) =>
        if (total <= windowBelowRows) {
          graft.StrategyLog.record("percentiles.exact", "window",
            s"n=$total <= windowBelowRows=$windowBelowRows (supplied)")
          rankProbe(rankByWindow(base, g, valueCol), g, valueCol, probes)
        } else {
          graft.StrategyLog.record("percentiles.exact", "chunked",
            s"n=$total > windowBelowRows=$windowBelowRows, " +
              "bounds=supplied-global")
          rankProbe(rankByChunks(base, groupCols, valueCol, vd,
            SuppliedBounds(boundsOpt.getOrElse((0.0, 0.0))),
            probes, groupsEst), g, valueCol, probes)
        }
      case None =>
        // Checkpoint lifetime (r13, ADVICE): the PerGroupBounds branch
        // hands `gb` to a lazy result plan, so it cannot be unpersisted
        // here — its storage blocks are reclaimed by the ContextCleaner
        // when the plan's RDD references are GC-collected (Bench
        // additionally unpersists every persistent RDD after each
        // query's runs). A long-lived session hammering this operator
        // between GCs accumulates |groups|-row blocks, bounded by
        // maxBroadcastGroups each; the non-chunked branches unpersist
        // eagerly below.
        val gb = base.groupBy(g: _*)
          .agg(min(when(!isnan(vd), vd)).as("__bmn"),
            max(when(!isnan(vd), vd)).as("__bmx"),
            count(lit(1)).as("__bc"))
          .localCheckpoint() // ONE pass over the input, |groups| rows
        val roll = gb.agg(sum(col("__bc")), count(lit(1)),
          min(col("__bmn")), max(col("__bmx"))).head()
        val total = if (roll.isNullAt(0)) 0L else roll.getLong(0)
        val nGroups = roll.getLong(1)
        if (total <= windowBelowRows) {
          gb.unpersist()
          graft.StrategyLog.record("percentiles.exact", "window",
            s"n=$total <= windowBelowRows=$windowBelowRows")
          rankProbe(rankByWindow(base, g, valueCol), g, valueCol, probes)
        } else if (nGroups <= maxBroadcastGroups) {
          if (!roll.isNullAt(2) &&
              (roll.getDouble(2).isInfinite || roll.getDouble(3).isInfinite))
            graft.StrategyLog.record("percentiles.bounds", "nonfinite",
              "±Inf endpoints present; affected groups single-chunk")
          graft.StrategyLog.record("percentiles.exact", "chunked",
            s"n=$total > windowBelowRows=$windowBelowRows, " +
              s"bounds=per-group (groups=$nGroups)")
          rankProbe(rankByChunks(base, groupCols, valueCol, vd,
            PerGroupBounds(gb), probes, Some(nGroups)), g, valueCol, probes)
        } else {
          gb.unpersist()
          graft.StrategyLog.record("percentiles.exact", "chunked",
            s"n=$total > windowBelowRows=$windowBelowRows, " +
              s"bounds=measured-global (groups=$nGroups past broadcast)")
          val bounds = if (roll.isNullAt(2)) (0.0, 0.0)
            else (roll.getDouble(2), roll.getDouble(3))
          if (bounds._1.isInfinite || bounds._2.isInfinite)
            graft.StrategyLog.record("percentiles.bounds", "nonfinite",
              "±Inf endpoints present; stream single-chunks (order kept)")
          rankProbe(rankByChunks(base, groupCols, valueCol, vd,
            MeasuredGlobal(bounds), probes, Some(nGroups)), g, valueCol,
            probes)
        }
    }
  }

  /** As [[exactWithStats]], but with PER-GROUP bounds from the caller's
    * shared scan: `gb` must carry the group columns plus NaN-free
    * `__bmn`/`__bmx` per group (what one
    * `groupBy(groupCols).agg(min, max)` over the non-null value
    * stream measures; `total` arrives as a parameter, so no count
    * column is read from `gb`). Multi-column profilers (q85) compute every
    * column's per-group stats in ONE scan and call this per column —
    * per-group scaling keeps a large group confined to a sliver of the
    * global range spread across chunks (the r12.2 fix), which the
    * global-bounds [[exactWithStats]] cannot. The caller owns `gb`'s
    * lifetime (checkpoint it once, let it die with the plans).
    *
    * CONTRACT: `gb` must be GENUINELY MEASURED from `df`'s current
    * non-null value stream, not cached from an earlier generation —
    * per-group bounds engage the span-0 salt (see [[ChunkBounds]]),
    * and a stale span of 0 over values that now spread would scatter
    * non-interchangeable rows across chunks and corrupt ranks. (The
    * scalar [[exactWithStats]] tolerates stale bounds precisely
    * because its supplied-bounds path never salts.)
    */
  def exactWithGroupStats(df: DataFrame, groupCols: Seq[String],
      valueCol: String, probes: Seq[(Double, String)], gb: DataFrame,
      total: Long, nGroups: Long): DataFrame = {
    require(probes.nonEmpty, "need at least one probe")
    probes.foreach { case (p, _) =>
      require(p >= 0 && p <= 1, s"probability $p outside [0, 1]") }
    val g = groupCols.map(col)
    val base = df.where(col(valueCol).isNotNull)
    val vd = col(valueCol).cast("double")
    if (total <= smallInputRows) {
      graft.StrategyLog.record("percentiles.exact", "window",
        s"n=$total <= windowBelowRows=$smallInputRows (supplied per-group)")
      rankProbe(rankByWindow(base, g, valueCol), g, valueCol, probes)
    } else if (nGroups <= maxBroadcastGroups) {
      graft.StrategyLog.record("percentiles.exact", "chunked",
        s"n=$total > windowBelowRows=$smallInputRows, " +
          s"bounds=supplied-per-group (groups=$nGroups)")
      rankProbe(rankByChunks(base, groupCols, valueCol, vd,
        PerGroupBounds(gb), probes, Some(nGroups)), g, valueCol, probes)
    } else {
      val roll = gb.agg(min(col("__bmn")), max(col("__bmx"))).head()
      val bounds = if (roll.isNullAt(0)) (0.0, 0.0)
        else (roll.getDouble(0), roll.getDouble(1))
      graft.StrategyLog.record("percentiles.exact", "chunked",
        s"n=$total > windowBelowRows=$smallInputRows, " +
          s"bounds=rolled-global (groups=$nGroups past broadcast)")
      rankProbe(rankByChunks(base, groupCols, valueCol, vd,
        MeasuredGlobal(bounds), probes, Some(nGroups)), g, valueCol, probes)
    }
  }

  /** How the chunk scaling learns its bounds — the salting rules differ.
    * Measured bounds (per-group or global) PROVE that `span == 0` means
    * every non-NaN value is equal, so those rows are mutually
    * interchangeable under ranking and may be salted across chunks by a
    * full-row hash (a constant-valued group otherwise collapses onto
    * one sort task). Caller-SUPPLIED bounds prove nothing — a stale
    * span of 0 over genuinely spread values salted across chunks would
    * break chunk monotonicity and corrupt ranks — so that path keeps
    * the single-chunk fallback.
    */
  private sealed trait ChunkBounds
  private final case class SuppliedBounds(mnMx: (Double, Double))
    extends ChunkBounds
  private final case class MeasuredGlobal(mnMx: (Double, Double))
    extends ChunkBounds
  private final case class PerGroupBounds(
      gb: org.apache.spark.sql.DataFrame) extends ChunkBounds

  /** Per-group bounds tables above this group count fall back to
    * measured-global scaling: the bounds join must broadcast (a
    * shuffle join there would shuffle the DATA to fix chunk balance —
    * the cure outweighing the disease), and 1M rows of (group, mn, mx)
    * is a comfortably small broadcast at any executor size.
    */
  val maxBroadcastGroups: Long = 1L << 20

  /** Shared probe/interpolation tail over a ranked frame (`__rk`,
    * `__n` contract) — both strategies end here, which is what makes
    * them bit-identical.
    */
  private def rankProbe(ranked: DataFrame, g: Seq[Column],
      valueCol: String, probes: Seq[(Double, String)]): DataFrame = {
    // a row survives iff it is the floor or ceil rank of some probe
    def pos(p: Double): Column = lit(p) * (col("__n") - 1).cast("double")
    val needed = probes.map { case (p, _) =>
      col("__rk") === floor(pos(p)) || col("__rk") === ceil(pos(p))
    }.reduce(_ || _)
    val aggs = probes.map { case (p, label) =>
      val lo = min(when(col("__rk") === floor(pos(p)), col(valueCol)))
      val hi = min(when(col("__rk") === ceil(pos(p)), col(valueCol)))
      val position = first(pos(p))
      // exact ranks: interpolation degenerates to the value itself.
      // EQUAL boundary values also short-circuit (r13): Spark's
      // Percentile returns early when lowerKey == higherKey, and
      // DuckDB's `lo + f·(hi−lo)` is exact there, but the weighted
      // form is NOT — in the subnormal range 0.5·x + 0.5·x rounds each
      // product down a ulp and returns 4/5 of x (PercentilesSpec pins
      // the case). The short-circuit matches both engines bit-for-bit.
      when(first(floor(pos(p))) === first(ceil(pos(p))), lo)
        .when(lo === hi, lo)
        .otherwise((first(ceil(pos(p))) - position) * lo
          + (position - first(floor(pos(p)))) * hi)
        .as(s"p$label")
    }
    ranked.where(needed)
      .groupBy(g: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Small-input ranking: one window partition per group. `__rk` is the
    * 0-based global rank, `__n` the group size.
    */
  private def rankByWindow(base: DataFrame, g: Seq[Column],
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(g: _*).orderBy(col(valueCol))
    val wAll = Window.partitionBy(g: _*)
    base.select(g :+ col(valueCol) :+
      (row_number().over(w) - 1).cast("double").as("__rk") :+
      count(lit(1)).over(wAll).as("__n"): _*)
  }

  /** Chunk-count side tables stay bounded (≤ ~4M rows) only while the
    * group count is known and modest; past this, probe pruning is off
    * and the ranking runs the full-sort shape (whose offsets join then
    * rides the window's own shuffle, no broadcast anywhere).
    */
  val maxPruneGroups: Long = 1L << 16

  /** Scale ranking: order-aligned value chunks, local ranks + broadcast
    * offsets (steps 1-4 of the scaladoc), PROBE-PRUNED when the group
    * count allows (step 5): only the chunks that contain some probe's
    * floor/ceil rank are ever sorted. The counts pass (sort-free hash
    * aggregate) locates those chunks exactly, so with C chunks and k
    * probes the sort volume drops from n rows to ≈ 2k·n/C — the full
    * value stream is scanned but never ordered. Same `__rk`/`__n`
    * contract: pruning removes WHOLE chunks, so surviving local ranks
    * and offsets are untouched.
    */
  private def rankByChunks(base: DataFrame, groupCols: Seq[String],
      valueCol: String, vd: Column, bounds: ChunkBounds,
      probes: Seq[(Double, String)], nGroupsEst: Option[Long]): DataFrame = {
    val g = groupCols.map(col)
    val shufP = base.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt.max(1)
    val pruneGroups = nGroupsEst.filter(_ <= maxPruneGroups)
    // With pruning, more chunks = finer targeting (sorted volume is
    // ≈ 2·probes·n/chunks), bounded so the counts table stays ≤ ~4M
    // rows; without it, chunks beyond the shuffle width buy nothing.
    val nChunks = pruneGroups match {
      case Some(ng) =>
        math.max(shufP.toLong, math.min(4096L, (1L << 22) / ng.max(1L)))
          .toInt
      case None => shufP
    }
    graft.StrategyLog.record("percentiles.chunks",
      if (pruneGroups.isDefined) "probe-pruned" else "full-sort",
      s"chunks=$nChunks" + pruneGroups.fold("")(ng => s", groups=$ng"))
    // All-tied salt (measured bounds only — see [[ChunkBounds]]): rows
    // whose group has span 0 are mutually interchangeable under
    // ranking, so a full-row hash may spread them across chunks; fully
    // IDENTICAL rows still co-locate (no distinguishing content to
    // hash), which is the entropy floor of any deterministic pure row
    // function. Map-bearing columns are unhashable at ANY nesting depth
    // (xxhash64 rejects array<map> and struct{map} too — r13 ADVICE)
    // and are excluded recursively; a schema with no hashable column
    // left keeps span-0 groups in one chunk instead of salting.
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case _: org.apache.spark.sql.types.MapType => true
        case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.exists(f => hasMap(f.dataType))
        case _ => false
      }
    val saltCols = base.schema.fields.filterNot(f => hasMap(f.dataType))
      .map(f => col(f.name)).toSeq
    val salted =
      if (saltCols.isEmpty) lit(0L)
      else pmod(xxhash64(saltCols: _*), lit(nChunks.toLong))
    // Scaling is over HALVED endpoints — (vd/2 − mn/2)/(mx/2 − mn/2) ∈
    // [0,1] then ×C — because mx−mn itself overflows to +Inf when the
    // endpoints straddle ±~9e307 (r13 ADVICE: the overflow made every
    // ratio 0 and silently collapsed the stream into chunk 0); halves
    // differ by at most Double.MaxValue, so the half-span is finite
    // whenever both endpoints are. IEEE divide/multiply by positive
    // constants stay monotone in vd. A non-finite half-span can then
    // only mean a ±Inf ENDPOINT (or NaN from (−Inf)−(−Inf)): those
    // rows are genuinely unscalable and NOT interchangeable, so they
    // may not salt — the affected group keeps order-alignment in one
    // explicit chunk (plan-time StrategyLog notes it when the measured
    // roll-up shows infinite endpoints). NaN VALUES go to the TOP
    // chunk explicitly (Spark orders NaN greater than any double; the
    // bounds exclude NaN, so the scaled form never sees one).
    // Out-of-range values (stale supplied bounds) clamp into the end
    // chunks, which stay order-aligned.
    // The ALL-TIED test is the exact `mn === mx`, NEVER the halved
    // span (r13 review): for subnormal-magnitude bounds the halves can
    // round to EQUAL doubles while mn != mx (mx/2 − mn/2 == 0 for
    // distinct values under ~4.5e-308), and salting genuinely distinct
    // values would corrupt ranks. A zero-or-negative half-span whose
    // endpoints are NOT equal is therefore "unscalable" (subnormal
    // collapse), routed to the same explicit single chunk as the ±Inf
    // endpoints — order-alignment holds trivially, parallelism is
    // sacrificed only for that degenerate group.
    def scaledChunk(mnC: Column, mxC: Column, onFlat: Column): Column = {
      val spanHalf = mxC / 2 - mnC / 2
      when(isnan(vd), lit(nChunks - 1L))
        .when(mnC.isNull || mnC === mxC, onFlat)
        .when(isnan(spanHalf) || spanHalf <= 0 ||
          spanHalf === lit(Double.PositiveInfinity), lit(0L))
        .otherwise(least(lit(nChunks - 1L),
          greatest(lit(0L),
            floor((vd / 2 - mnC / 2) / spanHalf * lit(nChunks.toDouble))
              .cast("long"))))
    }
    val chunked = bounds match {
      case SuppliedBounds((mn, mx)) =>
        val chunk = scaledChunk(lit(mn), lit(mx), lit(0L))
        base.select(g :+ col(valueCol) :+ chunk.as("__chunk"): _*)
      case MeasuredGlobal((mn, mx)) =>
        val chunk = scaledChunk(lit(mn), lit(mx), salted)
        base.select(g :+ col(valueCol) :+ chunk.as("__chunk"): _*)
      case PerGroupBounds(gb) =>
        // broadcast the checkpointed |groups|-row bounds table back
        // onto the rows (null-safe on the group key, like the offsets
        // join) and scale each row within ITS group's range.
        val gbR = gb.select(groupCols.map(c => col(c).as(s"__bg_$c")) :+
          col("__bmn") :+ col("__bmx"): _*)
        val cond = groupCols.map(c => col(c) <=> col(s"__bg_$c"))
          .reduceOption(_ && _).getOrElse(lit(true))
        val chunk = scaledChunk(col("__bmn"), col("__bmx"), salted)
        base.join(broadcast(gbR), cond)
          .select(g :+ col(valueCol) :+ chunk.as("__chunk"): _*)
    }
    // counts come from the PRE-window frame, not max(local rank) over
    // the window output: the window subtree feeding two consumers would
    // duplicate the sort (branch duplication; only the exchange is
    // runtime-reused), so q70's max(__lr) shape pays a second full sort
    // here. A plain count aggregate is one columnar re-scan + map-side
    // partials into a (chunks×|groups|)-row shuffle — sort-free. The
    // chunk id is a pure row function, so both consumers compute
    // identical chunks by construction (the q106 safety argument).
    // When pruning, the table feeds BOTH the offsets and the target
    // list, so it is checkpointed (bounded ≤ ~4M rows by the nChunks
    // formula) rather than re-aggregated per consumer.
    val countsRaw = chunked.groupBy(col("__chunk") +: g: _*)
      .agg(count(lit(1)).as("__c"))
    // (lifetime: like `gb` above, this checkpoint feeds the lazy result
    // plan and is reclaimed by the ContextCleaner / Bench's per-query
    // unpersist sweep, bounded ≤ ~4M rows by the nChunks formula)
    val counts =
      if (pruneGroups.isDefined) countsRaw.localCheckpoint()
      else countsRaw
    val wOff = Window.partitionBy(g: _*).orderBy(col("__chunk"))
    val offsBase = counts
      .withColumn("__off", sum(col("__c")).over(wOff) - col("__c"))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(g: _*)))
    // Step 5 — probe pruning: a chunk is needed iff some probe's floor
    // or ceil rank `r = f(p·(n−1))` lands inside its [off, off+c) rank
    // range. Empty chunks ([off, off)) match nothing; probe 0/1 hit
    // the first/last non-empty chunk. The surviving-chunk list is
    // group-count-bounded (≤ 2·probes·|groups| rows) and broadcast as
    // a LEFT SEMI filter on the pre-sort stream — whole chunks drop,
    // so every kept row's local rank and offset are exactly what the
    // unpruned form computes (PercentilesSpec pins parity).
    val toSort = pruneGroups match {
      case Some(_) =>
        val targetCond = probes.flatMap { case (p, _) =>
          val pos = lit(p) * (col("__n") - 1).cast("double")
          Seq(floor(pos), ceil(pos))
        }.map(rk => rk >= col("__off") && rk < col("__off") + col("__c"))
          .reduce(_ || _)
        val targets = offsBase.where(targetCond)
          .select(col("__chunk").as("__tchunk") +:
            groupCols.map(c => col(c).as(s"__tg_$c")): _*)
        val semiCond = (col("__chunk") === col("__tchunk")) +:
          groupCols.map(c => col(c) <=> col(s"__tg_$c"))
        chunked.join(broadcast(targets), semiCond.reduce(_ && _),
          "left_semi")
      case None => chunked
    }
    val wLocal = Window.partitionBy(col("__chunk") +: g: _*)
      .orderBy(col(valueCol))
    val ranked = toSort
      .withColumn("__lr", row_number().over(wLocal).cast("long"))
    // NULL group keys must survive the offsets join exactly as the
    // window path and the Percentile aggregate keep them (Profile
    // relies on it), so the join condition is NULL-SAFE (`<=>`) on the
    // group columns. No join hint: offs is chunks×|groups| rows — in
    // the few-big-groups regime this decomposition targets, AQE
    // broadcasts it; at high group cardinality a shuffle join on
    // (__chunk, groups) reuses the window's own exchange and sort
    // prefix, where a forced broadcast would hit the size limit.
    val offs = offsBase
      .select(col("__chunk").as("__ochunk") +:
        groupCols.map(c => col(c).as(s"__og_$c")) :+
        col("__off") :+ col("__n"): _*)
    val joinCond = (col("__chunk") === col("__ochunk")) +:
      groupCols.map(c => col(c) <=> col(s"__og_$c"))
    ranked
      .join(offs, joinCond.reduce(_ && _))
      .withColumn("__rk", (col("__off") + col("__lr") - 1).cast("double"))
      .drop("__ochunk")
      .drop(groupCols.map(c => s"__og_$c"): _*)
  }
}
