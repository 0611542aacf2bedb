package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate frequent-items (heavy-hitters) sketching — with HLL
  * (`approx_count_distinct`, q40) the second classic constant-memory
  * sketch a 100 TB corpus pipeline leans on: "which tokens/domains/
  * n-grams dominate" without a full groupBy when the domain is huge.
  *
  * Backed by Spark's single-pass frequent-items implementation
  * (`DataFrameStatFunctions.freqItems`, a distributed Karp-
  * Papadimitriou-Shenker variant): one narrow pass, per-partition
  * summaries merged on the driver, memory O(1/support) — and its
  * guarantee is DETERMINISTIC, not probabilistic: every item with
  * frequency > support·N is in the result (false positives possible,
  * false negatives not). That asymmetry is what the oracle checks.
  */
object Sketches {

  /** Items with observed share > `support` per the sketch (superset
    * semantics — may include false positives below the threshold).
    */
  def frequentItems(df: DataFrame, itemCol: String,
      support: Double): Seq[Any] = {
    require(support > 0 && support < 1, "support in (0, 1)")
    df.stat.freqItems(Seq(itemCol), support)
      .collect()(0).getSeq[Any](0)
  }

  /** EXACT heavy hitters with sketch-membership flag: items whose exact
    * share exceeds `minShare`, each tagged with whether the sketch (run
    * at `support` < `minShare`) contained it. By the KPS guarantee the
    * flag is always true when support < minShare — the oracle-checkable
    * invariant; the exact side is one groupBy (the path you avoid at
    * full scale, retained here as the sketch's ground truth).
    */
  // ----- theta sketch column API ----------------------------------------
  // Mergeable distinct-count sketches WITH set operations (intersection /
  // difference — what the HLL store of q111 cannot answer). Backed by
  // the custom Catalyst aggregates/scalars in
  // [[graft.expressions.ThetaSketchAgg]] et al.

  private def bridge = org.apache.spark.sql.graft.ColumnBridge

  /** Aggregate: compact theta sketch of the column's distinct values. */
  def thetaSketch(c: Column, lgK: Int = 14): Column =
    bridge.column(graft.expressions.ThetaSketchAgg(
      bridge.expression(c), lgK).toAggregateExpression())

  /** Aggregate: union of stored compact sketches (store merge). */
  def thetaUnion(c: Column, lgK: Int = 14): Column =
    bridge.column(graft.expressions.ThetaUnionAgg(
      bridge.expression(c), lgK).toAggregateExpression())

  /** Scalar: distinct-count estimate of a compact sketch. */
  def thetaEstimate(c: Column): Column =
    bridge.column(graft.expressions.ThetaEstimate(bridge.expression(c)))

  /** Scalar: sketch of the intersection of two sketches. */
  def thetaIntersect(a: Column, b: Column): Column =
    bridge.column(graft.expressions.ThetaIntersect(
      bridge.expression(a), bridge.expression(b)))

  /** Scalar: sketch of the difference a \ b. */
  def thetaANotB(a: Column, b: Column): Column =
    bridge.column(graft.expressions.ThetaANotB(
      bridge.expression(a), bridge.expression(b)))

  // ----- frequent-items sketch column API --------------------------------
  // Mergeable Misra-Gries frequency state with DETERMINISTIC count
  // bounds — the counting companion to the theta store.

  /** Aggregate: frequency sketch of a long item column. */
  def freqSketch(c: Column, maxMapSize: Int = 64): Column =
    bridge.column(graft.expressions.FreqSketchAgg(
      bridge.expression(c), maxMapSize).toAggregateExpression())

  /** Aggregate: union of stored frequency sketches. */
  def freqMerge(c: Column, maxMapSize: Int = 64): Column =
    bridge.column(graft.expressions.FreqMergeAgg(
      bridge.expression(c), maxMapSize).toAggregateExpression())

  /** Scalar: guaranteed lower bound of an item's count. */
  def freqLowerBound(sketch: Column, item: Column): Column =
    bridge.column(graft.expressions.FreqLowerBound(
      bridge.expression(sketch), bridge.expression(item)))

  /** Scalar: guaranteed upper bound of an item's count. */
  def freqUpperBound(sketch: Column, item: Column): Column =
    bridge.column(graft.expressions.FreqUpperBound(
      bridge.expression(sketch), bridge.expression(item)))

  // ----- KLL quantile-sketch column API ----------------------------------
  // Mergeable rank/quantile state (order statistics) — completes the
  // sketch-store family: HLL = distinct, freq = heavy hitters, theta =
  // set algebra, KLL = quantiles. Rank error is bounded independent of
  // n (exact while n <= k), so per-day sketches answer any window.

  /** Aggregate: KLL quantile sketch of a numeric column. */
  def kllSketch(c: Column, k: Int = 800): Column =
    bridge.column(graft.expressions.KllSketchAgg(
      bridge.expression(c), k).toAggregateExpression())

  /** Aggregate: merge of stored KLL sketches (store merge). */
  def kllMerge(c: Column, k: Int = 800): Column =
    bridge.column(graft.expressions.KllMergeAgg(
      bridge.expression(c), k).toAggregateExpression())

  /** Scalar: inclusive-rank quantile value of a sketch (null if empty). */
  def kllQuantile(sketch: Column, rank: Column): Column =
    bridge.column(graft.expressions.KllQuantile(
      bridge.expression(sketch), bridge.expression(rank)))

  /** Scalar: inclusive normalized rank of a value (null if empty). */
  def kllRank(sketch: Column, value: Column): Column =
    bridge.column(graft.expressions.KllRank(
      bridge.expression(sketch), bridge.expression(value)))

  /** Scalar: exact update count carried by a sketch. */
  def kllN(sketch: Column): Column =
    bridge.column(graft.expressions.KllN(bridge.expression(sketch)))

  /** Materialize per-day KLL sketches as a DAY-PARTITIONED parquet
    * store via dynamic partition overwrite: ONLY the days present in
    * `df` are (re)written — the daily-increment path of the quantile
    * store (the WeatherSink/LabelStore partial-rewrite pattern;
    * untouched day partitions' files are never rewritten,
    * KllSketchSpec pins the listing byte-identical). Re-running a day
    * is idempotent: its sketch is rebuilt from that day's rows, never
    * merged with its stale self.
    */
  def writeDaySketches(df: DataFrame, dayCol: String, valueCol: String,
      store: String, k: Int = 800): Unit = {
    val sk = df.groupBy(col(dayCol))
      .agg(kllSketch(col(valueCol), k).as("sk"))
    // per-WRITE dynamic mode, not a session-conf set/restore: two
    // concurrent writers interleaving a global toggle can strand the
    // session in 'dynamic' or run the other job's overwrite in the
    // wrong mode (r10 ADVICE) — the writer option scopes the mode to
    // exactly this write
    sk.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(dayCol).parquet(store)
  }

  def heavyHittersChecked(df: DataFrame, itemCol: String,
      minShare: Double, support: Double): DataFrame = {
    require(support < minShare,
      "sketch support must be below the exact threshold for the guarantee")
    val sketch = frequentItems(df, itemCol, support)
    // total derived from the per-item counts via a broadcast single-row
    // aggregate over the SAME groupBy (exchange reused) — a dedicated
    // df.count() would be a third full scan of the corpus
    val counts = df.groupBy(col(itemCol)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .filter(col("n") > col("__total") * minShare)
      .select(col(itemCol), col("n"),
        col(itemCol).isin(sketch: _*).as("in_sketch"))
  }
}
