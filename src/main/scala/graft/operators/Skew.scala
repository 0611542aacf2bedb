package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation: two-phase salted combine.
  *
  * A hot grouping key sends all its rows to one reducer; AQE's skew
  * handling only splits JOIN partitions, not aggregation keys. Salting
  * fixes aggregation skew structurally: phase 1 aggregates on
  * (key, salt) — spreading each hot key over `saltBuckets` reducers —
  * phase 2 merges the per-salt partials on the key alone. Both phases
  * are standard hash aggregates with map-side partials; the extra
  * shuffle's cardinality is `distinct keys × saltBuckets`, tiny next to
  * the input.
  *
  * Works for any algebraic aggregate (sum/count/min/max); the caller
  * supplies both the per-salt aggregates and the merge aggregates.
  */
object Skew {

  /** @param phase1 aggregates computed per (key, salt), e.g.
    *               `Seq(sum(col("x")).as("s"), count(lit(1)).as("n"))`
    * @param phase2 merge of the partials per key, e.g.
    *               `Seq(sum(col("s")).as("s"), sum(col("n")).as("n"))`
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      phase1: Seq[Column],
      phase2: Seq[Column]): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    // RNG-free salt from the row's position. Aggregate RESULTS are
    // layout-independent (any salt assignment merges to the same totals);
    // the assignment itself varies with partitioning, so phase-1 partials
    // are not comparable across runs.
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)))
    val partials = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(phase1.head, phase1.tail: _*)
    partials
      .groupBy(keys.map(col): _*)
      .agg(phase2.head, phase2.tail: _*)
  }

  /** Skew-resilient equi-join: salted big side × replicated small side.
    *
    * A shuffle join on a skewed key sends every row of the hot key to
    * ONE reducer — the straggler that dominates the stage at 100 TB.
    * Salting restructures the join: each big-side row gets a salt in
    * `[0, saltBuckets)` (RNG-free, from the row's position), the small
    * side is replicated once per salt value, and the join runs on
    * (key, salt) — spreading each hot key over `saltBuckets` reducers.
    * Results are exactly those of the plain join: every big row matches
    * precisely the replica carrying its own salt, so salting is
    * result-invisible (oracle-checked in q88 against the unsalted SQL).
    *
    * The small side is hinted SHUFFLE_MERGE deliberately: a broadcast
    * join needs no salting in the first place (no shuffle of the big
    * side), so this operator exists exactly for the case where the
    * "small" side is too big to broadcast and the planner would
    * otherwise shuffle both sides on the raw skewed key. The
    * replication factor costs `saltBuckets × |small|` shuffled rows —
    * choose `saltBuckets` around the skew factor of the hottest key
    * ([[skewReport]]'s `skew_x1000 / 1000`), not larger.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    salted
      .join(replicated.hint("shuffle_merge"), keys :+ "__salt")
      .drop("__salt")
  }

  /** Key-skew diagnostic: the `topK` heaviest keys with exact share and
    * skew-factor numbers — what you run BEFORE deciding a join needs
    * salting or a table needs a different partition key. All integer
    * arithmetic (parts-per-million share, ×1000 skew factor vs the mean
    * key load) so the report is engine-portable bit-for-bit; the skew
    * factor is also the structurally-right salt bucket count for
    * [[saltedAgg]] on that key.
    *
    * Scale shape: one hash aggregate on the key (map-side partials), a
    * 2-row-ish global aggregate cross-joined back (broadcast), and a
    * global top-k (TakeOrderedAndProject — never a full sort).
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    val perKey = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val totals = perKey.agg(sum(col("n")).as("__total"),
      count(lit(1)).as("__keys"))
    perKey.crossJoin(broadcast(totals))
      .select(
        col(keyCol),
        col("n"),
        // DECIMAL(38,0) intermediates: at 100 TB scale (hot key n≈1e9,
        // 1e7 distinct keys) n*__keys*1000 exceeds Long.MaxValue and
        // would silently wrap; decimal keeps the product exact (and under
        // ANSI mode a true overflow errors instead of producing garbage).
        // `div` on decimals still yields BIGINT, so results and schema
        // are bit-identical to the Long path wherever that path was valid.
        expr("cast(n as decimal(38,0)) * 1000000 div __total")
          .as("share_ppm"),
        expr("cast(n as decimal(38,0)) * __keys * 1000 div __total")
          .as("skew_x1000"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(topK)
  }
}
