package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis — group users by their first-activity
  * date and count how many return at fixed day offsets. The standard
  * product-analytics rollup (and, for training pipelines, the shape of
  * "how many sources contribute again N snapshots later").
  *
  * All-integer semantics: cohort assignment is `min(date)` per user,
  * activity is the DISTINCT (user, date) set, offsets are exact
  * `datediff` day counts — nothing here can diverge across engines.
  *
  * Scale shape: one aggregate keyed by user for cohort assignment, one
  * distinct on (user, day) — both shuffle on user — then ONE plain hash
  * aggregate keyed by cohort date. No `count(DISTINCT ...)` anywhere:
  * after the (user, day) distinct, a user contributes AT MOST ONE row
  * per offset, so retention is a conditional `count`, and exactly one
  * row at offset 0 (the first-activity day itself), so cohort size is
  * too. Multiple distinct aggregates would otherwise compile to an
  * Expand that multiplies the shuffle by (offsets + 1) — measured and
  * removed; adding offsets now adds zero cost.
  */
object Cohort {

  /** One row per cohort date: cohort size + retained-user count at
    * each requested day offset (column `d<offset>`).
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      offsets: Seq[Int]): DataFrame = {
    require(offsets.nonEmpty, "need at least one offset")
    require(offsets.forall(_ > 0), s"offsets must be positive: $offsets")
    val days = events.select(col(userCol).as("__u"),
      to_date(col(tsCol)).as("__day")).distinct()
    val firsts = days.groupBy(col("__u"))
      .agg(min(col("__day")).as("cohort_day"))
      .withColumnRenamed("__u", "__fu")
    val joined = days
      .join(firsts, col("__u") === col("__fu"))
      .withColumn("__off", datediff(col("__day"), col("cohort_day")))
    val retained = offsets.map { off =>
      count(when(col("__off") === off, lit(1))).as(s"d$off")
    }
    joined.groupBy(col("cohort_day"))
      .agg(count(when(col("__off") === 0, lit(1))).as("cohort_size"),
        retained: _*)
      .orderBy(col("cohort_day"))
  }

  /** Trailing-window active users (DAU/WAU/MAU family): for every
    * activity day, the count of distinct users active within the
    * trailing `windowDays` days ending on it.
    *
    * Deliberately NOT a range join and NOT a sliding window aggregate:
    * `count(DISTINCT)` does not decompose over window frames, and a
    * non-equi join degenerates to a nested loop. Instead each
    * (user, day) activity row is exploded to the `windowDays` report
    * days it contributes to — a bounded 1→w generator — and everything
    * downstream is equi-keyed: semi-join onto the observed-day grid,
    * then one distinct count per report day. Fan-out is `windowDays`,
    * fixed and known; at 100 TB the expansion streams through codegen
    * and only (user, report_day) pairs shuffle.
    */
  def trailingActive(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val days = events.select(col(userCol).as("__u"),
      to_date(col(tsCol)).as("__day")).distinct()
    val grid = days.select(col("__day").as("day")).distinct()
    val expanded = days
      .select(col("__u"), explode(sequence(lit(0),
        lit(windowDays - 1))).as("__k"), col("__day"))
      .select(col("__u"), date_add(col("__day"), col("__k")).as("day"))
    expanded
      .join(grid, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(count_distinct(col("__u")).as("active_users"))
      .orderBy(col("day"))
  }
}
