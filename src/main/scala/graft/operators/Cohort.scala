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
  * distinct on (user, day) — both shuffle on user, and AQE coalesces
  * them into the SAME exchange since the keys match — then one hash
  * aggregate keyed by cohort date. Per-offset retention is a
  * conditional `count(DISTINCT user)` inside that single aggregate, so
  * adding offsets adds zero passes.
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
      count_distinct(when(col("__off") === off, col("__u")))
        .as(s"d$off")
    }
    joined.groupBy(col("cohort_day"))
      .agg(count_distinct(col("__u")).as("cohort_size"), retained: _*)
      .orderBy(col("cohort_day"))
  }
}
