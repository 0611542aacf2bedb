package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured comparison of MANUAL salting ([[graft.operators.Skew]],
  * the q63/q88 mechanism) against AQE's built-in skew-join handling
  * (`spark.sql.adaptive.skewJoin`), on the same deliberately skewed
  * workload — the experiment behind the BASELINE.md "AQE vs manual
  * salting" adjudication (VERDICT r8 item 7). This is a diagnostic
  * main, not part of the query surface; results are recorded in
  * BASELINE.md.
  *
  * Workload: lineitem with a synthetic hot key (90% of rows collapse to
  * key 0, the rest keep l_orderkey — skew factor ~0.9·N over a ~N/10
  * key space), joined to the full distinct-key dim (too many rows to
  * broadcast; broadcast is additionally disabled because a
  * broadcastable dim needs no skew mitigation of any kind — the regime
  * under test is the 100 TB big×big one). Variants:
  *
  *   - `join_plain_aqe_off`    — sort-merge join on the raw key: the
  *     hot key's entire row set lands on ONE reducer (the straggler).
  *   - `join_plain_aqe_default` — AQE skew-join at stock thresholds
  *     (256 MB / 5× median): does it even FIRE at this scale?
  *   - `join_plain_aqe_tuned`  — AQE skew-join with advisory sizes
  *     lowered so the hot partition is split the way a 100 TB run's
  *     default-threshold split would.
  *   - `join_salted_aqe_off`   — [[graft.operators.Skew.saltedJoin]],
  *     salt 32.
  *   - `join_salted_aqe_on`    — same salted plan under AQE: pins that
  *     the two mechanisms COEXIST (AQE must not un-do or fight the
  *     salt; it just sees a well-distributed join).
  *
  * Aggregation half (AQE has NO skew handling for aggregates):
  *
  *   - `agg_sum_plain` vs `agg_sum_salted` — an algebraic sum on the
  *     hot key. Expected: plain WINS — hash-aggregate map-side partials
  *     already reduce each task's output to ≤ #keys rows, so the hot
  *     key costs nothing extra and salting just adds a shuffle. This is
  *     the measured boundary of [[graft.operators.Skew.saltedAgg]]'s
  *     domain.
  *   - `agg_collect_plain` vs `agg_collect_salted` — a holistic
  *     collect_list (no map-side reduction: every row of the hot key
  *     must reach its reducer). Expected: salting wins increasingly
  *     with skew mass; this is the regime saltedAgg exists for.
  *
  * Usage: `sbt "runMain graft.tools.SkewBench [sfDir]"` (default
  * target/sf1; RUNS via SPARK_GRAFT_RUNS, default 2).
  */
object SkewBench {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "target/sf1"
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .withColumn("k",
        when(pmod(col("l_orderkey"), lit(10)) < 9, lit(0L))
          .otherwise(col("l_orderkey")))
      // 16 map tasks: AQE's skew split unit is the MAP-output chunk —
      // a single-file scan gives ONE mapper, and a one-mapper hot
      // partition is physically unsplittable (measured: the rule
      // silently skips it). Real clusters always have many mappers.
      .repartition(16)
      .localCheckpoint() // freeze the input: every variant reads the
                         // same materialized rows, no re-scan noise
    val dim = li.select(col("k")).distinct()
      .withColumn("payload", col("k") * 31 + 7)
      .localCheckpoint()
    val nBig = li.count()
    val nDim = dim.count()
    println(s"[skewbench] big=$nBig rows, dim=$nDim keys, sf=$sfDir")

    def conf(kv: (String, String)*): Unit = kv.foreach { case (k, v) =>
      spark.conf.set(k, v)
    }
    // the 100 TB regime: neither join side broadcastable
    conf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

    def time(name: String)(mk: => DataFrame): Unit = {
      val secs = (0 until nRuns).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[skewbench] $name%-28s min=${secs.min}%7.2f s  runs=" +
        secs.map(s => f"$s%.2f").mkString("[", ", ", "]"))
    }

    val aqeOff = Seq("spark.sql.adaptive.enabled" -> "false")
    val aqeDefault = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m")
    val aqeTuned = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scale the stock 256 MB/64 MB advisory down by the data-size gap
      // between this bench and a real cluster partition, so the split
      // decision fires exactly as it would at 100 TB
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4m")

    // the aggregate reads fact PAYLOAD columns (not just the key), so
    // column pruning cannot strip the shuffled rows down to a
    // constant-compressible key stream: the hot partition carries real
    // bytes, as a production fact join would
    def plainJoin(): DataFrame =
      li.join(dim.hint("shuffle_merge"), Seq("k"))
        .groupBy(col("k") % 97)
        .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"),
          sum(col("l_quantity")).as("q"), max(col("l_partkey")).as("p"))

    conf(aqeOff: _*)
    time("join_plain_aqe_off")(plainJoin())
    conf(aqeDefault: _*)
    time("join_plain_aqe_default")(plainJoin())
    conf(aqeTuned: _*)
    time("join_plain_aqe_tuned")(plainJoin())

    def saltedJoin(): DataFrame =
      graft.operators.Skew.saltedJoin(li, dim, Seq("k"), saltBuckets = 32)
        .groupBy(col("k") % 97)
        .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"),
          sum(col("l_quantity")).as("q"), max(col("l_partkey")).as("p"))

    conf(aqeOff: _*)
    time("join_salted_aqe_off")(saltedJoin())
    conf(aqeTuned: _*)
    time("join_salted_aqe_on")(saltedJoin())

    // ---- aggregation half ----
    conf(aqeDefault: _*) // AQE state is irrelevant to agg skew; use stock

    time("agg_sum_plain")(
      li.groupBy(col("k"))
        .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n")))
    time("agg_sum_salted")(
      graft.operators.Skew.saltedAgg(li, Seq("k"), saltBuckets = 32,
        phase1 = Seq(sum(col("l_quantity")).as("s"), count(lit(1)).as("n")),
        phase2 = Seq(sum(col("s")).as("s"), sum(col("n")).as("n"))))

    // holistic: every row must reach its key's reducer; plain has no
    // map-side reduction and the hot key's reducer sorts/holds 0.9·N
    time("agg_collect_plain")(
      li.groupBy(col("k"))
        .agg(size(collect_list(col("l_partkey"))).as("n_items")))
    time("agg_collect_salted")(
      graft.operators.Skew.saltedAgg(li, Seq("k"), saltBuckets = 32,
        phase1 = Seq(size(collect_list(col("l_partkey"))).as("c")),
        phase2 = Seq(sum(col("c")).as("n_items"))))

    spark.stop()
  }
}
