package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every registered query at
  * `SPARK_GRAFT_SF_DIR` and emits ONE JSON metric line.
  *
  * Methodology (round-2 fix): each query is materialized through a
  * `noop`-format write, which evaluates EVERY output column of the full
  * plan on the executors and discards the rows. The round-1 `.count()`
  * let Catalyst prune unreferenced projections, so projection-heavy
  * queries (q04/q05/q49) timed the scan instead of the operator under
  * test. Each query runs THREE times and reports the fastest run — the
  * first execution pays one-off costs (file listing, codegen
  * compilation, JIT) that single-shot timing conflates with the
  * operator; round-3 review showed min-of-2 still leaves 1.4-1.9×
  * round-over-round swings indistinguishable from host load, so the
  * estimator is min-of-3 (round-4 change). The metric line is also
  * written to `bench.json` so the harness parse cannot be defeated by
  * build-tool log prefixes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // NOTE (measured, do not "optimize"): AQE's
      // coalescePartitions.parallelismFirst default (true) is correct
      // here — size-based coalescing (false) packed the CPU-heavy
      // window/percentile queries into 1-2 post-shuffle partitions at
      // bench SFs (rows are small, work per row is not) and q18/q38
      // regressed ~2-3×. Advisory-size coalescing only helps when
      // bytes, not compute, dominate.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-footer paths AND the noop datasource
    // (its first use pays DataSourceV2 lookup/init) so the first timed
    // query is not charged for session startup.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // (time, succeeded) — a failed query must NOT report its fail-fast
    // elapsed time as a benchmark result (a broken build would look
    // faster); it reports -1 and is counted in "failed" instead.
    def once(fn: (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] query failed: ${e.getMessage}"); false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val runs = Seq.fill(3)(once(fn))
      name -> (if (runs.forall(_._2)) runs.map(_._1).min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.values.filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get("bench.json"), line + "\n")
    spark.stop()
  }
}
