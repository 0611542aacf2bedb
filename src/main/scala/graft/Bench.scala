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
    def f(d: Double): String = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    // Per-query we keep ALL run times, not just the min: the round-4
    // bench artifact hid a run-over-run degradation signature (code
    // cache exhaustion) because min-of-3 discards the trend. A query
    // whose runs read [0.4, 3.1, 12.7] is a JVM-state pathology; one
    // that reads [3.3, 3.2, 3.1] is intrinsic cost. min stays the
    // headline estimator (first run pays one-off codegen/listing).
    val results: Seq[(String, Seq[(Double, Boolean)])] =
      SparkEntry.queries.toSeq.map { case (name, fn) =>
        name -> Seq.fill(3)(once(fn))
      }
    val mins = results.map { case (name, runs) =>
      name -> (if (runs.forall(_._2)) runs.map(_._1).min else -1.0)
    }
    val qs = mins.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val runsJson = results.map { case (k, runs) =>
      "\"" + k + "\":[" + runs.map(r => f(r._1)).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val failed = mins.count(_._2 < 0)
    val total = mins.collect { case (_, v) if v >= 0 => v }.sum
    // JIT health canary (round 5): the round-4 driver bench collapsed
    // 77.7 s -> 450 s because the forked JVM's code cache filled and
    // compilation was disabled — invisible in the artifact. Record
    // per-CodeHeap occupancy (peak vs max) and total JIT compile time
    // so "regression" and "JVM pathology" are distinguishable from the
    // bench.json alone. Any pool whose PEAK crossed 97% of max very
    // likely disabled or throttled compilation mid-run.
    import scala.jdk.CollectionConverters._
    val poolsJson = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getName.contains("CodeHeap") || p.getName.contains("Code Cache"))
      .map { p =>
        val peak = p.getPeakUsage; val max = peak.getMax
        val pct = if (max > 0) 100.0 * peak.getUsed / max else -1.0
        "\"" + p.getName.replace("'", "") + "\":{\"peak_mb\":" +
          f(peak.getUsed / 1048576.0) + ",\"max_mb\":" + f(max / 1048576.0) +
          ",\"peak_pct\":" + f(pct) + "}"
      }.mkString("{", ",", "}")
    val codeCacheFull = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getName.contains("CodeHeap") || p.getName.contains("Code Cache"))
      .exists(p => p.getPeakUsage.getMax > 0 &&
        p.getPeakUsage.getUsed.toDouble / p.getPeakUsage.getMax > 0.97)
    val comp = java.lang.management.ManagementFactory.getCompilationMXBean
    val compileMs =
      if (comp != null && comp.isCompilationTimeMonitoringSupported) comp.getTotalCompilationTime
      else -1L
    val line =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"runs":$runsJson,"jit":{"compile_ms":$compileMs,"code_cache_full":$codeCacheFull,"pools":$poolsJson},"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get("bench.json"), line + "\n")
    spark.stop()
  }
}
