package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev micro-bench: time named registry queries in isolation.
  *
  * `runMain graft.tools.TimeQuery <sfDir> <n> <queryName>...` — each
  * query is materialized through the same noop sink as [[graft.Bench]]
  * and timed `n` times; prints every run so variance is visible (Bench
  * itself reports only min-of-3). Use this to bisect a single query's
  * regression without paying for the whole 86-query suite.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: TimeQuery <sfDir> <n> <query>...")
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // match Bench's guarded tmpfs local-dir routing (r14) so
    // micro-bench numbers stay comparable to suite numbers
    val (localDir, localDirDetail) = graft.Scratch.sparkLocalDir(sfDir)
    println(s"[timequery] local_dir=$localDir ($localDirDetail)")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled",
        sys.env.getOrElse("SPARK_GRAFT_UI", "false"))
      // match Bench's replay-checkpoint config (see its r13 note) so
      // micro-bench numbers are comparable to suite numbers
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).write.format("noop")
      .mode("overwrite").save()
    catch { case _: Throwable => () }
    val reg = graft.Queries.registry.toMap
    for (name <- names) {
      val fn = reg.getOrElse(name,
        sys.error(s"unknown query $name; known: ${reg.keys.toSeq.sorted}"))._1
      // n=0: print the formatted physical plan instead of timing.
      if (n == 0) {
        println(s"=== $name ===")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } else if (n < 0) {
        // n=-1: execute once, then print the FINAL adaptive plan —
        // the only place AQE's runtime exchange/stage reuse is visible
        // (the n=0 static plan shows duplicated subtrees that AQE may
        // in fact compute once).
        val df = fn(spark, sfDir)
        // drive df's OWN QueryExecution (a noop write plans a separate
        // copy, leaving this one isFinalPlan=false)
        df.queryExecution.executedPlan.execute()
          .foreachPartition((_: Iterator[_]) => ())
        println(s"=== $name (final adaptive plan) ===")
        println(df.queryExecution.executedPlan.toString)
      } else {
        graft.StrategyLog.drain()
        val times = (1 to n).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[timequery] $name runs=${times.map(t => f"$t%.3f").mkString(",")} min=${times.min}%.3f")
        graft.StrategyLog.render(graft.StrategyLog.drain())
          .foreach(d => println(s"[timequery]   strategy: $d"))
        // r14: micro-bench JVMs leaked replay/cp scratch onto tmpfs
        // (RAM) between sessions; reap like Bench now that allocations
        // are registered
        graft.Scratch.reap()
      }
    }
    spark.stop()
  }
}
