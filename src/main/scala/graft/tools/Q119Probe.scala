package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Stage-level decomposition of q119 (stream-maintained label store) —
  * the r10 floor-shave probe (VERDICT r9 item 7). Reproduces the
  * query's exact phases OUTSIDE the streaming harness and times each:
  * edge synthesis, snapshot CC + store seed, per-batch
  * [[Graph.updateLabelStore]] folds, and the final summary read. The
  * difference between the probe total and the full query's wall time
  * is the Structured-Streaming machinery (source listing, WAL,
  * micro-batch planning) — the part no store-side change can shave.
  *
  * Usage: `sbt "runMain graft.tools.Q119Probe [sfDir]"`.
  */
object Q119Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-q119-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q119probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val runs = sys.env.getOrElse("Q119_PROBE_RUNS", "2").toInt
    for (run <- 0 until runs) {
    println(s"[q119probe] --- pass $run ---")
    val edges = timed("edges synth+checkpoint") {
      graft.Queries.plantedDupEdges(spark, sfDir).localCheckpoint()
    }
    val old = edges.where(col("src") < 1000000L)
    val batchSrc = edges.where(col("src") >= 1000000L)
    val base = new org.apache.hadoop.fs.Path(
      graft.Scratch.dir("graft_q119probe").getPath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.deleteOnExit(base)
    val storeDir = s"$base/labels"
    val snapshot = timed("snapshot CC") {
      val s = graft.Queries.plantedDupNodes(spark, sfDir)
        .join(Graph.connectedComponents(old, "src", "dst"), Seq("node"),
          "left")
        .select(col("node"),
          coalesce(col("component"), col("node")).as("component"))
      s.count(); s
    }
    timed("writeLabelStore") {
      Graph.writeLabelStore(snapshot, "node", "component", storeDir,
        parts = 16)
    }
    val batches: Seq[DataFrame] = (0 until 2).map(i =>
      batchSrc.filter(col("src") % 2 === i).localCheckpoint())
    batches.zipWithIndex.foreach { case (b, i) =>
      timed(s"updateLabelStore batch $i") {
        Graph.updateLabelStore(storeDir, b, "src", "dst")
      }
    }
    timed("summary read") {
      spark.read.parquet(storeDir)
        .groupBy(col("__pb").cast("long").as("pb"))
        .agg(count(lit(1)).as("n_nodes"),
          countDistinct(col("component")).as("n_components"))
        .collect()
    }
    }
    spark.stop()
  }
}
