package graft.tools

import org.apache.spark.sql.SparkSession

/** Adjudication probe for the r12 q132/q187 bench regression (the
  * SkewBench pattern: measure the suspected environmental variable in
  * isolation, commit the numbers).
  *
  * The r12 driver bench ran q132_stream_dedup at 20-24 s/run and
  * q187_stream_topk at 18-42 s/run with ~90% of stall samples in
  * `ChecksumCheckpointFileManager.renameTempFile` / `createTempFile` —
  * streaming checkpoint file I/O, not eval or plan work — while the r12
  * diff touched no streaming code. This probe settles whether that is
  * (a) the checkpoint DISK (java.io.tmpdir's backing device) being slow
  * at bench time, or (b) a checksum-manager cost intrinsic to the
  * engine, by measuring both independently:
  *
  *  1. A metadata-log-style microbench — the exact write pattern the
  *     stall frames point at: create temp file, write a small payload,
  *     hsync, rename into place — against java.io.tmpdir (disk) and
  *     /dev/shm (tmpfs), N cycles each, reporting mean/p99 latency.
  *     A healthy disk does this in well under a millisecond; the r12
  *     symptom requires tens of milliseconds per cycle.
  *  2. q132/q187 wall time under the config matrix: checkpoint file
  *     checksums ON (the Spark 4.1 default — every metadata write also
  *     writes a sibling .checksum file and every rename doubles) vs
  *     OFF (`spark.sql.streaming.checkpoint.fileChecksum.enabled`),
  *     so the artifact records how much of the cost the checksum
  *     manager amplifies when the underlying device IS slow.
  *
  * Usage: `runMain graft.tools.CheckpointProbe <sfDir> <runs>`.
  * Results are recorded in BASELINE.md "Round-13 records".
  */
object CheckpointProbe {
  /** Shared with [[graft.Bench]] (r14, VERDICT item 4): the bench
    * embeds a `disk_probe` block in bench.json so cross-round
    * comparisons carry the device state that produced them — the r13
    * drift adjudication needed three manual runs and prose; now it is
    * one artifact read.
    */
  private[graft] def fsyncRenameBench(dir: java.io.File, cycles: Int): (Double, Double) = {
    dir.mkdirs()
    val payload = ("x" * 512).getBytes
    val lat = new Array[Double](cycles)
    var i = 0
    while (i < cycles) {
      val t0 = System.nanoTime()
      val tmp = new java.io.File(dir, s".tmp_$i")
      val fin = new java.io.File(dir, s"meta_$i")
      val fos = new java.io.FileOutputStream(tmp)
      try {
        fos.write(payload)
        fos.getFD.sync()
      } finally fos.close()
      if (!tmp.renameTo(fin)) sys.error(s"rename failed: $tmp -> $fin")
      lat(i) = (System.nanoTime() - t0) / 1e6
      i += 1
    }
    (0 until cycles).foreach { j =>
      new java.io.File(dir, s"meta_$j").delete()
    }
    dir.delete()
    val sorted = lat.sorted
    // 0-based order statistic: ceil(0.99·n) − 1 (the naive n·99/100
    // index reported the 99.25th percentile at n=400 — r13 review)
    val p99Idx = math.ceil(0.99 * cycles).toInt - 1 min (cycles - 1)
    (lat.sum / cycles, sorted(p99Idx))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    // 1. device microbench, no Spark involved
    val cycles = 400
    val tmpRoot = new java.io.File(System.getProperty("java.io.tmpdir"), "graft_cpprobe_disk")
    val (dMean, dP99) = fsyncRenameBench(tmpRoot, cycles)
    println(f"[cpprobe] tmpdir(${System.getProperty("java.io.tmpdir")}) write+hsync+rename: mean=$dMean%.3f ms p99=$dP99%.3f ms")
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val (sMean, sP99) = fsyncRenameBench(new java.io.File(shm, "graft_cpprobe_shm"), cycles)
      println(f"[cpprobe] /dev/shm write+hsync+rename: mean=$sMean%.3f ms p99=$sP99%.3f ms")
    } else println("[cpprobe] /dev/shm unavailable")

    // 2. streaming-query matrix: checksum manager on vs off
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val key = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    println(s"[cpprobe] $key default = ${spark.conf.getOption(key).getOrElse("<unset>")}")
    val reg = graft.Queries.registry.toMap
    for (q <- Seq("q132_stream_dedup", "q187_stream_topk");
         checksum <- Seq("true", "false")) {
      spark.conf.set(key, checksum)
      val fn = reg(q)._1
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        graft.Scratch.reap()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[cpprobe] $q checksum=$checksum runs=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.2f")
    }
    spark.stop()
  }
}
