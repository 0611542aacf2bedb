package graft.tools

import org.apache.spark.sql.SparkSession

/** r14 adjudication probe for the q164 regression (runs [15.4, 9.0,
  * 14.4] s in the r13 bench with stall frames 100% in streaming
  * checkpoint `renameTempFile` DESPITE tmpfs routing and the device
  * microbench measuring /dev/shm renames at 0.015 ms — 231 stall
  * samples cannot be device latency; they are either op COUNT or a
  * lock inside the rename path). Prints per-phase wall times for one
  * q164 execution plus, at 20 Hz, the first FULL stack seen with
  * `renameTempFile` on it, and afterwards the checkpoint dir's file
  * census — the three numbers the adjudication needs.
  */
object Q164Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        sys.env.getOrElse("GRAFT_CP_MANAGER",
          "org.apache.spark.sql.execution.streaming.checkpointing.FileContextBasedCheckpointFileManager"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var live = true
    @volatile var printed = 0
    val sampler = new Thread {
      setDaemon(true)
      override def run(): Unit = {
        val mx = java.lang.management.ManagementFactory.getThreadMXBean
        while (live) {
          val infos = mx.dumpAllThreads(false, false)
          infos.foreach { ti =>
            if (ti != null && ti.getThreadState == Thread.State.RUNNABLE &&
                printed < 3) {
              val st = ti.getStackTrace
              if (st.exists(f => f.getMethodName.contains("renameTempFile"))) {
                printed += 1
                println(s"[q164probe] === stack with renameTempFile (${ti.getThreadName}) ===")
                st.take(25).foreach(f => println(s"[q164probe]   $f"))
              }
            }
          }
          Thread.sleep(50)
        }
      }
    }
    sampler.start()

    // run once, warm
    val reg = graft.Queries.registry.toMap
    val fn = reg("q164_stream_quantiles")._1
    (0 until 2).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[q164probe] run$i total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    live = false

    // census of the newest q164 checkpoint dir on the fast root
    val shm = new java.io.File("/dev/shm")
    val root = if (shm.isDirectory && shm.canWrite) shm
      else new java.io.File(System.getProperty("java.io.tmpdir"))
    val cps = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("graft_q164_cp"))
      .sortBy(-_.lastModified())
    cps.headOption.foreach { cp =>
      var nFiles = 0L; var nDirs = 0L; var bytes = 0L
      def walk(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) { nDirs += 1; kids.foreach(walk) }
        else { nFiles += 1; bytes += f.length() }
      }
      walk(cp)
      println(s"[q164probe] cp census ${cp.getName}: files=$nFiles dirs=$nDirs bytes=$bytes")
    }
    spark.stop()
  }
}
