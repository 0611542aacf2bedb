package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path, PathFilter}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the [[LocalNioCheckpointFileManager]] contract — the fork-free
  * local checkpoint manager the replay harness swaps in (its scaladoc
  * has the r14 adjudication: Hadoop's local FS shells out a
  * readlink/chmod subprocess per checkpoint metadata op when libhadoop
  * is absent, and the fork storm, not device latency, was the whole
  * q164 stall). Contract surface exercised here:
  *
  *  - atomic create: content appears at the destination only on close,
  *    whole or not at all;
  *  - overwrite semantics: overwriteIfPossible=true replaces, =false
  *    onto an existing destination throws HADOOP's
  *    FileAlreadyExistsException (the exact type HDFSMetadataLog
  *    catches to detect a concurrent batch commit);
  *  - cancel: no destination file, no temp residue;
  *  - open: seekable reads (the metadata log re-reads committed
  *    batches);
  *  - list + filter, recursive delete;
  *  - end-to-end: a real AvailableNow streaming aggregation runs under
  *    the manager via [[Replay.withLocalCheckpoints]] and matches its
  *    batch result, and the session's conf is restored afterwards —
  *    the library must not leave a user's session reconfigured.
  */
class LocalNioCheckpointFileManagerSpec extends SparkSpec {

  private def withMgr[T](body: (LocalNioCheckpointFileManager, java.io.File) => T): T = {
    val dir = Files.createTempDirectory("graft_niocp").toFile
    val mgr = new LocalNioCheckpointFileManager(
      new Path(dir.toURI), new Configuration())
    try body(mgr, dir)
    finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
  }

  private def write(mgr: LocalNioCheckpointFileManager, p: Path,
      content: String, overwrite: Boolean): Unit = {
    val out = mgr.createAtomic(p, overwrite)
    out.write(content.getBytes("UTF-8"))
    out.close()
  }

  private def readAll(mgr: LocalNioCheckpointFileManager, p: Path): String = {
    val in = mgr.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  test("atomic create commits on close; no temp residue") {
    withMgr { (mgr, dir) =>
      val dst = new Path(new java.io.File(dir, "meta/0").toURI)
      val out = mgr.createAtomic(dst, overwriteIfPossible = false)
      out.write("v1".getBytes("UTF-8"))
      // before close: destination absent (the atomicity the metadata
      // log depends on — a reader never sees a half-written batch file)
      assert(!mgr.exists(dst))
      out.close()
      assert(mgr.exists(dst))
      assert(readAll(mgr, dst) == "v1")
      // the temp file was renamed away, not copied
      val residue = new java.io.File(dir, "meta").listFiles()
        .filter(_.getName.endsWith(".tmp"))
      assert(residue.isEmpty)
      // close is idempotent (Spark calls close from finally blocks)
      out.close()
      assert(readAll(mgr, dst) == "v1")
    }
  }

  test("non-overwrite rename onto existing file throws Hadoop's FAEE") {
    withMgr { (mgr, dir) =>
      val dst = new Path(new java.io.File(dir, "b/1").toURI)
      write(mgr, dst, "first", overwrite = false)
      val e = intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
        write(mgr, dst, "second", overwrite = false)
      }
      assert(e.getMessage.contains("1"))
      // loser's content did not clobber the winner's
      assert(readAll(mgr, dst) == "first")
      // overwrite=true DOES replace (state-store delta rewrite path)
      write(mgr, dst, "third", overwrite = true)
      assert(readAll(mgr, dst) == "third")
    }
  }

  test("cancel leaves neither destination nor temp") {
    withMgr { (mgr, dir) =>
      val dst = new Path(new java.io.File(dir, "c/2").toURI)
      val out = mgr.createAtomic(dst, overwriteIfPossible = true)
      out.write("doomed".getBytes("UTF-8"))
      out.cancel()
      assert(!mgr.exists(dst))
      assert(!new java.io.File(dir, "c").exists() ||
        new java.io.File(dir, "c").listFiles().isEmpty)
      // cancel-after-cancel and close-after-cancel are no-ops
      out.cancel()
    }
  }

  test("open is seekable; list filters; delete is recursive") {
    withMgr { (mgr, dir) =>
      val d = new Path(new java.io.File(dir, "log").toURI)
      mgr.mkdirs(d)
      write(mgr, new Path(s"$d/0"), "aaaa", overwrite = false)
      write(mgr, new Path(s"$d/1"), "bbbb", overwrite = false)
      write(mgr, new Path(s"$d/1.crc"), "x", overwrite = false)
      // seek past the first two bytes and read the tail
      val in = mgr.open(new Path(s"$d/0"))
      try {
        in.seek(2L)
        assert(in.getPos == 2L)
        val rest = new Array[Byte](2)
        in.readFully(rest)
        assert(new String(rest, "UTF-8") == "aa")
      } finally in.close()
      val noCrc = mgr.list(d, new PathFilter {
        override def accept(p: Path): Boolean = !p.getName.endsWith(".crc")
      })
      assert(noCrc.map(_.getPath.getName).sorted.toSeq == Seq("0", "1"))
      assert(noCrc.forall(st => !st.isDirectory && st.getLen == 4))
      // missing dir must raise FileNotFoundException (HDFSMetadataLog
      // relies on it to distinguish empty from absent)
      intercept[java.io.FileNotFoundException] {
        mgr.list(new Path(s"$d/absent"))
      }
      mgr.delete(d)
      assert(!mgr.exists(d))
      // deleting a missing path is a silent no-op (cleanup path)
      mgr.delete(d)
    }
  }

  test("createCheckpointDirectory creates the root") {
    withMgr { (mgr, dir) =>
      val sub = new java.io.File(dir, "never_made_yet")
      val m2 = new LocalNioCheckpointFileManager(
        new Path(sub.toURI), new Configuration())
      assert(m2.createCheckpointDirectory().toUri.getPath
        == sub.getAbsolutePath)
      assert(sub.isDirectory)
    }
  }

  test("end-to-end AvailableNow aggregation under the manager = batch; confs restored") {
    import spark.implicits._
    val mgrKey = "spark.sql.streaming.checkpointFileManagerClass"
    val ckKey = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    val before = (spark.conf.getOption(mgrKey), spark.conf.getOption(ckKey))
    val stage = Files.createTempDirectory("graft_niostage").toString
    val outP = s"$stage/out"
    try {
      val src = (1L to 300L).map(i => (i, i % 7)).toDF("id", "k")
      (0 until 3).foreach { i =>
        src.filter(col("id") % 3 === i)
          .coalesce(1).write.mode("append").parquet(s"$stage/in")
      }
      var batches = 0
      Replay.withLocalCheckpoints(spark, "graft_niocp_e2e") { cp =>
        // the manager really is in force while the stream runs
        assert(spark.conf.get(mgrKey)
          == classOf[LocalNioCheckpointFileManager].getName)
        val q = spark.readStream.schema(src.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$stage/in")
          .groupBy(col("k")).agg(count(lit(1)).as("n"))
          .writeStream.outputMode("complete")
          .option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("overwrite").parquet(outP)
            batches += 1
          }
          .start()
        try q.awaitTermination() finally q.stop()
      }
      assert(batches == 3)
      val streamed = spark.read.parquet(outP)
        .orderBy("k").as[(Long, Long)].collect().toSeq
      val batch = src.groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy("k").as[(Long, Long)].collect().toSeq
      assert(streamed == batch)
      // session conf restored — both keys back to their prior state
      assert(spark.conf.getOption(mgrKey) == before._1)
      assert(spark.conf.getOption(ckKey) == before._2)
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      rm(Paths.get(stage).toFile)
      graft.Scratch.reap()
    }
  }
}
