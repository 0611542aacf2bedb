package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r14 spark.local.dir routing policy ([[Scratch.sparkLocalDir]])
  * — the guarded tmpfs placement of shuffle/block-manager files.
  */
class ScratchSpec extends AnyFunSuite {

  test("localDirNeedBytes: 8 GiB floor, then 32x input") {
    assert(Scratch.localDirNeedBytes(0L) === (8L << 30))
    assert(Scratch.localDirNeedBytes(100L << 20) === (8L << 30)) // 100 MiB in
    // 1 GiB input -> 32 GiB need (scale-adaptive past the floor)
    assert(Scratch.localDirNeedBytes(1L << 30) === (32L << 30))
  }

  test("env SPARK_LOCAL_DIRS always wins when set") {
    // Spark itself gives the env var precedence over spark.local.dir;
    // the chooser must report reality rather than fight it. The env is
    // process-global and read-only from the JVM, so assert the branch
    // that corresponds to THIS process's environment.
    val (path, detail) = Scratch.sparkLocalDir("/definitely/missing")
    sys.env.get("SPARK_LOCAL_DIRS") match {
      case Some(p) =>
        assert(path === p)
        assert(detail.contains("env SPARK_LOCAL_DIRS"))
      case None =>
        // no env: the choice must be tmpfs (when /dev/shm is writable
        // and big enough for the 8 GiB floor — a missing input dir
        // counts 0 bytes) or the JVM tmpdir, never anything else
        val shm = new java.io.File("/dev/shm")
        if (shm.isDirectory && shm.canWrite &&
            shm.getUsableSpace > (8L << 30)) {
          assert(path === shm.getPath)
          assert(detail.startsWith("tmpfs"))
        } else {
          assert(path === System.getProperty("java.io.tmpdir"))
        }
    }
  }

  test("duBytes sums files recursively and tolerates missing paths") {
    assert(Scratch.duBytes(new java.io.File("/definitely/missing")) === 0L)
    val d = java.nio.file.Files.createTempDirectory("graft_du_spec").toFile
    try {
      val sub = new java.io.File(d, "sub"); sub.mkdirs()
      java.nio.file.Files.write(new java.io.File(d, "a").toPath,
        Array.fill[Byte](123)(1))
      java.nio.file.Files.write(new java.io.File(sub, "b").toPath,
        Array.fill[Byte](77)(2))
      assert(Scratch.duBytes(d) === 200L)
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      rm(d)
    }
  }
}
