package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{BufferedFSInputStream, FSDataInputStream, FSDataOutputStream, FSInputStream, FileStatus, Path, PathFilter}
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream

import java.nio.file.{Files, StandardCopyOption, StandardOpenOption}

/** Fork-free [[CheckpointFileManager]] for LOCAL streaming checkpoints,
  * backed by `java.nio.file` instead of Hadoop's local filesystem
  * shims.
  *
  * Why this exists (r14 adjudication of the r13 q164 regression): with
  * no `libhadoop` native library on the classpath — the common case in
  * containers and the permanent case in this environment — EVERY
  * Hadoop local-FS metadata operation that needs file status or
  * permissions shells out to a subprocess:
  *
  *   - `FileContext.rename` → `AbstractFileSystem.renameInternal` →
  *     `RawLocalFileSystem.getFileLinkStatus` →
  *     `FileUtil.readLink` → `Shell.execCommand("readlink")` — one to
  *     two process FORKS per checkpoint rename;
  *   - `FileSystem.create` → `RawLocalFileSystem.setPermission` →
  *     `Shell.execCommand("chmod")` — a fork per created file (which
  *     is why switching Spark to its FileSystem-based manager measured
  *     WORSE: q164 27.5 s vs 14.5 s first-run).
  *
  * Forking from a JVM with a ~100 GiB heap costs milliseconds per
  * spawn, and a 3-micro-batch complete-mode replay commits ~200
  * checkpoint files (offset/commit logs + 32 state-store partitions ×
  * deltas/snapshots), so the fork storm — not device latency — was
  * q164's entire 9–15 s stall: the same run's device microbench put a
  * /dev/shm create+hsync+rename cycle at 0.015 ms, which cannot add up
  * to seconds over hundreds of ops. The stall sampler's
  * `renameTempFile` frames were sitting in `ProcessImpl.forkAndExec`.
  *
  * This manager performs the exact same atomic write protocol —
  * create temp in the destination directory, then an atomic
  * same-directory rename — with zero subprocess launches and zero
  * permission round-trips. Rename-conflict semantics match Spark's
  * contract: a non-overwrite rename onto an existing destination
  * throws Hadoop's `FileAlreadyExistsException`, which
  * `HDFSMetadataLog` relies on to detect concurrent batch commits.
  *
  * Scope: LOCAL paths only (`file:` or scheme-less). The replay
  * harness queries opt in per stream via [[Replay.localCheckpoints]];
  * durable production checkpoints on HDFS/S3 keep Spark's default
  * manager and its semantics. This is the documented extension point —
  * `spark.sql.streaming.checkpointFileManagerClass` — not a patched
  * Spark.
  */
class LocalNioCheckpointFileManager(root: Path, conf: Configuration)
    extends CheckpointFileManager {

  private def toNio(p: Path): java.nio.file.Path = {
    val uri = p.toUri
    require(uri.getScheme == null || uri.getScheme == "file",
      s"LocalNioCheckpointFileManager handles only local paths, got: $p")
    java.nio.file.Paths.get(uri.getPath)
  }

  override def createAtomic(path: Path,
      overwriteIfPossible: Boolean): CancellableFSDataOutputStream = {
    val dst = toNio(path)
    val parent = dst.getParent
    if (parent != null) Files.createDirectories(parent)
    // Same-directory temp name (Spark's own convention), so the final
    // rename is a same-inode-table rename(2) — atomic on POSIX.
    val temp = dst.resolveSibling(
      s".${dst.getFileName}.${java.util.UUID.randomUUID()}.tmp")
    val out = Files.newOutputStream(temp, StandardOpenOption.CREATE_NEW,
      StandardOpenOption.WRITE)
    new NioAtomicStream(temp, dst, overwriteIfPossible, out, path)
  }

  /** Write-to-temp-then-rename stream; mirrors the terminal-state
    * semantics of Spark's RenameBasedFSDataOutputStream (sealed, so
    * not reusable here): close commits exactly once, cancel discards,
    * and whichever runs first wins — the other becomes a no-op.
    */
  private final class NioAtomicStream(temp: java.nio.file.Path,
      dst: java.nio.file.Path, overwriteIfPossible: Boolean,
      out: java.io.OutputStream, hadoopDst: Path)
      extends CancellableFSDataOutputStream(out) {
    private var terminated = false

    override def close(): Unit = this.synchronized {
      if (!terminated) {
        terminated = true
        super.close()
        if (overwriteIfPossible) {
          Files.move(temp, dst, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
        } else {
          // No ATOMIC_MOVE here ON PURPOSE: on Linux ATOMIC_MOVE maps
          // straight to rename(2), which silently replaces an existing
          // destination — the conflict would go undetected. The plain
          // move checks the destination first and raises NIO's
          // FileAlreadyExistsException, translated to Hadoop's (the
          // type HDFSMetadataLog catches to mean "another writer won
          // the batch"); same-directory moves still execute as a
          // single rename.
          try Files.move(temp, dst)
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              throw new org.apache.hadoop.fs.FileAlreadyExistsException(
                s"rename destination $hadoopDst already exists")
          }
        }
      }
    }

    override def cancel(): Unit = this.synchronized {
      if (!terminated) {
        terminated = true
        try super.close() catch { case _: java.io.IOException => () }
        Files.deleteIfExists(temp)
        ()
      }
    }
  }

  override def open(path: Path): FSDataInputStream = {
    val ch = java.nio.channels.FileChannel.open(toNio(path),
      StandardOpenOption.READ)
    new FSDataInputStream(new BufferedFSInputStream(new NioInput(ch), 16384))
  }

  /** Minimal seekable stream over a [[java.nio.channels.FileChannel]]
    * — `FSInputStream`'s positioned-read defaults sit on top of these
    * three primitives.
    */
  private final class NioInput(ch: java.nio.channels.FileChannel)
      extends FSInputStream {
    override def seek(pos: Long): Unit = { ch.position(pos); () }
    override def getPos: Long = ch.position()
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(): Int = {
      val b = java.nio.ByteBuffer.allocate(1)
      if (ch.read(b) <= 0) -1 else b.get(0) & 0xff
    }
    override def read(buf: Array[Byte], off: Int, len: Int): Int =
      ch.read(java.nio.ByteBuffer.wrap(buf, off, len))
    override def close(): Unit = ch.close()
  }

  override def list(path: Path, filter: PathFilter): Array[FileStatus] = {
    val dir = toNio(path)
    if (!Files.isDirectory(dir)) {
      if (!Files.exists(dir))
        throw new java.io.FileNotFoundException(s"$path does not exist")
      return Array(statusOf(dir)).filter(st => filter.accept(st.getPath))
    }
    val out = Array.newBuilder[FileStatus]
    val stream = Files.newDirectoryStream(dir)
    try {
      val it = stream.iterator()
      while (it.hasNext) {
        val st = statusOf(it.next())
        if (filter.accept(st.getPath)) out += st
      }
    } finally stream.close()
    out.result()
  }

  private def statusOf(p: java.nio.file.Path): FileStatus = {
    val attrs = Files.readAttributes(p,
      classOf[java.nio.file.attribute.BasicFileAttributes])
    new FileStatus(attrs.size(), attrs.isDirectory, 1, 64L << 20,
      attrs.lastModifiedTime().toMillis, new Path(p.toUri))
  }

  override def mkdirs(path: Path): Unit = {
    Files.createDirectories(toNio(path))
    ()
  }

  override def exists(path: Path): Boolean = Files.exists(toNio(path))

  override def delete(path: Path): Unit = {
    // Recursive, like the FileContext manager's delete(path, true);
    // silently ignores a missing path (callers use it for cleanup).
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val stream = Files.newDirectoryStream(p)
        try {
          val it = stream.iterator()
          while (it.hasNext) rm(it.next())
        } finally stream.close()
      }
      Files.deleteIfExists(p)
      ()
    }
    rm(toNio(path))
  }

  override def isLocal: Boolean = true

  override def createCheckpointDirectory(): Path = {
    Files.createDirectories(toNio(root))
    root
  }
}
