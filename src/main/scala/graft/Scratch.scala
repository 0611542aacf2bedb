package graft

/** Run-scoped scratch allocation under `java.io.tmpdir` with a per-JVM
  * registry, so cleanup deletes EXACTLY the directories this process
  * allocated — never another process's.
  *
  * Why a registry instead of a name pattern: the r10 Bench reaper
  * pattern-matched `graft_q\w*_<8hex>` against the SHARED tmpdir, which
  * (a) would delete a concurrently running graft JVM's staging
  * mid-query (`sbt test` next to a sweep on the same box), and (b) ate
  * keyed cross-run stores whose hash suffix happened to render as
  * exactly 8 hex chars — q160's `graft_q160_store_7418e66b` at sf0.1
  * ("/root/testdata/sf0.1".hashCode in hex) matched the pattern and was
  * wiped after every query, silently discarding the store it exists to
  * reuse. Registered paths have neither failure mode.
  *
  * Allocation only RESERVES the name (the caller creates the files);
  * [[reap]] drains the registry and recursively deletes whatever exists
  * at each registered path. Keyed cross-run stores (quantizers, sketch
  * stores, LSH catalogs) must NOT be allocated here — they are meant to
  * survive reaps.
  */
object Scratch {
  private val created =
    new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()

  /** Allocate (but do not create) a fresh scratch path
    * `<prefix>_<8 hex>` under `java.io.tmpdir` and register it for
    * [[reap]].
    */
  def dir(prefix: String): java.io.File = {
    val f = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"${prefix}_${java.util.UUID.randomUUID().toString.take(8)}")
    created.add(f)
    f
  }

  /** tmpfs candidate for latency-sensitive scratch, or None when
    * /dev/shm is absent or unwritable. Capacity is re-checked at EVERY
    * allocation (r13 review): tmpfs fills as the suite runs, and a
    * one-shot class-load check would keep routing staging onto a
    * nearly-full tmpfs mid-sweep — the ENOSPC failure class [[reap]]
    * exists to prevent, made harder to see because Bench's low-space
    * guard watches java.io.tmpdir, not /dev/shm.
    */
  private val shmCandidate: Option[java.io.File] = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) Some(shm) else None
  }

  /** Root for SMALL latency-sensitive scratch (streaming checkpoints,
    * KB-scale sketch stores, bounded replay staging): tmpfs when it
    * currently has ≥ 16 GiB usable, else the disk tmpdir. Re-evaluated
    * per call; a filling tmpfs degrades new allocations to the slow
    * disk instead of failing writes hard. Genuinely bulk data must
    * keep using [[dir]] — tmpfs capacity is RAM.
    */
  def fastRoot: String = shmCandidate
    .filter(_.getUsableSpace > (16L << 30)).map(_.getPath)
    .getOrElse(System.getProperty("java.io.tmpdir"))

  /** [[dir]] on the fast root: for scratch whose TOTAL size stays
    * small at every benched scale (the streaming replay queries'
    * stage/out dirs — bounded by one filtered table copy, ≤ a few
    * hundred MB at sf10r). The r13 bench measured the replay queries
    * 2-4× slower in-suite than standalone with every dominant stall
    * frame in small-file create/rename on the disk tmpdir; their
    * staging I/O is latency-bound, not capacity-bound, which is
    * tmpfs's exact trade. Genuinely bulk scratch (q121's format
    * round-trip leaves ~12 GB per run at sf10) must stay on [[dir]].
    */
  def fastDir(prefix: String): java.io.File = {
    val f = new java.io.File(fastRoot,
      s"${prefix}_${java.util.UUID.randomUUID().toString.take(8)}")
    created.add(f)
    f
  }

  /** [[fastDir]] with a `_cp` name infix: STREAMING-CHECKPOINT scratch.
    *
    * Why checkpoints specifically need the fast root (r13, adjudicated
    * by `tools.CheckpointProbe`): every streaming micro-batch commits
    * offset/commit metadata through create-temp → hsync → rename, and
    * Spark 4.1's ChecksumCheckpointFileManager (default ON) doubles
    * every one of those ops with a sibling .checksum file. On this
    * host's disk-backed tmpdir that cycle measures 3.0 ms mean /
    * 15.9 ms p99 under load vs 0.025 ms on tmpfs — the r12 bench ran
    * q132/q187 at 20-42 s/run with ~90% of stall samples inside the
    * checksum manager's renameTempFile. Replay-harness checkpoints are
    * ephemeral (one AvailableNow run, then reaped) and KB-scale
    * metadata + bounded dedup/agg state.
    */
  def cpDir(prefix: String): java.io.File = fastDir(s"${prefix}_cp")

  /** Delete every scratch path THIS JVM allocated since the last reap.
    * Callers invoke it between fully-materialized units of work (Bench
    * reaps after each query's runs complete), never while an allocated
    * path may still be read.
    */
  def reap(): Unit = {
    var f = created.poll()
    while (f != null) {
      rm(f)
      f = created.poll()
    }
  }

  private def rm(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(rm)
    f.delete()
    ()
  }
}
