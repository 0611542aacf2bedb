package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Dedup

/** Durable store for the weather table: date-partitioned parquet.
  *
  * Replaces the reference's PostgreSQL sink (DDL py:76-134, upsert
  * py:392-468). Its four b-tree indexes (region / date / data_timestamp /
  * (region, date), py:116-119) are subsumed by `partitionBy("date")`
  * (partition pruning) plus parquet min/max column statistics with filter
  * pushdown for `region` and `data_timestamp` (SURVEY.md §4) — no custom
  * machinery, and the same plan holds on a 1000-executor cluster.
  */
object WeatherSink {

  val naturalKey: Seq[String] = Seq("region", "data_timestamp")

  /** Plain partitioned write (initial load / full refresh). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").partitionBy("date").parquet(path)

  /** Keyed upsert into the table (the reference's ON CONFLICT DO UPDATE,
    * py:422-452): merge the incoming batch with the current table via
    * [[Dedup.upsert]] and atomically swap the result in (stage-then-rename,
    * the parquet stand-in for the reference's single transaction with
    * rollback, py:454-468; SURVEY.md §7.7).
    *
    * Scale note: for a daily 15-row batch into a 100 TB table one would
    * enable dynamic partition overwrite and restrict the union to the
    * partitions present in the incoming batch — the incoming `date` set
    * prunes the `existing` scan, so cost is proportional to touched
    * partitions, not table size. That pruning happens automatically here
    * because both sides are read with the same `date` partition column.
    */
  def upsertInto(spark: SparkSession, incoming: DataFrame, path: String): Unit = {
    val target = Paths.get(path)
    if (!Files.exists(target)) {
      write(incoming, path)
      return
    }
    val existing = spark.read.parquet(path)
    val merged = Dedup.upsert(existing, incoming, naturalKey,
      versionCol = "extraction_timestamp")
    val staged = path.stripSuffix("/") + ".__staging__"
    write(merged, staged)
    // Atomic-enough swap for a single-writer pipeline (max_active_runs=1
    // in the reference, py:63): old table is replaced only after the
    // staged write fully succeeded.
    val old = path.stripSuffix("/") + ".__old__"
    deleteRecursively(Paths.get(old))
    Files.move(target, Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(staged), target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(Paths.get(old))
  }

  /** Partition-scoped upsert — the shape that holds at 100 TB: only the
    * DATE PARTITIONS present in the incoming batch are read, merged and
    * rewritten (via dynamic partition overwrite), so a 15-row daily
    * batch costs one partition's worth of IO regardless of table size.
    * [[upsertInto]] rewrites the whole table and remains the
    * full-refresh / schema-change path; this is the daily-increment
    * path. The touched-partition list is collected to the driver —
    * bounded by the batch's distinct dates (1 for a daily run), never
    * by table cardinality.
    */
  def upsertPartitions(spark: SparkSession, incoming: DataFrame,
      path: String): Unit = {
    import org.apache.spark.sql.functions.col
    if (!Files.exists(Paths.get(path))) {
      write(incoming, path)
      return
    }
    val touched = incoming.select(col("date")).distinct()
      .collect().map(_.get(0))
    val existingTouched = spark.read.parquet(path)
      .filter(col("date").isin(touched: _*))
    val merged = Dedup.upsert(existingTouched, incoming, naturalKey,
      versionCol = "extraction_timestamp")
    // overwrite ONLY partitions we write — per-WRITE dynamic mode via
    // the writer option, not a session-conf set/restore (concurrent
    // writers can interleave a global toggle; r10 ADVICE)
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("date").parquet(path)
  }

  /** Compact the table's small files: every incremental upsert rewrites
    * the table as `shuffle.partitions` files per date partition, and a
    * year of daily batches leaves thousands of KB-sized files whose
    * open/footer overhead dominates scans at 100 TB. Rewrites the table
    * to ≈ `targetFileBytes` per file (estimated from current on-disk
    * size) with the same stage-and-swap as [[upsertInto]]; rows are
    * hash-distributed on the partition column so each date directory
    * compacts toward a single file.
    */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val target = Paths.get(path)
    if (!Files.exists(target)) return
    val walk = Files.walk(target)
    val onDisk =
      try walk.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
      finally walk.close() // the stream holds directory handles
    val nFiles = math.max(1L, (onDisk + targetFileBytes - 1) / targetFileBytes)
    val df = spark.read.parquet(path)
      .repartition(nFiles.toInt, org.apache.spark.sql.functions.col("date"))
    val staged = path.stripSuffix("/") + ".__staging__"
    df.write.mode("overwrite").partitionBy("date").parquet(staged)
    val old = path.stripSuffix("/") + ".__old__"
    deleteRecursively(Paths.get(old))
    Files.move(target, Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(staged), target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(Paths.get(old))
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
}
