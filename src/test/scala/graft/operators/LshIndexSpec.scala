package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The materialized LSH signature store ([[TextDedup.LshIndex]]):
  * store/read round-trip equivalence with the from-text path, and the
  * bucket layout's plan guarantee — the stored snapshot side of the
  * candidate join never exchanges.
  */
class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  private val snapshot = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely different content about spark engines"),
    (3L, "materialized signature stores make daily dedup cheap")
  ).toDF("doc_id", "text")

  private val batch = Seq(
    (101L, "the quick brown fox jumps over the lazy dog today"), // ~ 1
    (102L, "fresh unrelated material")
  ).toDF("doc_id", "text")

  test("stored index reproduces the from-text incremental result exactly") {
    val idx = TextDedup.buildLshIndex(snapshot, "doc_id", "text",
      numHashes = 32, bands = 16, shingleSize = 2)
    TextDedup.storeLshIndex(idx, "lshspec_a", buckets = 4)
    try {
      val stored = TextDedup.readLshIndex(spark, "lshspec_a")
      val viaIndex = TextDedup.minHashLshIncremental(stored,
          batch, "doc_id", "text", 32, 16, 2, 0.4, 100000L)
        .orderBy("batch_id", "snap_id").collect().map(_.toSeq)
      val viaText = TextDedup.minHashLshIncremental(
          snapshot, "doc_id", "text", batch, "doc_id", "text",
          32, 16, 2, 0.4)
        .orderBy("batch_id", "snap_id").collect().map(_.toSeq)
      assert(viaIndex.toSeq == viaText.toSeq)
      assert(viaIndex.nonEmpty, "planted pair must be found")
    } finally {
      spark.sql("DROP TABLE IF EXISTS lshspec_a_shingles")
      spark.sql("DROP TABLE IF EXISTS lshspec_a_bands")
    }
  }

  test("store key folds text content and parameters, not just ids") {
    // r12: an ids-only key adopted an orphaned store built from
    // DIFFERENT text under the same doc ids → zero candidate pairs.
    // The key must flip on any text change, any id change, and any
    // LSH-parameter change.
    val k1 = TextDedup.lshStoreKey("p", snapshot, "doc_id", "text",
      128, 32, 3)
    val mutated = snapshot.withColumn("text",
      concat(col("text"), lit(" extra")))
    assert(TextDedup.lshStoreKey("p", mutated, "doc_id", "text",
      128, 32, 3) !== k1, "text change must flip the key")
    val reId = snapshot.withColumn("doc_id", col("doc_id") + 10L)
    assert(TextDedup.lshStoreKey("p", reId, "doc_id", "text",
      128, 32, 3) !== k1, "id change must flip the key")
    assert(TextDedup.lshStoreKey("p", snapshot, "doc_id", "text",
      64, 32, 3) !== k1, "parameter change must flip the key")
    assert(TextDedup.lshStoreKey("p", snapshot, "doc_id", "text",
      128, 32, 3) === k1, "key must be deterministic")
  }

  test("adoption: a store surviving only as warehouse directories is reusable; torn stores are refused") {
    // r12 (VERDICT r11 item 2): with the in-memory catalog a previous
    // JVM's store survives only on disk. Simulate the fresh-JVM case by
    // filesystem-copying the managed directories to names this session
    // has never cataloged, then adopting.
    val idx = TextDedup.buildLshIndex(snapshot, "doc_id", "text",
      numHashes = 32, bands = 16, shingleSize = 2)
    TextDedup.storeLshIndex(idx, "lshspec_c", buckets = 4)
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def cp(from: String, to: String): Unit =
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(wh, from), fs,
        new org.apache.hadoop.fs.Path(wh, to), false, true,
        spark.sparkContext.hadoopConfiguration)
    try {
      cp("lshspec_c_shingles", "lshspec_d_shingles")
      cp("lshspec_c_bands", "lshspec_d_bands")
      assert(!spark.catalog.tableExists("lshspec_d_shingles"))
      assert(TextDedup.adoptLshIndex(spark, "lshspec_d", buckets = 4),
        "committed on-disk store must adopt")
      // adopted store: same rows, bucket spec restored (zero-exchange
      // layout contract), and the incremental join result is identical
      val a = TextDedup.readLshIndex(spark, "lshspec_c")
      val d = TextDedup.readLshIndex(spark, "lshspec_d")
      assert(d.shingles.exceptAll(a.shingles).isEmpty &&
        a.shingles.exceptAll(d.shingles).isEmpty)
      assert(d.bands.exceptAll(a.bands).isEmpty &&
        a.bands.exceptAll(d.bands).isEmpty)
      assert(graft.sources.Bucketing.bucketSpec(spark, "lshspec_d_shingles")
        === Some((4, Seq("__id"))))
      assert(graft.sources.Bucketing.bucketSpec(spark, "lshspec_d_bands")
        === Some((4, Seq("__band", "__bandsig"))))
      // torn store #1: one table's directory missing entirely
      cp("lshspec_c_shingles", "lshspec_e_shingles")
      assert(!TextDedup.adoptLshIndex(spark, "lshspec_e", buckets = 4),
        "store with a missing table must be rebuilt, not adopted")
      // torn store #2: directory present but uncommitted (no _SUCCESS)
      cp("lshspec_c_shingles", "lshspec_f_shingles")
      cp("lshspec_c_bands", "lshspec_f_bands")
      fs.delete(new org.apache.hadoop.fs.Path(wh,
        "lshspec_f_bands/_SUCCESS"), false)
      assert(!TextDedup.adoptLshIndex(spark, "lshspec_f", buckets = 4),
        "uncommitted directory must be refused")
    } finally {
      Seq("c", "d", "e", "f").foreach { s =>
        spark.sql(s"DROP TABLE IF EXISTS lshspec_${s}_shingles")
        spark.sql(s"DROP TABLE IF EXISTS lshspec_${s}_bands")
        Seq("shingles", "bands").foreach { t =>
          fs.delete(new org.apache.hadoop.fs.Path(wh,
            s"lshspec_${s}_$t"), true)
        }
      }
    }
  }

  test("stored bands side of the candidate join is exchange-free") {
    val idx = TextDedup.buildLshIndex(snapshot, "doc_id", "text",
      numHashes = 32, bands = 16, shingleSize = 2)
    TextDedup.storeLshIndex(idx, "lshspec_b", buckets = 4)
    try {
      val storedBands = spark.table("lshspec_b_bands")
      // stand-in for a day's banded batch: NOT bucketed, so it must pay
      // the only exchange in the join
      val probe = storedBands.limit(3)
        .select(col("__band"), col("__bandsig"))
        .withColumn("probe_id", lit(7L))
        .localCheckpoint() // sever lineage from the bucketed scan
      val j = storedBands.join(probe.hint("merge"),
        Seq("__band", "__bandsig"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(1200))
      val exchanges = "Exchange ".r.findAllIn(
        p.split("== Initial Plan ==")(0)).size
      assert(exchanges == 1,
        s"expected exactly one exchange (the probe side), got $exchanges:\n" +
          p.take(2000))
    } finally {
      spark.sql("DROP TABLE IF EXISTS lshspec_b_shingles")
      spark.sql("DROP TABLE IF EXISTS lshspec_b_bands")
    }
  }

  test("append + compact preserve bucket spec, rows, and the " +
      "zero-exchange stored side") {
    import graft.sources.Bucketing
    val idx = TextDedup.buildLshIndex(snapshot, "doc_id", "text",
      numHashes = 32, bands = 16, shingleSize = 2)
    TextDedup.storeLshIndex(idx, "lshspec_c", buckets = 4)
    try {
      // two daily appends, as q100's production loop runs them
      (0 until 2).foreach { i =>
        val day = batch.withColumn("doc_id", col("doc_id") + i * 1000)
        TextDedup.appendLshIndex(
          TextDedup.buildLshIndex(day, "doc_id", "text",
            numHashes = 32, bands = 16, shingleSize = 2), "lshspec_c")
      }
      val specBands = Bucketing.bucketSpec(spark, "lshspec_c_bands")
      assert(specBands.contains((4, Seq("__band", "__bandsig"))), specBands)
      val specSh = Bucketing.bucketSpec(spark, "lshspec_c_shingles")
      assert(specSh.contains((4, Seq("__id"))), specSh)

      def assertStoredSideExchangeFree(): Unit = {
        val storedBands = spark.table("lshspec_c_bands")
        val probe = storedBands.limit(3)
          .select(col("__band"), col("__bandsig"))
          .withColumn("probe_id", lit(7L))
          .localCheckpoint()
        val j = storedBands.join(probe.hint("merge"),
          Seq("__band", "__bandsig"))
        j.collect()
        val p = j.queryExecution.executedPlan.toString
        val exchanges = "Exchange ".r.findAllIn(
          p.split("== Initial Plan ==")(0)).size
        assert(exchanges == 1,
          s"stored side must not exchange after appends/compaction:\n" +
            p.take(2000))
      }
      assertStoredSideExchangeFree()

      val rowsBefore = spark.table("lshspec_c_bands").count()
      val filesBefore = spark.table("lshspec_c_bands").inputFiles.length
      TextDedup.compactLshIndex(spark, "lshspec_c")
      val rowsAfter = spark.table("lshspec_c_bands").count()
      val filesAfter = spark.table("lshspec_c_bands").inputFiles.length
      assert(rowsAfter == rowsBefore, s"$rowsBefore -> $rowsAfter")
      assert(filesAfter <= 4,
        s"compaction must leave at most one file per bucket, " +
          s"got $filesAfter (was $filesBefore)")
      assert(filesAfter < filesBefore,
        s"compaction did not reduce files: $filesBefore -> $filesAfter")
      assert(Bucketing.bucketSpec(spark, "lshspec_c_bands")
        .contains((4, Seq("__band", "__bandsig"))))
      assertStoredSideExchangeFree()
    } finally {
      Seq("lshspec_c_shingles", "lshspec_c_bands",
        "lshspec_c_shingles__compact", "lshspec_c_bands__compact")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("retention drops exactly the expired ids and keeps the layout " +
      "compacted + exchange-free") {
    import graft.sources.Bucketing
    val idx = TextDedup.buildLshIndex(snapshot, "doc_id", "text",
      numHashes = 32, bands = 16, shingleSize = 2)
    TextDedup.storeLshIndex(idx, "lshspec_d", buckets = 4)
    try {
      val idsBefore = spark.table("lshspec_d_bands")
        .select("__id").distinct().as[Long].collect().toSet
      assert(idsBefore === Set(1L, 2L, 3L))
      // takedown: doc 2 leaves the corpus
      TextDedup.retainLshIndex(spark, "lshspec_d", col("__id") =!= 2L)
      val idsAfter = spark.table("lshspec_d_bands")
        .select("__id").distinct().as[Long].collect().toSet
      assert(idsAfter === Set(1L, 3L))
      val shAfter = spark.table("lshspec_d_shingles")
        .select("__id").distinct().as[Long].collect().toSet
      assert(shAfter === Set(1L, 3L))
      // layout intact: spec preserved, at most one file per bucket,
      // stored side still the no-exchange leg of the candidate join
      assert(Bucketing.bucketSpec(spark, "lshspec_d_bands")
        .contains((4, Seq("__band", "__bandsig"))))
      assert(spark.table("lshspec_d_bands").inputFiles.length <= 4)
      val storedBands = spark.table("lshspec_d_bands")
      val probe = storedBands.limit(3)
        .select(col("__band"), col("__bandsig"))
        .withColumn("probe_id", lit(7L))
        .localCheckpoint()
      val j = storedBands.join(probe.hint("merge"), Seq("__band", "__bandsig"))
      j.collect()
      val exchanges = "Exchange ".r.findAllIn(
        j.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)).size
      assert(exchanges == 1, "stored side must not exchange after retention")
      // a retained store must still answer the incremental join
      val viaIndex = TextDedup.minHashLshIncremental(
        TextDedup.readLshIndex(spark, "lshspec_d"),
        batch, "doc_id", "text", 32, 16, 2, 0.4, 100000L)
      assert(viaIndex.where(col("snap_id") === 2L).count() === 0L)
    } finally {
      Seq("lshspec_d_shingles", "lshspec_d_bands",
        "lshspec_d_shingles__retain", "lshspec_d_bands__retain")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
