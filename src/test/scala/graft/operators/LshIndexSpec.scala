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
          batch, "doc_id", "text", 32, 16, 2, 0.4)
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
}
