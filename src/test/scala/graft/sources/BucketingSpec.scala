package graft.sources

import graft.SparkSpec

/** Cross-JVM adoption safety of bucketed stores: the persisted bucket-
  * spec marker (r12 review) — a mismatched declared count would make
  * Spark silently drop files (declared < written) or assume a hash
  * distribution the files don't have (declared > written), both
  * corrupting joins with no error.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def wh = new org.apache.hadoop.fs.Path(
    spark.conf.get("spark.sql.warehouse.dir"))
  private def fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def uncatalog(table: String, to: String): Unit = {
    // simulate a fresh JVM: copy the managed dir to a name this session
    // has never cataloged
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(wh, table), fs,
      new org.apache.hadoop.fs.Path(wh, to), false, true,
      spark.sparkContext.hadoopConfiguration)
  }

  private def cleanup(tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS `$t`")
    fs.delete(new org.apache.hadoop.fs.Path(wh, t), true)
  }

  test("adoption validates the persisted bucket spec: match adopts, mismatch throws, no marker refuses") {
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    try {
      Bucketing.writeBucketed(df, "bkspec_src", Seq("id"), 4)
      uncatalog("bkspec_src", "bkspec_ok")
      uncatalog("bkspec_src", "bkspec_badn")
      uncatalog("bkspec_src", "bkspec_badc")
      uncatalog("bkspec_src", "bkspec_nomark")

      // correct spec adopts and the table answers queries
      assert(Bucketing.adoptBucketed(spark, "bkspec_ok", Seq("id"), 4))
      assert(spark.table("bkspec_ok").count() === 100L)
      assert(Bucketing.bucketSpec(spark, "bkspec_ok") ===
        Some((4, Seq("id"))))

      // wrong count: LOUD failure, not silent corruption
      val e1 = intercept[IllegalStateException] {
        Bucketing.adoptBucketed(spark, "bkspec_badn", Seq("id"), 8)
      }
      assert(e1.getMessage.contains("bucket-spec mismatch"))

      // wrong columns: same
      val e2 = intercept[IllegalStateException] {
        Bucketing.adoptBucketed(spark, "bkspec_badc", Seq("v"), 4)
      }
      assert(e2.getMessage.contains("bucket-spec mismatch"))

      // marker missing (pre-marker writer): refused -> caller rebuilds
      fs.delete(new org.apache.hadoop.fs.Path(wh,
        s"bkspec_nomark/${Bucketing.markerName}"), false)
      assert(!Bucketing.adoptBucketed(spark, "bkspec_nomark", Seq("id"), 4))
    } finally cleanup("bkspec_src", "bkspec_ok", "bkspec_badn",
      "bkspec_badc", "bkspec_nomark")
  }

  test("marker survives append and compaction rewrites") {
    val df = (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
    try {
      Bucketing.writeBucketed(df, "bkspec_m", Seq("id"), 4)
      Bucketing.appendBucketed(
        (51L to 60L).map(i => (i, s"v$i")).toDF("id", "v"), "bkspec_m")
      Bucketing.compactBucketed(spark, "bkspec_m")
      val marker = new org.apache.hadoop.fs.Path(wh,
        s"bkspec_m/${Bucketing.markerName}")
      assert(fs.exists(marker), "marker must survive compaction's rename")
      uncatalog("bkspec_m", "bkspec_m2")
      assert(Bucketing.adoptBucketed(spark, "bkspec_m2", Seq("id"), 4))
      assert(spark.table("bkspec_m2").count() === 60L)
    } finally cleanup("bkspec_m", "bkspec_m__compact", "bkspec_m2")
  }
}
