package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed storage: pre-shuffle a table ONCE at write time so every
  * subsequent equi-join or aggregation on the bucket key runs with zero
  * exchange.
  *
  * This is the storage-level answer to "minimize shuffles" at 100 TB: a
  * fact table bucketed by its join key turns every fact⋈fact join on that
  * key into a zip of co-located buckets (sort-merge with no Exchange in
  * the plan — asserted in PlanAuditSpec). The trade: writes pay one
  * shuffle + produce `buckets` files per partition; choose `buckets` ≈
  * cluster cores × small factor so bucket files stay HDFS-block sized at
  * the target scale.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted table in the session catalog.
    * Idempotent ACROSS sessions, not just within one: with the
    * in-memory catalog, a previous session's managed-table directory
    * survives on disk while the table entry does not, and a fresh
    * `saveAsTable` then fails with LOCATION_ALREADY_EXISTS — so any
    * stale location is removed after the DROP.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    writeBucketed(df, table, Seq(bucketCol), buckets)

  /** Multi-column bucket spec: the join this serves must use ALL bucket
    * columns as (a superset of) its equi-keys — Spark only elides the
    * exchange when the join keys cover the bucket columns.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Join two tables bucketed on the same key with the same bucket count:
    * planner sees compatible output partitioning on both sides and elides
    * both exchanges. Verifies the bucket specs up front — on mismatched
    * or unbucketed tables the join would silently reintroduce full
    * shuffles, defeating the function's purpose.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame = {
    val l = bucketSpec(spark, leftTable)
    val r = bucketSpec(spark, rightTable)
    require(l.exists(_._2.contains(key)) && l == r,
      s"$leftTable and $rightTable must both be bucketed on '$key' with " +
        s"equal bucket counts (got $l vs $r)")
    // MERGE hint: at small SFs AQE would broadcast one side, which also
    // avoids the exchange but silently stops exercising the bucket
    // layout this function exists for — sort-merge over co-located,
    // pre-sorted buckets is the shape that scales to fact⋈fact.
    spark.table(leftTable)
      .join(spark.table(rightTable).hint("merge"), Seq(key))
  }

  /** (numBuckets, bucketColumns) of a catalog table, if bucketed. */
  def bucketSpec(spark: SparkSession, table: String)
      : Option[(Int, Seq[String])] = {
    val rows = spark.sql(s"DESCRIBE FORMATTED $table").collect()
    def field(name: String): Option[String] =
      rows.find(_.getString(0).trim == name).map(_.getString(1).trim)
    for {
      n <- field("Num Buckets").map(_.toInt)
      cols <- field("Bucket Columns")
    } yield (n, cols.stripPrefix("[").stripSuffix("]")
      .split(",").map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq)
  }
}
