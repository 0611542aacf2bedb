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

  /** Write `df` as a bucketed, sorted table in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Join two tables bucketed on the same key with the same bucket count:
    * planner sees compatible output partitioning on both sides and elides
    * both exchanges.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
