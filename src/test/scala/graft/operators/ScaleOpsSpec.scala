package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Bucketing

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation (sum/count)") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
    val plain = df.groupBy($"l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
    val salted = Skew.saltedAgg(df, Seq("l_returnflag"), saltBuckets = 7,
        phase1 = Seq(sum(col("l_quantity").cast("decimal(18,2)")).as("s"),
          count(lit(1)).as("n")),
        phase2 = Seq(sum(col("s")).as("s"), sum(col("n")).as("n")))
      .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
    assert(salted === plain)
  }

  test("bucketed join runs with no exchange on either side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      Bucketing.writeBucketed(o.withColumnRenamed("o_custkey", "custkey"),
        "orders_b", "custkey", 4)
      Bucketing.writeBucketed(c.withColumnRenamed("c_custkey", "custkey"),
        "customer_b", "custkey", 4)
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "customer_b",
        "custkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      // row-level sanity vs the unbucketed join
      val expected = o.join(c, o("o_custkey") === c("c_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
