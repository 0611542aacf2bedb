package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval matches exactly the containing intervals, once each") {
    val points = Seq((1L, 0.5), (2L, 5.0), (3L, 12.0), (4L, 99.0))
      .toDF("pid", "p")
    val intervals = Seq((10L, 0.0, 5.0), (20L, 4.0, 11.9), (30L, 5.0, 5.0))
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 3.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted
    // p=0.5 in [0,5]; p=5.0 in all three; p=12, p=99 in none
    assert(got === Seq((1L, 10L), (2L, 10L), (2L, 20L), (2L, 30L)))
  }

  test("range join plans as an equi-join on bins, not a nested loop") {
    val points = spark.range(100).select(col("id"),
      (col("id") % 50).cast("double").as("p"))
    val intervals = spark.range(100).select(col("id").as("iid"),
      (col("id") % 40).cast("double").as("s"))
      .withColumn("e", col("s") + 2.0)
    val j = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 2.0)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      plan.take(800))
  }
}
