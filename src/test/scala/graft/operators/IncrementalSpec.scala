package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  private def partial(df: DataFrame): DataFrame =
    df.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum((col("o_totalprice") * 100).cast("long")).as("cents"),
        min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))

  private val merges = Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)](
    "n" -> (sum(_)), "cents" -> (sum(_)), "lo" -> (min(_)), "hi" -> (max(_)))

  test("merge of disjoint batches equals the full recompute") {
    val a = partial(orders.where(col("o_orderkey") % 3 === 0))
    val b = partial(orders.where(col("o_orderkey") % 3 =!= 0))
    val merged = Incremental.merge(a, b, Seq("o_orderpriority"), merges)
      .orderBy("o_orderpriority").collect().toSeq
    val full = partial(orders).orderBy("o_orderpriority").collect().toSeq
    assert(merged === full)
  }

  test("merge is associative: (a+b)+c == a+(b+c)") {
    val parts = (0 to 2).map(i => partial(orders.where(col("o_orderkey") % 3 === i)))
    val left = Incremental.merge(
      Incremental.merge(parts(0), parts(1), Seq("o_orderpriority"), merges),
      parts(2), Seq("o_orderpriority"), merges)
    val right = Incremental.merge(parts(0),
      Incremental.merge(parts(1), parts(2), Seq("o_orderpriority"), merges),
      Seq("o_orderpriority"), merges)
    assert(left.orderBy("o_orderpriority").collect().toSeq
      === right.orderBy("o_orderpriority").collect().toSeq)
  }

  test("a key present only in the delta appears in the merged state") {
    val a = partial(orders.where(col("o_orderpriority") =!= "5-LOW"))
    val b = partial(orders.where(col("o_orderpriority") === "5-LOW"))
    val merged = Incremental.merge(a, b, Seq("o_orderpriority"), merges)
    assert(merged.where(col("o_orderpriority") === "5-LOW").count() === 1)
  }

  test("state stays one row per key across repeated merges") {
    val s0 = partial(orders)
    val s1 = Incremental.merge(s0, partial(orders), Seq("o_orderpriority"), merges)
    assert(s1.count() === s0.count())
  }
}
