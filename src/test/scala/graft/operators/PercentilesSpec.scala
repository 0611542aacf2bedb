package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lineitem =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("sort-based exact percentiles are BIT-identical to the Percentile aggregate") {
    val probes = Seq(0.0 -> "0", 0.25 -> "25", 0.5 -> "50",
      0.95 -> "95", 1.0 -> "100")
    val sortBased = Percentiles.exact(lineitem, Seq("l_returnflag"),
        "l_extendedprice", probes)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), probes.indices.map(i => r.getDouble(i + 1))))
    val buffer = lineitem.groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"),
        array(probes.map(p => lit(p._1)): _*)).as("p"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toIndexedSeq))
    assert(sortBased.length === buffer.length)
    sortBased.zip(buffer).foreach { case ((g1, v1), (g2, v2)) =>
      assert(g1 === g2)
      v1.zip(v2).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a)
          === java.lang.Double.doubleToRawLongBits(b),
          s"group $g1: $a vs $b differ at bit level")
      }
    }
  }

  test("nulls in the value column are skipped like the aggregate does") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("a", Some(2.0))).toDF("g", "v")
    val got = Percentiles.exact(df, Seq("g"), "v", Seq(0.5 -> "50"))
      .select("p50").as[Double].head()
    assert(got === 2.0)
  }

  test("single-row group returns that value for every probe") {
    val df = Seq(("a", 7.5)).toDF("g", "v")
    val got = Percentiles.exact(df, Seq("g"), "v",
        Seq(0.0 -> "0", 0.5 -> "50", 1.0 -> "100"))
      .select("p0", "p50", "p100").as[(Double, Double, Double)].head()
    assert(got === ((7.5, 7.5, 7.5)))
  }

  test("interpolation between two values uses Spark's weighted form") {
    val df = Seq(("a", 10.0), ("a", 20.0)).toDF("g", "v")
    val got = Percentiles.exact(df, Seq("g"), "v", Seq(0.25 -> "25"))
      .select("p25").as[Double].head()
    // position 0.25: (1 - 0.25)*10 + (0.25 - 0)*20
    assert(got === (0.75 * 10.0 + 0.25 * 20.0))
  }
}
