package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("per-group per-column stats on a hand-checked fixture") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(2.0)), ("a", None),
      ("b", Some(10.0))).toDF("g", "v")
    val rows = Profile.columnStats(df, "g", Seq("v"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val a = rows("a")
    assert(a.getAs[Long]("n") === 4L)
    assert(a.getAs[Long]("n_null") === 1L)
    assert(a.getAs[Long]("ndv_exact") === 2L)
    assert(a.getAs[Double]("min") === 1.0)
    assert(a.getAs[Double]("max") === 2.0)
    assert(a.getAs[Double]("p50") === 2.0) // of {1,2,2}: pos 1.0 -> 2.0
    val b = rows("b")
    assert(b.getAs[Long]("n") === 1L)
    assert(b.getAs[Double]("p25") === 10.0)
  }

  test("sketch NDV tracks exact NDV within its error bound") {
    val df = (1 to 5000).map(i => ("g", (i % 700).toDouble)).toDF("g", "v")
    val r = Profile.columnStats(df, "g", Seq("v")).collect()(0)
    val exact = r.getAs[Long]("ndv_exact")
    val approx = r.getAs[Long]("ndv_approx")
    assert(exact === 700L)
    assert(math.abs(approx - exact).toDouble <= 0.1 * exact,
      s"HLL drifted: $approx vs $exact")
  }

  test("one output row per (group, column)") {
    val df = Seq(("a", 1.0, 2.0), ("b", 3.0, 4.0)).toDF("g", "x", "y")
    val out = Profile.columnStats(df, "g", Seq("x", "y"))
    assert(out.count() === 4)
    assert(out.select("column").distinct().count() === 2)
  }

  test("empty column list is rejected") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Profile.columnStats(df, "g", Seq.empty)
    }
  }
}
