package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("median/MAD on a known odd-sized group") {
    // values 1..7 plus outlier 1000: median of 8 values = 4.5,
    // deviations {3.5,2.5,1.5,.5,.5,1.5,2.5,995.5} → MAD = 2.0
    val df = (Seq(1, 2, 3, 4, 5, 6, 7, 1000)).map(v => ("g", v.toDouble))
      .toDF("k", "v")
    val r = Robust.madSummary(df, "k", "v", k = 3.0).collect()(0)
    assert(r.getAs[Long]("n") === 8L)
    assert(r.getAs[Double]("median") === 4.5)
    assert(r.getAs[Double]("mad") === 2.0)
    // fence = 6.0: only the outlier's deviation (995.5) exceeds it
    assert(r.getAs[Long]("n_outliers") === 1L)
    assert(r.getAs[Double]("worst_dev") === 995.5)
  }

  test("outliers cannot move the fence (breakdown robustness)") {
    // mean/stddev screens lose this: one huge value inflates sigma until
    // nothing is an outlier. The MAD verdict for the inliers must be
    // identical with and without a massive contaminant.
    val base = (1 to 101).map(v => ("g", v.toDouble))
    val poisoned = base ++ Seq(("g", 1e12))
    val cleanMad = Robust.madSummary(base.toDF("k", "v"), "k", "v", 3.0)
      .collect()(0).getAs[Double]("mad")
    val poisonedRow = Robust.madSummary(poisoned.toDF("k", "v"), "k", "v", 3.0)
      .collect()(0)
    // median shifts by half a step, MAD by at most one step
    assert(math.abs(poisonedRow.getAs[Double]("mad") - cleanMad) <= 1.0)
    assert(poisonedRow.getAs[Long]("n_outliers") === 1L)
  }

  test("groups are independent and nulls are skipped") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None), ("b", Some(10.0)), ("b", Some(20.0)), ("b", Some(90.0)))
      .toDF("k", "v")
    val rows = Robust.madSummary(df, "k", "v", 3.0)
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(rows("a").getAs[Long]("n") === 3L) // null row dropped
    assert(rows("a").getAs[Double]("median") === 2.0)
    assert(rows("a").getAs[Double]("mad") === 1.0)
    assert(rows("b").getAs[Double]("median") === 20.0)
  }

  test("fence multiplier must be positive") {
    val df = Seq(("a", 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Robust.madSummary(df, "k", "v", 0.0)
    }
  }
}
