package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinsorizeSpec extends SparkSpec {
  import spark.implicits._

  test("fences, clip count and clipped mean on a known group") {
    // values 0..100: p05 fence = 5.0, p95 fence = 95.0 (exact ranks).
    // clip touches 0..4 (→5) and 96..100 (→95): 10 rows.
    val df = (0 to 100).map(v => ("g", v.toDouble)).toDF("k", "v")
    val r = Robust.winsorizedStats(df, "k", "v", 0.05, 0.95).collect()(0)
    assert(r.getAs[Long]("n") === 101L)
    assert(r.getAs[Double]("fence_lo") === 5.0)
    assert(r.getAs[Double]("fence_hi") === 95.0)
    assert(r.getAs[Long]("n_clipped") === 10L)
    // clipped sum = sum(5..95) + 5*5 + 5*95 = 4550 + 25 + 475 = 5050
    assert(r.getAs[Double]("clipped_mean") === 5050.0 / 101)
  }

  test("clipping never reduces row count and bounds the range") {
    val df = Seq(("a", -1e9), ("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("a", 1e9)).toDF("k", "v")
    val r = Robust.winsorizedStats(df, "k", "v", 0.25, 0.75).collect()(0)
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Long]("n_clipped") === 2L)
    assert(r.getAs[Double]("fence_lo") === 1.0)
    assert(r.getAs[Double]("fence_hi") === 3.0)
  }

  test("invalid fences are rejected") {
    val df = Seq(("a", 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Robust.winsorizedStats(df, "k", "v", 0.9, 0.1)
    }
  }
}
