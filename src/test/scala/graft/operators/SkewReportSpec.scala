package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewReportSpec extends SparkSpec {
  import spark.implicits._

  test("exact share and skew factor on a planted hot key") {
    // 1000 rows, 10 keys: key 0 gets 550 rows, keys 1..9 get 50 each.
    val df = ((1 to 550).map(_ => 0) ++
      (1 to 9).flatMap(k => (1 to 50).map(_ => k))).toDF("k")
    val rows = Skew.skewReport(df, "k", topK = 3).collect()
    assert(rows.length === 3)
    val hot = rows(0)
    assert(hot.getAs[Int]("k") === 0)
    assert(hot.getAs[Long]("n") === 550L)
    assert(hot.getAs[Long]("share_ppm") === 550000L)
    // mean key load = 100; 550/100 → 5500 in x1000 units
    assert(hot.getAs[Long]("skew_x1000") === 5500L)
    // runners-up tie at 50 → key order breaks the tie
    assert(rows(1).getAs[Int]("k") === 1)
    assert(rows(2).getAs[Int]("k") === 2)
    assert(rows(1).getAs[Long]("skew_x1000") === 500L)
  }

  test("uniform keys report skew factor 1000") {
    val df = (0 until 400).map(i => i % 4).toDF("k")
    Skew.skewReport(df, "k", topK = 4).collect().foreach { r =>
      assert(r.getAs[Long]("skew_x1000") === 1000L)
      assert(r.getAs[Long]("share_ppm") === 250000L)
    }
  }

  test("topK bound is enforced") {
    val df = Seq(1).toDF("k")
    intercept[IllegalArgumentException] {
      Skew.skewReport(df, "k", topK = 0)
    }
  }
}
