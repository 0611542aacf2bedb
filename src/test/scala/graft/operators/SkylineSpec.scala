package graft.operators

import scala.util.Random

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def run(pts: Seq[(Long, Int, Double)]): Set[Long] =
    Skyline.frontier2D(pts.toDF("id", "x", "y"), "x", "y")
      .collect().map(_.getLong(0)).toSet

  private def brute(pts: Seq[(Long, Int, Double)]): Set[Long] =
    pts.filter { p =>
      !pts.exists(q => q._2 <= p._2 && q._3 <= p._3 &&
        (q._2 < p._2 || q._3 < p._3))
    }.map(_._1).toSet

  test("textbook frontier with dominated interior points") {
    val pts = Seq(
      (1L, 1, 9.0), (2L, 3, 5.0), (3L, 6, 2.0), // frontier
      (4L, 3, 9.0), (5L, 6, 5.0), (6L, 7, 2.5)) // dominated
    assert(run(pts) === Set(1L, 2L, 3L))
  }

  test("equal duplicate points all survive; same-x keeps only min y") {
    val pts = Seq(
      (1L, 2, 4.0), (2L, 2, 4.0), // identical frontier twins
      (3L, 2, 5.0), // same x, worse y -> dominated
      (4L, 5, 4.0)) // same y, worse x -> dominated by (2,4)
    assert(run(pts) === Set(1L, 2L))
  }

  test("monotone staircase keeps everything; anti-staircase keeps one") {
    val stairs = (1 to 8).map(i => (i.toLong, i, (10 - i).toDouble))
    assert(run(stairs) === stairs.map(_._1).toSet)
    val anti = (1 to 8).map(i => (i.toLong, i, i.toDouble))
    assert(run(anti) === Set(1L))
  }

  test("random point sets match the brute-force dominance definition") {
    val rnd = new Random(17)
    for (trial <- 0 until 5) {
      val n = 50 + trial * 40
      val pts = (0 until n).map(i =>
        (i.toLong, rnd.nextInt(20), (rnd.nextInt(200) / 10.0)))
      assert(run(pts) === brute(pts), s"trial $trial")
    }
  }

  test("null coordinates are dropped, not propagated") {
    val df = Seq[(Long, Option[Int], Option[Double])](
      (1L, Some(1), Some(1.0)), (2L, None, Some(0.0)), (3L, Some(0), None))
      .toDF("id", "x", "y")
    val out = Skyline.frontier2D(df, "x", "y").collect().map(_.getLong(0))
    assert(out.toSeq === Seq(1L))
  }
}
