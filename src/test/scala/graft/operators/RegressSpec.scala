package graft.operators

import graft.SparkSpec

class RegressSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double, Double)]) =
    Regress.olsByGroup(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]))))
      .toMap

  test("recovers an exact line: y = 2x + 3") {
    val pts = (1 to 10).map(i => ("a", i.toDouble, 2.0 * i + 3.0))
    val (n, slope, icept) = run(pts)("a")
    assert(n === 10L)
    // slope in y-cents per x-cent = 2.0 -> 2e6; intercept 300 cents -> 3e8
    assert(slope === Some(2000000L))
    assert(icept === Some(300000000L))
  }

  test("constant x yields a null fit, not a crash or garbage") {
    val pts = Seq(("a", 5.0, 1.0), ("a", 5.0, 2.0), ("a", 5.0, 9.0))
    val (n, slope, icept) = run(pts)("a")
    assert(n === 3L && slope === None && icept === None)
  }

  test("groups fit independently") {
    val pts = (1 to 6).map(i => ("up", i.toDouble, i.toDouble)) ++
      (1 to 6).map(i => ("down", i.toDouble, -i.toDouble + 10.0))
    val m = run(pts)
    assert(m("up")._2 === Some(1000000L))
    assert(m("down")._2 === Some(-1000000L))
  }

  test("matches a driver-side replay of the exact formula on noisy data") {
    val rnd = new scala.util.Random(71)
    val pts = (0 until 500).map { _ =>
      val x = (rnd.nextInt(40000) + 1) / 100.0
      val y = (rnd.nextInt(900000) + 1) / 100.0
      ("g", x, y)
    }
    def cents(v: Double) = math.floor(v * 100 + 0.5).toLong
    val xs = pts.map(p => cents(p._2)); val ys = pts.map(p => cents(p._3))
    val n = pts.size.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
    val den = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
    val slope = num / den
    val wantSlope = math.floor(1000000.0 * slope).toLong
    val wantIcept = math.floor(
      1000000.0 * ((sy.toDouble - slope * sx.toDouble) / n.toDouble)).toLong
    val (gotN, gotS, gotI) = run(pts)("g")
    assert(gotN === n && gotS === Some(wantSlope) &&
      gotI === Some(wantIcept))
  }
}
