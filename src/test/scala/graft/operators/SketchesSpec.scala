package graft.operators

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 1000 rows: "hot" 400x, "warm" 100x, 500 distinct singletons
  private def skewed = (
    Seq.fill(400)("hot") ++ Seq.fill(100)("warm")
      ++ (0 until 500).map(i => s"cold$i")
  ).toDF("item")

  test("frequentItems keeps every item above support (no false negatives)") {
    val got = Sketches.frequentItems(skewed, "item", support = 0.05)
      .map(_.toString).toSet
    assert(got.contains("hot") && got.contains("warm"),
      s"items with share 0.4/0.1 must survive a 0.05-support sketch: $got")
  }

  test("heavyHittersChecked: exact heavy hitters all flagged in-sketch") {
    val df = Sketches.heavyHittersChecked(skewed, "item",
      minShare = 0.08, support = 0.04)
    val rows = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(rows.map(x => (x._1, x._2)).toSeq ===
      Seq(("hot", 400L), ("warm", 100L)))
    assert(rows.forall(_._3), "KPS guarantee: no false negatives")
  }

  test("support >= minShare is rejected (guarantee would not hold)") {
    intercept[IllegalArgumentException] {
      Sketches.heavyHittersChecked(skewed, "item",
        minShare = 0.05, support = 0.05)
    }
  }
}
