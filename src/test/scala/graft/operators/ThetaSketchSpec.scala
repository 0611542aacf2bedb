package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  private val est = Sketches.thetaEstimate _

  test("exact mode: sketch estimate equals countDistinct below 2^lgK") {
    val df = (0 until 5000).map(i => (i % 7, (i % 1234).toLong))
      .toDF("g", "v")
    val out = df.groupBy("g")
      .agg(est(Sketches.thetaSketch(col("v"), 14)).as("e"),
        countDistinct(col("v")).as("x"))
      .collect()
    assert(out.length === 7)
    out.foreach(r => assert(r.getDouble(1) === r.getLong(2).toDouble))
  }

  test("estimation mode: estimate lands inside the theta error band") {
    // 60k distinct >> 2^12 nominal entries -> genuine sampling
    val df = (0 until 60000).map(_.toLong).toDF("v")
    val e = df.agg(est(Sketches.thetaSketch(col("v"), 12))).head().getDouble(0)
    assert(math.abs(e - 60000) < 60000 * 0.05, s"estimate $e")
    assert(e !== 60000.0, "60k distinct at lgK=12 cannot be exact")
  }

  test("merge across partitions is value-correct (distinct, not sum)") {
    // every partition sees the same values; a sum-like merge would 32x
    val df = spark.range(0, 32 * 100, 1, 32)
      .select((col("id") % 100).as("v"))
    val e = df.agg(est(Sketches.thetaSketch(col("v"), 14))).head().getDouble(0)
    assert(e === 100.0)
  }

  test("union agg over stored sketches == sketch of the union") {
    val df = (0 until 3000).map(i => (i % 3, i.toLong % 997)).toDF("g", "v")
    val perGroup = df.groupBy("g")
      .agg(Sketches.thetaSketch(col("v"), 14).as("sk"))
    val merged = perGroup
      .agg(est(Sketches.thetaUnion(col("sk"), 14))).head().getDouble(0)
    assert(merged === 997.0)
  }

  test("intersect and aNotB match exact set algebra in exact mode") {
    val a = (0L until 800L).toDF("v")
      .agg(Sketches.thetaSketch(col("v"), 14).as("sa"))
    val b = (500L until 1300L).toDF("v")
      .agg(Sketches.thetaSketch(col("v"), 14).as("sb"))
    val r = a.crossJoin(b).select(
      est(Sketches.thetaIntersect(col("sa"), col("sb"))).as("i"),
      est(Sketches.thetaANotB(col("sa"), col("sb"))).as("d"),
      est(Sketches.thetaANotB(col("sb"), col("sa"))).as("d2")).head()
    assert(r.getDouble(0) === 300.0) // 500..799
    assert(r.getDouble(1) === 500.0) // 0..499
    assert(r.getDouble(2) === 500.0) // 800..1299
  }

  test("string and binary inputs sketch by value") {
    val df = Seq("a", "b", "a", "c", "b").toDF("v")
    val e = df.agg(est(Sketches.thetaSketch(col("v"), 14))).head().getDouble(0)
    assert(e === 3.0)
    val bin = Seq(Array[Byte](1, 2), Array[Byte](1, 2), Array[Byte](3))
      .toDF("v")
    val e2 = bin.agg(est(Sketches.thetaSketch(col("v"), 14))).head()
      .getDouble(0)
    assert(e2 === 2.0)
  }

  test("nulls are ignored; empty input yields estimate 0") {
    val df = Seq[Option[Long]](Some(1L), None, Some(2L), None).toDF("v")
    val e = df.agg(est(Sketches.thetaSketch(col("v"), 14))).head().getDouble(0)
    assert(e === 2.0)
    val empty = Seq.empty[Long].toDF("v")
    val e2 = empty.agg(est(Sketches.thetaSketch(col("v"), 14))).head()
      .getDouble(0)
    assert(e2 === 0.0)
  }

  test("GraftExtensions registers the theta family with working builders") {
    val fns = new graft.expressions.GraftExtensions().functions
      .filter(_._1.startsWith("theta_")).map(f => f._1 -> f._3).toMap
    assert(fns.keySet === Set("theta_sketch_agg", "theta_union_agg",
      "theta_estimate", "theta_intersect", "theta_a_not_b"))
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = fns("theta_sketch_agg")(Seq(Literal(1L), Literal(14)))
    assert(agg.dataType === org.apache.spark.sql.types.BinaryType)
  }
}
