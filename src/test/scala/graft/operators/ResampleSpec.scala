package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def fill(rows: Seq[(String, Long, Option[Double])]) =
    Resample.gridFill(
      rows.toDF("k", "cell", "v"),
      Seq("k"), "cell", Seq("v"))

  test("gridFill densifies each key's span and forward-fills gaps") {
    val out = fill(Seq(
        ("a", 5L, Some(1.0)), ("a", 8L, Some(2.0)), ("a", 9L, Some(3.0)),
        ("b", 3L, Some(9.0))))
      .select("k", "cell", "v", "v_ffill", "is_gap")
      .as[(String, Long, Option[Double], Option[Double], Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    assert(out === Seq(
      ("a", 5L, Some(1.0), Some(1.0), false),
      ("a", 6L, None, Some(1.0), true),
      ("a", 7L, None, Some(1.0), true),
      ("a", 8L, Some(2.0), Some(2.0), false),
      ("a", 9L, Some(3.0), Some(3.0), false),
      ("b", 3L, Some(9.0), Some(9.0), false)))
  }

  test("a null value in an OBSERVED cell is not a gap, and ffill skips it") {
    val out = fill(Seq(("a", 1L, Some(4.0)), ("a", 2L, None)))
      .select("cell", "v_ffill", "is_gap")
      .as[(Long, Option[Double], Boolean)].collect().sortBy(_._1)
    // cell 2 exists in obs (is_gap reflects the value column being null —
    // the caller's chosen gap marker), but ffill still carries 4.0 forward
    assert(out === Seq((1L, Some(4.0), false), (2L, Some(4.0), true)))
  }

  test("multiple value columns fill independently") {
    val out = Resample.gridFill(
        Seq(("a", 1L, Some(1.0), Some(10.0)), ("a", 3L, Some(3.0), None))
          .toDF("k", "cell", "x", "y"),
        Seq("k"), "cell", Seq("x", "y"))
      .select("cell", "x_ffill", "y_ffill")
      .as[(Long, Option[Double], Option[Double])].collect().sortBy(_._1)
    assert(out === Seq(
      (1L, Some(1.0), Some(10.0)),
      (2L, Some(1.0), Some(10.0)),
      (3L, Some(3.0), Some(10.0)))) // y observed-null at 3 → carries 10.0
  }

  test("cell() uses integral division (no double precision loss on epoch nanos)") {
    // 2^60 + 1 ns: a double would round this; `div` must not
    val df = Seq((1152921504606846977L)).toDF("ts_ns")
      .select(Resample.cell("ts_ns", 1000L).as("c"))
    assert(df.as[Long].head() === 1152921504606846L)
  }
}
