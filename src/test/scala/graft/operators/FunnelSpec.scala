package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, String)]) =
    Funnel.firstCompletion(rows.toDF("u", "ts", "e"), "u", "ts",
        Seq(col("e") === "a", col("e") === "b", col("e") === "c"))
      .select("u", "step_1_ts", "step_2_ts", "step_3_ts", "steps_completed", "completed")
      .as[(Long, Option[Long], Option[Long], Option[Long], Long, Boolean)]
      .collect().sortBy(_._1)

  test("full completion anchors each step at the earliest valid event") {
    val out = run(Seq(
      (1L, 10L, "a"), (1L, 5L, "b"),  // b before a: must not count
      (1L, 20L, "b"), (1L, 15L, "b"), // earliest b AFTER a is 15
      (1L, 30L, "c")))
    assert(out === Seq((1L, Some(10L), Some(15L), Some(30L), 3L, true)))
  }

  test("chain breaks: later steps null, steps_completed partial") {
    val out = run(Seq(
      (1L, 10L, "a"), (1L, 20L, "c"),       // no b: c can't count
      (2L, 10L, "a"), (2L, 15L, "b"),       // no c
      (3L, 10L, "b"), (3L, 20L, "c")))      // never entered (no a)
    assert(out === Seq(
      (1L, Some(10L), None, None, 1L, false),
      (2L, Some(10L), Some(15L), None, 2L, false)))
  }

  test("strict ordering: same-timestamp next step does not count") {
    val out = run(Seq((1L, 10L, "a"), (1L, 10L, "b"), (1L, 11L, "c")))
    assert(out === Seq((1L, Some(10L), None, None, 1L, false)))
  }

  test("greedy anchor still completes when a later chain also exists") {
    // earliest a=1 anchors; b=2 then c=3 completes even though a second
    // full chain (a=10,b=20,c=30) exists
    val out = run(Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c")))
    assert(out === Seq((1L, Some(1L), Some(2L), Some(3L), 3L, true)))
  }
}
