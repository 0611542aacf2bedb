package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  private def run(rows: Seq[(Long, String, Long, Long)]) =
    Scd.type2(
        rows.toDF("k", "attr", "t", "id")
          .withColumn("t", org.apache.spark.sql.functions
            .timestamp_seconds(org.apache.spark.sql.functions.col("t"))),
        "k", Seq("attr"), "t", "id")
      .orderBy("k", "version")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4), r.getBoolean(5)))
      .toSeq

  test("collapses consecutive duplicates and builds half-open intervals") {
    val out = run(Seq(
      (1L, "a", 10L, 0L), (1L, "a", 20L, 1L), (1L, "b", 30L, 2L),
      (1L, "b", 40L, 3L), (1L, "a", 50L, 4L)))
    assert(out === Seq(
      (1L, "a", ts(10), Some(ts(30)), 1L, false),
      (1L, "b", ts(30), Some(ts(50)), 2L, false),
      (1L, "a", ts(50), None, 3L, true)))
  }

  test("single-version keys are current from their first event") {
    val out = run(Seq((7L, "x", 5L, 0L), (7L, "x", 9L, 1L)))
    assert(out === Seq((7L, "x", ts(5), None, 1L, true)))
  }

  test("keys are independent; ties break on the tie column") {
    val out = run(Seq(
      (1L, "a", 10L, 1L), (1L, "b", 10L, 0L), // same ts: id 0 first
      (2L, "z", 10L, 2L)))
    assert(out === Seq(
      (1L, "b", ts(10), Some(ts(10)), 1L, false),
      (1L, "a", ts(10), None, 2L, true),
      (2L, "z", ts(10), None, 1L, true)))
  }

  test("null attributes compare null-safely") {
    val rows = Seq[(Long, Option[String], Long, Long)](
      (3L, None, 1L, 0L), (3L, None, 2L, 1L), (3L, Some("v"), 3L, 2L))
      .toDF("k", "attr", "t", "id")
      .withColumn("t", org.apache.spark.sql.functions
        .timestamp_seconds(org.apache.spark.sql.functions.col("t")))
    val out = Scd.type2(rows, "k", Seq("attr"), "t", "id")
      .orderBy("version").collect()
    assert(out.length === 2) // null run collapses to one version
    assert(out(0).isNullAt(1) && out(1).getString(1) === "v")
  }

  test("multi-attribute tracking: any attr change opens a version") {
    val df = Seq(
      (1L, "a", 1, 10L, 0L), (1L, "a", 2, 20L, 1L), (1L, "a", 2, 30L, 2L))
      .toDF("k", "s", "i", "t", "id")
      .withColumn("t", org.apache.spark.sql.functions
        .timestamp_seconds(org.apache.spark.sql.functions.col("t")))
    val out = Scd.type2(df, "k", Seq("s", "i"), "t", "id")
      .orderBy("version").collect()
    assert(out.map(_.getLong(5)).toSeq === Seq(1L, 2L))
    assert(out.map(_.getInt(2)).toSeq === Seq(1, 2))
  }
}
