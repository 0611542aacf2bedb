package graft.operators

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def diff(oldRows: Seq[(Long, String, Option[Int])],
      newRows: Seq[(Long, String, Option[Int])]) =
    Cdc.snapshotDiff(
        oldRows.toDF("k", "s", "i"), newRows.toDF("k", "s", "i"),
        Seq("k"), Seq("s", "i"))
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq

  test("classifies inserts, deletes, updates; drops unchanged") {
    val old = Seq((1L, "a", Some(1)), (2L, "b", Some(2)), (3L, "c", Some(3)))
    val neu = Seq((1L, "a", Some(1)), (2L, "B", Some(2)), (4L, "d", Some(4)))
    assert(diff(old, neu) === Seq((2L, "update"), (3L, "delete"),
      (4L, "insert")))
  }

  test("null transitions are real updates; null == null is unchanged") {
    val old = Seq((1L, "a", None: Option[Int]), (2L, "b", None))
    val neu = Seq((1L, "a", None: Option[Int]), (2L, "b", Some(9)))
    assert(diff(old, neu) === Seq((2L, "update")))
  }

  test("old/new value pairs carry the right sides") {
    val out = Cdc.snapshotDiff(
        Seq((1L, "x", Some(5))).toDF("k", "s", "i"),
        Seq((1L, "y", Some(5)), (2L, "z", Some(7))).toDF("k", "s", "i"),
        Seq("k"), Seq("s", "i"))
      .orderBy("k").collect()
    val upd = out(0)
    assert(upd.getString(1) === "update" &&
      upd.getString(2) === "x" && upd.getString(3) === "y")
    val ins = out(1)
    assert(ins.getString(1) === "insert" && ins.isNullAt(2) &&
      ins.getString(3) === "z")
  }

  test("empty diffs: identical snapshots produce zero rows") {
    val rows = Seq((1L, "a", Some(1)), (2L, "b", None: Option[Int]))
    assert(diff(rows, rows) === Seq.empty)
  }
}
