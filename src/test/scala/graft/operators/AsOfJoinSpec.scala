package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of join picks latest right row at or before left time") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:10")),
      (3L, "B", ts("2024-01-01 10:00:07")),
      (4L, "A", ts("2024-01-01 09:00:00")) // before any quote -> dropped
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:00:10"), 101.0), // exact tie with trade 2
      ("B", ts("2024-01-01 10:00:06"), 50.0)
    ).toDF("sym", "qt", "px")

    val got = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "qt",
        Seq("px"))
      .orderBy("trade_id").collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    // trade1 -> 100.0 (10:00:00), trade2 -> 101.0 (tie matches), trade3 -> 50.0
    assert(got === Seq((1L, 100.0), (2L, 101.0), (3L, 50.0)))
  }

  test("as-of join keeps left schema columns intact") {
    val l = Seq((1L, "A", ts("2024-01-01 10:00:05"), "extra"))
      .toDF("id", "k", "t", "payload")
    val r = Seq(("A", ts("2024-01-01 10:00:00"), 7L)).toDF("k", "rt", "rv")
    val got = AsOfJoin.backward(l, r, Seq("k"), "t", "rt", Seq("rv"))
    assert(got.columns.toSeq === Seq("id", "k", "t", "payload", "rv"))
    assert(got.collect()(0).getAs[String]("payload") === "extra")
  }
}
