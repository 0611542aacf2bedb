package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class CohortSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-$day%02d $hour%02d:00:00")

  test("cohorts, retention offsets and distinctness") {
    // u1: first day1, back day2 (d1) and day8 (d7), twice on day2
    // u2: first day1, never back
    // u3: first day2, back day3 (d1)
    val events = Seq(
      (1L, ts(1, 9)), (1L, ts(2, 1)), (1L, ts(2, 23)), (1L, ts(8)),
      (2L, ts(1)),
      (3L, ts(2)), (3L, ts(3))).toDF("user_id", "ts")
    val rows = Cohort.retention(events, "user_id", "ts", Seq(1, 7))
      .collect().map(r => r.getAs[java.sql.Date]("cohort_day").toString -> r)
      .toMap
    assert(rows.size === 2)
    val c1 = rows("2026-01-01")
    assert(c1.getAs[Long]("cohort_size") === 2L)
    assert(c1.getAs[Long]("d1") === 1L) // u1 only; duplicate visits collapse
    assert(c1.getAs[Long]("d7") === 1L)
    val c2 = rows("2026-01-02")
    assert(c2.getAs[Long]("cohort_size") === 1L)
    assert(c2.getAs[Long]("d1") === 1L)
    assert(c2.getAs[Long]("d7") === 0L)
  }

  test("same-day repeat activity is not retention") {
    val events = Seq((1L, ts(1, 1)), (1L, ts(1, 20))).toDF("user_id", "ts")
    val r = Cohort.retention(events, "user_id", "ts", Seq(1)).collect()(0)
    assert(r.getAs[Long]("cohort_size") === 1L)
    assert(r.getAs[Long]("d1") === 0L)
  }

  test("trailing active users: window membership and distinctness") {
    // u1 active day1, day3; u2 active day1; u3 active day5
    val events = Seq(
      (1L, ts(1)), (1L, ts(3)), (1L, ts(3, 12)),
      (2L, ts(1)),
      (3L, ts(5))).toDF("user_id", "ts")
    val rows = Cohort.trailingActive(events, "user_id", "ts", windowDays = 3)
      .collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("active_users")).toMap
    // report days = observed activity days only
    assert(rows.keySet === Set("2026-01-01", "2026-01-03", "2026-01-05"))
    assert(rows("2026-01-01") === 2L) // u1, u2
    assert(rows("2026-01-03") === 2L) // u1 (counted once), u2 (day1 in window)
    assert(rows("2026-01-05") === 2L) // u1 (day3), u3
  }

  test("window of 1 day degenerates to DAU") {
    val events = Seq((1L, ts(1)), (2L, ts(1)), (1L, ts(2)))
      .toDF("user_id", "ts")
    val rows = Cohort.trailingActive(events, "user_id", "ts", 1)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("active_users")).toMap
    assert(rows === Map("2026-01-01" -> 2L, "2026-01-02" -> 1L))
  }

  test("offsets must be positive and non-empty") {
    val events = Seq((1L, ts(1))).toDF("user_id", "ts")
    intercept[IllegalArgumentException] {
      Cohort.retention(events, "user_id", "ts", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Cohort.retention(events, "user_id", "ts", Seq(0))
    }
  }
}
