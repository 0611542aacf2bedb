package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.Sessionize.{Event, Session}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("stateful sessionization closes sessions on gap and carries state" +
      " across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.sessionize(input.toDS(), gapMs = 1000L)
    val q = sessions.writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: user 1 has two events 100ms apart (same session), then a
      // 5s gap inside the same batch -> first session closes
      input.addData(Event(1L, 0L), Event(1L, 100L), Event(1L, 5100L))
      q.processAllAvailable()
      val afterB1 = spark.table("sessions_out").as[Session].collect()
      assert(afterB1.toSeq === Seq(Session(1L, 0L, 100L, 2)))

      // batch 2: user 1 continues the open session (within gap of 5100)
      // and user 2 starts fresh; then a far event closes user 1's second
      // session
      input.addData(Event(1L, 5600L), Event(2L, 0L), Event(1L, 60000L))
      q.processAllAvailable()
      val afterB2 = spark.table("sessions_out").as[Session].collect()
      assert(afterB2.toSet.contains(Session(1L, 5100L, 5600L, 2)))
    } finally q.stop()
  }

  test("late cross-batch event extends session bounds instead of rewinding") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.sessionize(input.toDS(), gapMs = 1000L)
    val q = sessions.writeStream.format("memory").queryName("sessions_late")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      input.addData(Event(7L, 1000L))
      q.processAllAvailable()
      // late event 400 merges (gap from end 1000 is negative), then 1600
      // continues: one session 400..1600 — a rewound end would have split it
      input.addData(Event(7L, 400L), Event(7L, 1600L))
      q.processAllAvailable()
      input.addData(Event(7L, 99999L)) // far event closes the open session
      q.processAllAvailable()
      val got = spark.table("sessions_late").as[Session].collect().toSet
      assert(got.contains(Session(7L, 400L, 1600L, 3)), got)
    } finally q.stop()
  }

  test("out-of-order event older than the open session by > gap splits," +
      " never merges backwards") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.sessionize(input.toDS(), gapMs = 1000L)
    val q = sessions.writeStream.format("memory").queryName("sessions_ooo")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Event(9L, 100000L))
      q.processAllAvailable()
      // 5000 precedes the open session's start by 95s >> gap: batch q37
      // semantics give it its own session; the unbounded backward merge
      // would instead have produced one session spanning 5000..100000
      input.addData(Event(9L, 5000L))
      q.processAllAvailable()
      input.addData(Event(9L, 999999L)) // close the still-open session
      q.processAllAvailable()
      val got = spark.table("sessions_ooo").as[Session].collect().toSet
      assert(got.contains(Session(9L, 5000L, 5000L, 1)), got)
      assert(got.contains(Session(9L, 100000L, 100000L, 1)), got)
    } finally q.stop()
  }

  test("consecutive out-of-order events within gap form one session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.sessionize(input.toDS(), gapMs = 1000L)
    val q = sessions.writeStream.format("memory").queryName("sessions_ooo2")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Event(11L, 100000L))
      q.processAllAvailable()
      // both precede the open session by >> gap but are 500ms apart:
      // batch q37 semantics -> ONE session (5000, 5500, 2), not singletons
      input.addData(Event(11L, 5000L), Event(11L, 5500L))
      q.processAllAvailable()
      val got = spark.table("sessions_ooo2").as[Session].collect().toSet
      assert(got.contains(Session(11L, 5000L, 5500L, 2)), got)
    } finally q.stop()
  }
}
