package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

object StreamJoinSpec {
  final case class Reading(region: String, r_ts: Timestamp, temp: Double)
  final case class Alert(a_region: String, a_ts: Timestamp, level: String)
}

class StreamJoinSpec extends SparkSpec {
  import StreamJoinSpec._
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("stream-stream interval join pairs rows in-band, buffers across batches") {
    implicit val sqlCtx = spark.sqlContext
    val readings = MemoryStream[Reading]
    val alerts = MemoryStream[Alert]
    val joined = StreamJoin.intervalJoin(
      readings.toDF(), "region", "r_ts",
      alerts.toDF(), "a_region", "a_ts",
      watermark = "10 seconds", beforeMs = 2000L, afterMs = 2000L)
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: a reading with no alert yet — must be BUFFERED, not lost
      readings.addData(Reading("nairobi", ts(10000), 21.5))
      q.processAllAvailable()
      assert(spark.table("sj_out").count() === 0)

      // batch 2: one alert lands in-band (+1.5 s), one out-of-band
      // (+30 s), one for a different region
      alerts.addData(
        Alert("nairobi", ts(11500), "heat"),
        Alert("nairobi", ts(40000), "late"),
        Alert("mombasa", ts(10500), "other"))
      q.processAllAvailable()
      val got = spark.table("sj_out")
        .select("region", "temp", "level").as[(String, Double, String)]
        .collect().toSet
      assert(got === Set(("nairobi", 21.5, "heat")))

      // batch 3: a reading arriving AFTER its alert still pairs (band is
      // symmetric: r_ts within ±2 s of a_ts)
      readings.addData(Reading("mombasa", ts(11000), 30.0))
      q.processAllAvailable()
      val got3 = spark.table("sj_out")
        .select("region", "temp", "level").as[(String, Double, String)]
        .collect().toSet
      assert(got3 === Set(("nairobi", 21.5, "heat"),
        ("mombasa", 30.0, "other")))
    } finally q.stop()
  }

  test("interval join state is evictable: the plan carries both watermarks") {
    implicit val sqlCtx = spark.sqlContext
    val readings = MemoryStream[Reading]
    val alerts = MemoryStream[Alert]
    val joined = StreamJoin.intervalJoin(
      readings.toDF(), "region", "r_ts",
      alerts.toDF(), "a_region", "a_ts",
      watermark = "5 seconds", beforeMs = 1000L, afterMs = 1000L)
    // both event-time columns must be watermarked or state grows forever
    // (and Spark rejects the append-mode query outright)
    val wm = joined.queryExecution.analyzed.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => e
    }
    assert(wm.size === 2, "both join sides must carry a watermark")
  }
}
