package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Guards against testdata parquet-encoding drift: the driver has shipped
  * `events.ts` both as int64 epoch-nanos and as `timestamp[us]`, and a
  * third change should fail HERE with a clear message, not as 34 opaque
  * analysis exceptions across the query suite. Exercises every branch of
  * `Queries.normalizeEvents` via written fixtures, plus a probe of the
  * real testdata.
  */
class EventsSchemaSpec extends SparkSpec {

  private val baseNs = 1700000000123456000L // µs-aligned epoch-nanos

  private def tmpDir(): String =
    Files.createTempDirectory("events-fixture").toString

  private def assertCanonical(df: org.apache.spark.sql.DataFrame): Unit = {
    assert(df.schema("ts").dataType == TimestampType,
      s"ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
    assert(df.schema("ts_ns").dataType == LongType,
      s"ts_ns must be LongType epoch-nanos, got ${df.schema("ts_ns").dataType}")
  }

  test("long (epoch-ns) encoding normalizes, ts_ns bit-exact") {
    val dir = tmpDir()
    import spark.implicits._
    Seq((1L, baseNs), (2L, baseNs + 1000L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Queries.normalizeEvents(spark.read.parquet(s"$dir/events.parquet"))
    assertCanonical(df)
    val got = df.orderBy("event_id").select("ts_ns").as[Long].collect()
    assert(got.sameElements(Array(baseNs, baseNs + 1000L)))
  }

  test("timestamp (µs TimestampType) encoding normalizes, ts_ns = µs*1000") {
    val dir = tmpDir()
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType)))
    val rows = java.util.Arrays.asList(
      Row(1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        baseNs / 1000000000L, baseNs % 1000000000L))))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Queries.normalizeEvents(spark.read.parquet(s"$dir/events.parquet"))
    assertCanonical(df)
    assert(df.select("ts_ns").head.getLong(0) == baseNs)
  }

  test("timestamp_ntz encoding normalizes identically under UTC session") {
    val dir = tmpDir()
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType)))
    val rows = java.util.Arrays.asList(
      Row(1L, java.time.LocalDateTime.ofEpochSecond(
        baseNs / 1000000000L, (baseNs % 1000000000L).toInt,
        java.time.ZoneOffset.UTC)))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Queries.normalizeEvents(spark.read.parquet(s"$dir/events.parquet"))
    assertCanonical(df)
    assert(df.select("ts_ns").head.getLong(0) == baseNs)
  }

  test("unrecognized ts encoding fails fast with a diagnostic") {
    import spark.implicits._
    val bad = Seq((1L, "2024-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException](Queries.normalizeEvents(bad))
    assert(e.getMessage.contains("events.ts"))
  }

  test("driver testdata probe: events() canonical on sf0.001") {
    val df = Queries.normalizeEvents(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    assertCanonical(df)
    assert(df.limit(1).count() == 1)
  }
}
