package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Dedup
import graft.sources.JdbcUpsert

/** S8 through a REAL `MERGE INTO`: the reference's transactional
  * ON CONFLICT upsert (py:422-468) against the embedded Derby that ships
  * with Spark — insert-new, update-existing, batch atomicity (rollback),
  * and semantic parity with the parquet-mode [[Dedup.upsert]].
  */
class JdbcUpsertSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  private def freshDb(name: String): String =
    s"jdbc:derby:memory:$name;create=true"

  private val keys = Seq("region", "data_ts")

  private def weatherSchema = StructType(Seq(
    StructField("region", StringType, nullable = false),
    StructField("data_ts", LongType, nullable = false),
    StructField("temperature", DoubleType),
    StructField("humidity", LongType),
    StructField("version", LongType)))

  private def df(rows: Seq[(String, Long, java.lang.Double, java.lang.Long, java.lang.Long)]) = {
    import spark.implicits._
    rows.toDF("region", "data_ts", "temperature", "humidity", "version")
  }

  test("MERGE inserts new keys and updates conflicting keys (EXCLUDED wins)") {
    val url = freshDb("merge1")
    JdbcUpsert.ensureTable(url, "weather", weatherSchema, keys)
    JdbcUpsert.upsert(
      df(Seq(("Nairobi", 1L, 20.0, 60L, 1L), ("Eldoret", 1L, 15.0, 70L, 1L))),
      url, "weather", keys, numPartitions = Some(1))
    // second batch: one conflict (Nairobi,1) with new values, one new key
    JdbcUpsert.upsert(
      df(Seq(("Nairobi", 1L, 25.5, 55L, 2L), ("Kisumu", 1L, 28.0, 80L, 1L))),
      url, "weather", keys, numPartitions = Some(1))
    val got = JdbcUpsert.read(spark, url, "weather")
      .orderBy("region", "data_ts")
      .select("region", "temperature", "version")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("Eldoret", 15.0, 1L), ("Kisumu", 28.0, 1L), ("Nairobi", 25.5, 2L)))
  }

  test("partition transaction rolls back atomically on mid-batch failure") {
    val url = freshDb("merge2")
    JdbcUpsert.ensureTable(url, "weather", weatherSchema, keys)
    JdbcUpsert.upsert(df(Seq(("Nairobi", 1L, 20.0, 60L, 1L))),
      url, "weather", keys, numPartitions = Some(1))
    // a null key violates the PK's NOT NULL -> the whole single-partition
    // batch (good row + bad row) must roll back, like py:465-468
    val schema = weatherSchema.copy(fields = weatherSchema.fields.map(
      f => if (keys.contains(f.name)) f.copy(nullable = true) else f))
    val bad = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row("Mombasa", 9L, 30.0, 50L, 1L),
      org.apache.spark.sql.Row(null, 9L, 31.0, 51L, 1L)), schema)
    intercept[org.apache.spark.SparkException] {
      JdbcUpsert.upsert(bad, url, "weather", keys, numPartitions = Some(1),
        batchSize = 500)
    }
    val after = JdbcUpsert.read(spark, url, "weather").collect()
    assert(after.length == 1 && after.head.getString(0) == "Nairobi",
      "failed batch must leave the table exactly as before")
  }

  test("JDBC MERGE result matches parquet-mode Dedup.upsert on the same data") {
    val url = freshDb("merge3")
    val existing = df(Seq(
      ("Nairobi", 1L, 20.0, 60L, 1L), ("Eldoret", 1L, 15.0, 70L, 3L)))
    val incoming = df(Seq(
      ("Nairobi", 1L, 25.5, 55L, 2L),   // newer -> wins in both modes
      ("Eldoret", 1L, 99.0, 99L, 2L),   // OLDER version: JDBC MERGE is
                                        // last-WRITE-wins, so pre-filter
                                        // stale rows like a CDC consumer
      ("Kisumu", 1L, 28.0, 80L, 1L)))
    // parquet mode: version-aware window
    val expected = Dedup.upsert(existing, incoming, keys, "version")
      .orderBy("region").collect().map(_.toSeq)

    // JDBC mode: the sink applies writes in arrival order, so stale rows
    // are dropped BEFORE the sink by the same version rule (anti-join
    // against newer existing versions) - the standard CDC-into-RDBMS shape
    JdbcUpsert.ensureTable(url, "weather", weatherSchema, keys)
    JdbcUpsert.upsert(existing, url, "weather", keys, numPartitions = Some(1))
    val fresh = incoming.as("i").join(existing.as("e"),
        keys.map(k => col(s"i.$k") === col(s"e.$k")).reduce(_ && _)
          && col("e.version") >= col("i.version"), "left_anti")
    JdbcUpsert.upsert(fresh, url, "weather", keys, numPartitions = Some(1))
    val got = JdbcUpsert.read(spark, url, "weather")
      .orderBy("region").collect().map(_.toSeq)
    assert(got.toSeq == expected.toSeq)
  }

  test("Postgres dialect emits the reference's ON CONFLICT statement shape") {
    val sql = JdbcUpsert.PostgresOnConflict().mergeSql(
      "weather_data", weatherSchema.fields.toSeq, keys)
    assert(sql.startsWith("INSERT INTO weather_data (region, data_ts, " +
      "temperature, humidity, version) VALUES (?, ?, ?, ?, ?)"))
    assert(sql.contains("ON CONFLICT (region, data_ts) DO UPDATE SET"))
    assert(sql.contains("temperature = EXCLUDED.temperature"))
    assert(!sql.contains("region = EXCLUDED.region"), "keys are not SET")
  }

  test("Postgres dialect golden statement: the reference's full " +
      "weather_data upsert, byte for byte") {
    // py:406-415 column order; py:426-452 conflict target + SET list
    // (latitude/longitude are inserted but never updated — static
    // region coordinates)
    val refCols = Seq(
      "region", "latitude", "longitude", "temperature", "feels_like",
      "temp_min", "temp_max", "pressure", "humidity", "visibility",
      "wind_speed", "wind_direction", "cloudiness", "weather_main",
      "weather_description", "rainfall_1h", "rainfall_3h", "sunrise",
      "sunset", "data_timestamp", "extraction_timestamp", "heat_index",
      "dew_point", "is_favorable_temp", "is_high_humidity",
      "rainfall_category", "date", "hour", "month", "year")
    val schema = StructType(refCols.map(c => StructField(c, StringType)))
    val sql = JdbcUpsert.PostgresOnConflict(Set("latitude", "longitude"))
      .mergeSql("weather_data", schema.fields.toSeq,
        Seq("region", "data_timestamp"))
    val refSet = Seq(
      "temperature", "feels_like", "temp_min", "temp_max", "pressure",
      "humidity", "visibility", "wind_speed", "wind_direction",
      "cloudiness", "weather_main", "weather_description", "rainfall_1h",
      "rainfall_3h", "sunrise", "sunset", "extraction_timestamp",
      "heat_index", "dew_point", "is_favorable_temp", "is_high_humidity",
      "rainfall_category", "date", "hour", "month", "year")
    val expected =
      s"INSERT INTO weather_data (${refCols.mkString(", ")}) " +
        s"VALUES (${refCols.map(_ => "?").mkString(", ")}) " +
        "ON CONFLICT (region, data_timestamp) DO UPDATE SET " +
        refSet.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    assert(sql == expected,
      s"generated statement drifted from py:426-452:\n$sql\nvs\n$expected")
  }

  test("dialect parity: Derby MERGE and PG ON CONFLICT describe the same upsert") {
    // The PG arm cannot EXECUTE here (no Postgres jar in the offline
    // cache, zero egress — r10; the executed arm is Derby). What is
    // verifiable offline is that both dialects DESCRIBE the identical
    // operation, so the Derby execution results transfer: parse each
    // generated statement back into (insert columns, key set,
    // update-set columns, parameter order semantics) and assert they
    // agree. Catches the drift class where one dialect's SET list or
    // parameter layout is edited without the other.
    val fields = weatherSchema.fields.toSeq
    val derby = JdbcUpsert.DerbyMerge.mergeSql("t1", fields, keys)
    val pg = JdbcUpsert.PostgresOnConflict().mergeSql("t1", fields, keys)
    def listOf(s: String): Seq[String] =
      s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    // insert column lists
    val derbyIns = listOf(
      """INSERT \(([^)]*)\)""".r.findFirstMatchIn(derby).get.group(1))
    val pgIns = listOf(
      """INSERT INTO t1 \(([^)]*)\)""".r.findFirstMatchIn(pg).get.group(1))
    assert(derbyIns === pgIns, "insert column order must match")
    // conflict keys
    val derbyKeys = """t\.(\w+) = CAST""".r.findAllMatchIn(derby)
      .map(_.group(1)).toSeq
    val pgKeys = listOf(
      """ON CONFLICT \(([^)]*)\)""".r.findFirstMatchIn(pg).get.group(1))
    assert(derbyKeys === pgKeys, "conflict key sets must match")
    // update-set columns (Derby: `x = ?` inside UPDATE SET; PG: EXCLUDED)
    val derbySet = """UPDATE SET (.*?) WHEN NOT MATCHED""".r
      .findFirstMatchIn(derby).get.group(1)
      .split(", ").map(_.takeWhile(_ != ' ')).toSeq
    val pgSet = """DO UPDATE SET (.*)$""".r.findFirstMatchIn(pg).get
      .group(1).split(", ").map(_.takeWhile(_ != ' ')).toSeq
    assert(derbySet === pgSet, "update SET lists must match")
    // parameter layouts are dialect-specific by design, but both must
    // cover every inserted column through parameterColumns
    val derbyParams = JdbcUpsert.DerbyMerge.parameterColumns(fields, keys)
    val pgParams = JdbcUpsert.PostgresOnConflict()
      .parameterColumns(fields, keys)
    assert(derby.count(_ == '?') === derbyParams.length)
    assert(pg.count(_ == '?') === pgParams.length)
    assert(pgParams === fields.map(_.name),
      "PG binds every column exactly once, in insert order")
  }

  test("ensureTable probes all identifier case foldings before CREATE") {
    val url = freshDb("merge5")
    // plant the table under a QUOTED lowercase identifier — the name a
    // lower-folding dialect (Postgres) stores; the old upper-only probe
    // missed it and the re-CREATE made a second table (or failed)
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        """CREATE TABLE "casefold" (region VARCHAR(10) NOT NULL,
          | data_ts BIGINT NOT NULL,
          | PRIMARY KEY (region, data_ts))""".stripMargin)
      finally st.close()
    } finally conn.close()
    val schema = StructType(Seq(
      StructField("region", StringType, nullable = false),
      StructField("data_ts", LongType, nullable = false)))
    JdbcUpsert.ensureTable(url, "casefold", schema, Seq("region", "data_ts"))
    // must be a no-op: no CASEFOLD twin created
    val c2 = DriverManager.getConnection(url)
    try {
      val rs = c2.getMetaData.getTables(null, null, "CASEFOLD", null)
      val upperTwin = try rs.next() finally rs.close()
      assert(!upperTwin,
        "ensureTable re-created the table under the other case folding")
    } finally c2.close()
  }

  test("multi-partition upsert with disjoint keys lands every row") {
    val url = freshDb("merge4")
    JdbcUpsert.ensureTable(url, "weather", weatherSchema, keys)
    val batch = df((1 to 200).map(i => (s"r$i", i.toLong,
      java.lang.Double.valueOf(i), java.lang.Long.valueOf(i),
      java.lang.Long.valueOf(1L)))).repartition(8)
    JdbcUpsert.upsert(batch, url, "weather", keys, batchSize = 32)
    assert(JdbcUpsert.read(spark, url, "weather").count() == 200)
  }

  override def afterAll(): Unit = {
    // embedded Derby keeps in-memory DBs for the JVM's lifetime; drop them
    Seq("merge1", "merge2", "merge3", "merge4", "merge5").foreach { n =>
      try DriverManager.getConnection(s"jdbc:derby:memory:$n;drop=true")
      catch { case _: java.sql.SQLException => () } // 08006 = dropped OK
    }
    super.afterAll()
  }
}
