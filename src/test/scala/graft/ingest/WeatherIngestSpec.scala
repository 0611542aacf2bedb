package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.WeatherModel

/** Fixture documents as JSON strings, per FIXTURES.md §1 variants. */
object Fixtures {
  // Full payload (all paths present, incl. rain).
  val full: String =
    """{"region":"Nakuru","dt":1700000000,"visibility":10000,
      |"main":{"temp":22.5,"feels_like":21.9,"temp_min":20.1,"temp_max":24.3,
      |"pressure":1013,"humidity":65},
      |"wind":{"speed":3.2,"deg":180},"clouds":{"all":40},
      |"weather":[{"main":"Clouds","description":"scattered clouds"}],
      |"rain":{"1h":1.2,"3h":3.4},
      |"sys":{"sunrise":1699999000,"sunset":1700042000}}""".stripMargin
      .replaceAll("\n", "")

  // Missing optional: no rain subtree, no visibility, no wind.deg.
  val missingOptionals: String =
    """{"region":"Meru","dt":1700000100,
      |"main":{"temp":30.0,"feels_like":32.0,"temp_min":28.0,"temp_max":33.0,
      |"pressure":1010,"humidity":80},
      |"wind":{"speed":1.1},"clouds":{"all":10},
      |"weather":[{"main":"Clear","description":"clear sky"}],
      |"sys":{"sunrise":1699999100,"sunset":1700042100}}""".stripMargin
      .replaceAll("\n", "")

  // Missing REQUIRED path (no main.temp) -> row must be dropped (C1).
  val missingRequired: String =
    """{"region":"Eldoret","dt":1700000200,
      |"main":{"feels_like":20.0,"temp_min":18.0,"temp_max":22.0,
      |"pressure":1012,"humidity":55},
      |"wind":{"speed":2.0,"deg":90},"clouds":{"all":20},
      |"weather":[{"main":"Rain","description":"light rain"}],
      |"sys":{"sunrise":1699999200,"sunset":1700042200}}""".stripMargin
      .replaceAll("\n", "")

  // Out-of-range temperature (dropped by T2, py:309).
  val hotOutlier: String =
    """{"region":"Kitale","dt":1700000300,"visibility":9000,
      |"main":{"temp":77.0,"feels_like":70.0,"temp_min":70.0,"temp_max":80.0,
      |"pressure":1000,"humidity":30},
      |"wind":{"speed":5.0,"deg":270},"clouds":{"all":0},
      |"weather":[{"main":"Clear","description":"clear sky"}],
      |"sys":{"sunrise":1699999300,"sunset":1700042300}}""".stripMargin
      .replaceAll("\n", "")

  def df(spark: org.apache.spark.sql.SparkSession, docs: String*): DataFrame = {
    import spark.implicits._
    spark.read.schema(WeatherModel.owmSchema).json(docs.toDS)
  }
}

class WeatherIngestSpec extends SparkSpec {

  private def flat(docs: String*): DataFrame =
    WeatherIngest.flatten(Fixtures.df(spark, docs: _*),
      WeatherModel.regionDim(spark),
      extractionTime = to_timestamp(lit("2023-11-15 06:00:00")))

  test("full payload flattens to all 21 columns with correct values") {
    val rows = flat(Fixtures.full).collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getAs[String]("region") === "Nakuru")
    assert(r.getAs[Double]("latitude") === -0.3031)
    assert(r.getAs[Double]("temperature") === 22.5)
    assert(r.getAs[Int]("pressure") === 1013)
    assert(r.getAs[Int]("humidity") === 65)
    assert(r.getAs[Int]("visibility") === 10000)
    assert(r.getAs[Double]("wind_speed") === 3.2)
    assert(r.getAs[Int]("wind_direction") === 180)
    assert(r.getAs[String]("weather_main") === "Clouds")
    assert(r.getAs[String]("weather_description") === "scattered clouds")
    assert(r.getAs[Double]("rainfall_1h") === 1.2)
    assert(r.getAs[Double]("rainfall_3h") === 3.4)
    assert(r.getAs[java.sql.Timestamp]("data_timestamp").toInstant
      === java.time.Instant.ofEpochSecond(1700000000L))
  }

  test("optional fields null out; rain defaults to 0 (py:170-172, 183-188)") {
    val r = flat(Fixtures.missingOptionals).collect()(0)
    assert(r.getAs[Any]("visibility") === null)
    assert(r.getAs[Any]("wind_direction") === null)
    assert(r.getAs[Double]("wind_speed") === 1.1)
    assert(r.getAs[Double]("rainfall_1h") === 0.0)
    assert(r.getAs[Double]("rainfall_3h") === 0.0)
  }

  test("missing required path drops the row, others survive (C1, py:196-198)") {
    val got = flat(Fixtures.full, Fixtures.missingRequired, Fixtures.missingOptionals)
    assert(got.select("region").collect().map(_.getString(0)).sorted
      === Array("Meru", "Nakuru"))
  }

  test("errorColumn names the first missing required path") {
    val raw = Fixtures.df(spark, Fixtures.missingRequired)
    val err = raw.select(WeatherIngest.errorColumn.as("e")).collect()(0).getString(0)
    assert(err === "missing main.temp")
  }

  test("typed flatten yields Dataset[WeatherRecord] with correct fields") {
    val ds = WeatherIngest.flattenTyped(
      Fixtures.df(spark, Fixtures.full, Fixtures.missingOptionals),
      WeatherModel.regionDim(spark),
      extractionTime = to_timestamp(lit("2023-11-15 06:00:00")))
    val recs = ds.collect().sortBy(_.region)
    assert(recs.map(_.region).toSeq === Seq("Meru", "Nakuru"))
    val nakuru = recs.find(_.region == "Nakuru").get
    assert(nakuru.temperature === 22.5)
    assert(nakuru.visibility === Some(10000))
    val meru = recs.find(_.region == "Meru").get
    assert(meru.visibility === None)
    assert(meru.rainfall_1h === 0.0)
  }

  test("unknown region keeps the row with null coordinates (left join)") {
    val doc = Fixtures.full.replace("\"Nakuru\"", "\"Atlantis\"")
    val r = flat(doc).collect()(0)
    assert(r.getAs[String]("region") === "Atlantis")
    assert(r.getAs[Any]("latitude") === null)
  }
}
