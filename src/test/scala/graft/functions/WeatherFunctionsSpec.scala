package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Oracle ports of the reference's scalar functions
  * (daily_weather_etl_kenya.py:342-390), written directly from the Python,
  * used to property-check the Column implementations.
  */
object PyOracle {
  def round2(x: Double): Double =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble

  def heatIndex(temp: Double, humidity: Double): Double =
    if (temp < 27) temp
    else round2(
      -8.78469475556 +
        1.61139411 * temp +
        2.33854883889 * humidity +
        -0.14611605 * temp * humidity +
        -0.012308094 * temp * temp +
        -0.0164248277778 * humidity * humidity +
        0.002211732 * temp * temp * humidity +
        0.00072546 * temp * humidity * humidity +
        -0.000003582 * temp * temp * humidity * humidity)

  def dewPoint(temp: Double, humidity: Double): Double = {
    val a = 17.27
    val b = 237.7
    val alpha = ((a * temp) / (b + temp)) + (humidity / 100.0)
    round2((b * alpha) / (a - alpha))
  }

  def categorize(rainfall: Double): String =
    if (rainfall == 0) "No Rain"
    else if (rainfall < 2.5) "Light Rain"
    else if (rainfall < 10) "Moderate Rain"
    else if (rainfall < 50) "Heavy Rain"
    else "Very Heavy Rain"
}

class WeatherFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def evalHi(t: Double, h: Double): Double =
    Seq((t, h)).toDF("t", "h")
      .select(WeatherFunctions.heatIndex(col("t"), col("h")).as("v"))
      .collect()(0).getDouble(0)

  private def evalDp(t: Double, h: Double): Double =
    Seq((t, h)).toDF("t", "h")
      .select(WeatherFunctions.dewPoint(col("t"), col("h")).as("v"))
      .collect()(0).getDouble(0)

  test("heat index matches the python oracle on a value grid") {
    val temps = Seq(-5.0, 0.0, 18.0, 26.99, 27.0, 27.01, 33.3, 42.7, 50.0)
    val hums = Seq(0.0, 10.0, 55.5, 70.0, 100.0)
    val rows = for (t <- temps; h <- hums) yield (t, h)
    val got = rows.toDF("t", "h")
      .select(col("t"), col("h"),
        WeatherFunctions.heatIndex(col("t"), col("h")).as("v"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(2) === PyOracle.heatIndex(r.getDouble(0), r.getDouble(1)),
        s"t=${r.getDouble(0)} h=${r.getDouble(1)}")
    }
  }

  test("heat index below 27 passes temperature through unrounded (py:348-349)") {
    assert(evalHi(26.999999, 80.0) === 26.999999)
  }

  test("dew point matches the python oracle (incl. the missing-ln quirk)") {
    val rows = for (t <- Seq(-5.0, 0.0, 15.0, 25.0, 50.0);
                    h <- Seq(0.0, 33.0, 66.6, 100.0)) yield (t, h)
    rows.foreach { case (t, h) =>
      assert(evalDp(t, h) === PyOracle.dewPoint(t, h), s"t=$t h=$h")
    }
  }

  test("rainfall categories: exact boundaries, first-match order (py:379-390)") {
    val cases = Seq(
      0.0 -> "No Rain",
      0.01 -> "Light Rain",
      2.4999 -> "Light Rain",
      2.5 -> "Moderate Rain",
      9.999 -> "Moderate Rain",
      10.0 -> "Heavy Rain",
      49.99 -> "Heavy Rain",
      50.0 -> "Very Heavy Rain",
      120.0 -> "Very Heavy Rain")
    val got = cases.map(_._1).toDF("r")
      .select(col("r"), WeatherFunctions.rainfallCategory(col("r")).as("c"))
      .collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    cases.foreach { case (r, want) => assert(got(r) === want, s"r=$r") }
  }

  test("null rainfall is treated as the stored default 0 (py:183-188)") {
    val got = Seq[Option[Double]](None).toDF("r")
      .select(WeatherFunctions.rainfallCategory(col("r")).as("c"))
      .collect()(0).getString(0)
    assert(got === "No Rain")
  }

  test("property: both scalars match the oracle on 2000 seeded random points") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(2000)((rnd.nextDouble() * 55 - 5, rnd.nextDouble() * 100))
    val got = rows.toDF("t", "h")
      .select(col("t"), col("h"),
        WeatherFunctions.heatIndex(col("t"), col("h")).as("hi"),
        WeatherFunctions.dewPoint(col("t"), col("h")).as("dp"))
      .collect()
    got.foreach { r =>
      val (t, h) = (r.getDouble(0), r.getDouble(1))
      assert(r.getDouble(2) === PyOracle.heatIndex(t, h), s"heatIndex t=$t h=$h")
      assert(r.getDouble(3) === PyOracle.dewPoint(t, h), s"dewPoint t=$t h=$h")
    }
  }
}
