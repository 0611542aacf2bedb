package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Canonical schemas and static dimensions for the weather engine.
  *
  * Source document shape mirrors exactly the JSON paths the reference
  * extract stage reads (daily_weather_etl_kenya.py:160-188); the flat
  * sink schema mirrors its DDL (daily_weather_etl_kenya.py:78-113).
  * Timestamps use UTC semantics throughout (SURVEY.md §7.4).
  */
object WeatherModel {

  /** Nested OpenWeatherMap current-weather document, one per region per
    * extraction. `region` is injected by the fetcher (the reference builds
    * rows inside its per-region loop, py:160-163). All leaf fields nullable:
    * required-path absence is detected downstream (C1 error isolation)
    * rather than at parse time, so one bad document never fails a scan.
    */
  val owmSchema: StructType = StructType(Seq(
    StructField("region", StringType, nullable = false),
    StructField("dt", LongType),
    StructField("visibility", LongType),
    StructField("main", StructType(Seq(
      StructField("temp", DoubleType),
      StructField("feels_like", DoubleType),
      StructField("temp_min", DoubleType),
      StructField("temp_max", DoubleType),
      StructField("pressure", LongType),
      StructField("humidity", LongType)))),
    StructField("wind", StructType(Seq(
      StructField("speed", DoubleType),
      StructField("deg", LongType)))),
    StructField("clouds", StructType(Seq(
      StructField("all", LongType)))),
    StructField("weather", ArrayType(StructType(Seq(
      StructField("main", StringType),
      StructField("description", StringType))))),
    StructField("rain", StructType(Seq(
      StructField("1h", DoubleType),
      StructField("3h", DoubleType)))),
    StructField("sys", StructType(Seq(
      StructField("sunrise", LongType),
      StructField("sunset", LongType))))))

  /** Flat record produced by ingest + transform — the analytical table
    * (reference sink DDL py:79-113 minus DB-generated `id`/`created_at`).
    */
  final case class WeatherRecord(
      region: String,
      latitude: Double,
      longitude: Double,
      temperature: Double,
      feels_like: Double,
      temp_min: Double,
      temp_max: Double,
      pressure: Option[Int],
      humidity: Option[Int],
      visibility: Option[Int],
      wind_speed: Option[Double],
      wind_direction: Option[Int],
      cloudiness: Option[Int],
      weather_main: String,
      weather_description: String,
      sunrise: java.sql.Timestamp,
      sunset: java.sql.Timestamp,
      data_timestamp: java.sql.Timestamp,
      extraction_timestamp: java.sql.Timestamp,
      rainfall_1h: Double,
      rainfall_3h: Double)

  /** The 15 agricultural regions with coordinates, verbatim from the
    * reference's literal map (daily_weather_etl_kenya.py:27-43). The code's
    * 15-region list is authoritative over the README's 17 (SURVEY.md §1.4).
    */
  val regions: Seq[(String, Double, Double)] = Seq(
    ("Nakuru", -0.3031, 36.0800),
    ("Meru", 0.0467, 37.6500),
    ("Eldoret", 0.5143, 35.2698),
    ("Kitale", 1.0154, 35.0062),
    ("Kericho", -0.3676, 35.2866),
    ("Nyeri", -0.4167, 36.9500),
    ("Embu", -0.5308, 37.4500),
    ("Machakos", -1.5177, 37.2634),
    ("Thika", -1.0332, 37.0692),
    ("Mombasa", -4.0435, 39.6682),
    ("Kisumu", -0.1022, 34.7617),
    ("Narok", -1.0833, 35.8667),
    ("Bungoma", 0.5692, 34.5606),
    ("Kakamega", 0.2827, 34.7519),
    ("Bomet", -0.7833, 35.3333))

  /** Region dimension as a DataFrame. Tiny (15 rows) — always broadcast
    * when joined (S2): at 100 TB of fact data this stays a map-side join
    * with zero shuffle of the fact side.
    */
  def regionDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    regions.toDF("region", "latitude", "longitude")
  }
}
