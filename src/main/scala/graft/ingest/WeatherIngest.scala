package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.WeatherModel

/** Ingest stage: nested OpenWeatherMap documents → flat analytical rows.
  *
  * Replaces the reference's per-region dict construction
  * (daily_weather_etl_kenya.py:160-190) with one declarative projection.
  * Column pruning means a scan under this projection reads only the struct
  * leaves actually referenced — the Spark analogue of the reference reading
  * only the JSON paths it needs.
  */
object WeatherIngest {

  /** Read canned OWM response documents (JSON lines) with the explicit
    * nested schema — no inference, so a malformed field becomes a null
    * (handled by [[errorColumn]]) instead of a schema surprise.
    */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(WeatherModel.owmSchema).json(path)

  /** Required-path validation (C1): the reference catches `KeyError` per
    * region and drops that region while the pipeline continues
    * (py:196-198). Spark-side: a diagnostic column naming the first missing
    * required path, null when the document is whole. Callers split on it —
    * bad rows go to a side output, never fail the job.
    */
  def errorColumn: Column = {
    val checks: Seq[(Column, String)] = Seq(
      col("main").isNull -> "main",
      col("main.temp").isNull -> "main.temp",
      col("main.feels_like").isNull -> "main.feels_like",
      col("main.temp_min").isNull -> "main.temp_min",
      col("main.temp_max").isNull -> "main.temp_max",
      col("main.pressure").isNull -> "main.pressure",
      col("main.humidity").isNull -> "main.humidity",
      col("wind").isNull -> "wind",
      col("clouds.all").isNull -> "clouds.all",
      (size(coalesce(col("weather"), array())) < 1) -> "weather[0]",
      col("sys.sunrise").isNull -> "sys.sunrise",
      col("sys.sunset").isNull -> "sys.sunset",
      col("dt").isNull -> "dt")
    checks.foldRight(lit(null).cast("string")) { case ((pred, path), rest) =>
      when(pred, lit(s"missing $path")).otherwise(rest)
    }
  }

  /** Typed variant of [[flatten]]: `Dataset[WeatherRecord]` for callers
    * that want compile-time field checks. Requires every region to
    * resolve in the dim (non-null coordinates) — unknown regions belong
    * on the untyped path with [[errorColumn]]-style handling.
    */
  def flattenTyped(
      raw: DataFrame,
      regionDim: DataFrame,
      extractionTime: Column = current_timestamp())
      : Dataset[WeatherModel.WeatherRecord] = {
    val spark = raw.sparkSession
    import spark.implicits._
    flatten(raw, regionDim, extractionTime)
      .filter(col("latitude").isNotNull)
      .as[WeatherModel.WeatherRecord]
  }

  /** S3-S6: flatten one document row into the canonical flat record.
    *
    * - struct-path projection incl. array head `weather[0]` (py:164-175)
    * - optional fields stay null (visibility / wind.speed / wind.deg,
    *   py:170-172); absent `rain` subtree defaults to 0 (py:183-188)
    * - epoch seconds → timestamp for sunrise/sunset/dt (py:176-178),
    *   UTC semantics (SURVEY.md §7.4)
    * - `extraction_timestamp` is the ingest clock (py:179); injectable for
    *   deterministic tests, defaults to `current_timestamp()`
    * - lat/lon enrichment via a BROADCAST join against the 15-row region
    *   dim (py:162-163): map-side, no shuffle of the fact side at any scale.
    *
    * Rows with missing required paths are dropped here (the reference drops
    * the whole region, py:196-198); use [[errorColumn]] before calling to
    * collect them instead.
    */
  def flatten(
      raw: DataFrame,
      regionDim: DataFrame,
      extractionTime: Column = current_timestamp()): DataFrame = {
    raw
      .filter(errorColumn.isNull)
      .join(broadcast(regionDim), Seq("region"), "left")
      .select(
        col("region"),
        col("latitude"),
        col("longitude"),
        col("main.temp").as("temperature"),
        col("main.feels_like").as("feels_like"),
        col("main.temp_min").as("temp_min"),
        col("main.temp_max").as("temp_max"),
        col("main.pressure").cast("int").as("pressure"),
        col("main.humidity").cast("int").as("humidity"),
        col("visibility").cast("int").as("visibility"),
        col("wind.speed").as("wind_speed"),
        col("wind.deg").cast("int").as("wind_direction"),
        col("clouds.all").cast("int").as("cloudiness"),
        element_at(col("weather"), 1).getField("main").as("weather_main"),
        element_at(col("weather"), 1).getField("description")
          .as("weather_description"),
        timestamp_seconds(col("sys.sunrise")).as("sunrise"),
        timestamp_seconds(col("sys.sunset")).as("sunset"),
        timestamp_seconds(col("dt")).as("data_timestamp"),
        extractionTime.as("extraction_timestamp"),
        coalesce(col("rain.`1h`"), lit(0.0)).as("rainfall_1h"),
        coalesce(col("rain.`3h`"), lit(0.0)).as("rainfall_3h"))
  }
}
