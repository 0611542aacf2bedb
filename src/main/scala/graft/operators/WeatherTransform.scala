package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.WeatherFunctions._

/** The transform stage T1-T9 (daily_weather_etl_kenya.py:286-340) as one
  * lazy select/filter chain.
  *
  * The reference materializes every step eagerly in pandas and pays a
  * Python-interpreted row loop for the two `.apply(axis=1)` scalars
  * (py:315-316). Here the whole stage fuses into a single
  * whole-stage-codegen'd projection over the scan: zero extra passes,
  * zero shuffles except the dedup's keyed exchange.
  */
object WeatherTransform {

  /** T2+T3: validity gates — silently drop out-of-range rows, exactly the
    * reference's boolean-mask filters (py:308-312). Declared before the
    * derived columns so Catalyst pushes them into the scan.
    */
  def validityFilter(df: DataFrame): DataFrame =
    df.filter(col("temperature").between(-5, 50))
      .filter(col("humidity").between(0, 100))

  /** T4-T9: derived metrics + date parts (py:315-325). Pure projection. */
  def derive(df: DataFrame): DataFrame =
    df.withColumn("heat_index", heatIndex(col("temperature"), col("humidity")))
      .withColumn("dew_point", dewPoint(col("temperature"), col("humidity")))
      .withColumn("is_favorable_temp", isFavorableTemp(col("temperature")))
      .withColumn("is_high_humidity", isHighHumidity(col("humidity")))
      .withColumn("rainfall_category", rainfallCategory(col("rainfall_1h")))
      .withColumn("date", to_date(col("data_timestamp")))
      .withColumn("hour", hour(col("data_timestamp")))
      .withColumn("month", month(col("data_timestamp")))
      .withColumn("year", year(col("data_timestamp")))

  /** Full transform: dedup (T1) → validity filters (T2-T3) → derived
    * columns and date parts (T4-T9), in the reference's order (py:302-325).
    */
  def transform(df: DataFrame): DataFrame =
    derive(validityFilter(Dedup.dedupeWeather(df)))
}
