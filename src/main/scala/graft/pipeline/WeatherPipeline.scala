package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.WeatherIngest
import graft.model.WeatherModel
import graft.operators.WeatherTransform
import graft.quality.QualityChecks
import graft.sources.WeatherSink

/** The whole daily pipeline (reference DAG create→extract→transform→load→
  * quality_check, daily_weather_etl_kenya.py:542-573) as one sequential
  * driver program over lazy DataFrames.
  *
  * The reference crosses a process boundary at every task hop (XCom
  * serialization, py:209/291/397) and a network boundary at API and DB.
  * Here the stages are pure `DataFrame => DataFrame` functions composed
  * lazily; the only materialization points are the sink write and the
  * quality-check collect — Catalyst sees the whole dataflow and fuses it
  * (SURVEY.md §3.1).
  */
object WeatherPipeline {

  final case class Result(loadedPath: String, quality: QualityChecks.Report)

  /** Run extract(from canned documents)→transform→load(upsert)→quality.
    *
    * @param documentsPath JSON-lines of OWM documents (the engine's source
    *                      boundary; live HTTP fetch is a driver concern,
    *                      out of engine scope — SURVEY.md S1)
    * @param tablePath     sink parquet table (date-partitioned)
    * @param checkDate     quality-check date (reference uses "today", py:480)
    */
  def run(spark: SparkSession, documentsPath: String, tablePath: String,
      checkDate: Column, extractionTime: Column = current_timestamp()): Result = {
    val raw = WeatherIngest.readDocuments(spark, documentsPath)
    val flat = WeatherIngest.flatten(raw, WeatherModel.regionDim(spark),
      extractionTime)
    // cache across the two C2 guards and the sink write — without it the
    // source scan + flatten re-execute three times
    flat.persist()
    try {
      require(flat.head(1).nonEmpty,
        "No weather data was successfully extracted")
      val transformed = WeatherTransform.transform(flat)
      require(transformed.head(1).nonEmpty,
        "No data received from extraction task")
      WeatherSink.upsertInto(spark, transformed, tablePath)
    } finally flat.unpersist()
    val table = spark.read.parquet(tablePath)
    val report = QualityChecks.report(table, checkDate)
    report.warnings.foreach(w => System.err.println(s"[quality] WARN: $w"))
    Result(tablePath, report)
  }

  /** Pure (no sink) variant: documents DataFrame in, analytical table out.
    * This is the composition the oracle queries exercise.
    */
  def transformOnly(raw: DataFrame, spark: SparkSession,
      extractionTime: Column = current_timestamp()): DataFrame =
    WeatherTransform.transform(
      WeatherIngest.flatten(raw, WeatherModel.regionDim(spark), extractionTime))
}
