package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.Fixtures
import graft.model.WeatherModel
import graft.operators.WeatherTransform
import graft.quality.QualityChecks
import graft.sources.WeatherSink

class WeatherPipelineSpec extends SparkSpec {

  private def transformed(docs: String*) = {
    val raw = Fixtures.df(spark, docs: _*)
    WeatherTransform.transform(
      graft.ingest.WeatherIngest.flatten(raw, WeatherModel.regionDim(spark),
        extractionTime = to_timestamp(lit("2023-11-15 06:00:00"))))
  }

  test("transform drops out-of-range temperature rows (T2) and derives all columns") {
    val got = transformed(Fixtures.full, Fixtures.hotOutlier)
    val rows = got.collect()
    assert(rows.map(_.getAs[String]("region")).toSeq === Seq("Nakuru"))
    val r = rows(0)
    assert(r.getAs[Double]("heat_index") === 22.5) // temp < 27 -> passthrough
    assert(r.getAs[Boolean]("is_favorable_temp"))
    assert(!r.getAs[Boolean]("is_high_humidity"))
    assert(r.getAs[String]("rainfall_category") === "Light Rain")
    assert(r.getAs[Int]("hour") === 22) // 1700000000 = 2023-11-14T22:13:20Z
    assert(r.getAs[Int]("year") === 2023)
    assert(r.getAs[java.sql.Date]("date").toString === "2023-11-14")
  }

  test("duplicate (region, data_timestamp) keeps one row (T1)") {
    val got = transformed(Fixtures.full, Fixtures.full)
    assert(got.count() === 1)
  }

  test("sink upsert: re-extraction with changed values replaces the row (S8)") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/weather"
    val day1 = transformed(Fixtures.full)
    WeatherSink.upsertInto(spark, day1, dir)
    // same natural key, newer extraction, different temperature
    val changed = Fixtures.full.replace("\"temp\":22.5", "\"temp\":25.0")
    val day2raw = Fixtures.df(spark, changed)
    val day2 = WeatherTransform.transform(
      graft.ingest.WeatherIngest.flatten(day2raw, WeatherModel.regionDim(spark),
        extractionTime = to_timestamp(lit("2023-11-16 06:00:00"))))
    WeatherSink.upsertInto(spark, day2, dir)
    val table = spark.read.parquet(dir)
    assert(table.count() === 1)
    assert(table.select("temperature").collect()(0).getDouble(0) === 25.0)
  }

  test("upsertPartitions touches only the incoming batch's partitions") {
    val dir = Files.createTempDirectory("graft_dynpart").toString + "/t"
    val day1 = transformed(Fixtures.full)        // date 2023-11-14
    val day2raw = Fixtures.df(spark,
      Fixtures.full.replace("1700000000", "1700090000")) // next day
    val day2 = WeatherTransform.transform(
      graft.ingest.WeatherIngest.flatten(day2raw, WeatherModel.regionDim(spark),
        extractionTime = to_timestamp(lit("2023-11-15 06:00:00"))))
    WeatherSink.write(day1.unionByName(day2), dir)
    def filesOf(datePart: String) = {
      val d = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(d).filter(_.toString.contains(datePart))
        .filter(_.toString.endsWith(".parquet"))
        .map[(String, java.nio.file.attribute.FileTime)](p =>
          (p.toString, java.nio.file.Files.getLastModifiedTime(p)))
        .toArray.toSeq
    }
    val day1FilesBefore = filesOf("date=2023-11-14")
    assert(day1FilesBefore.nonEmpty)
    // incoming touches ONLY day 2 with a changed temperature
    val day2v2raw = Fixtures.df(spark, Fixtures.full
      .replace("1700000000", "1700090000").replace("22.5", "30.5"))
    val day2v2 = WeatherTransform.transform(
      graft.ingest.WeatherIngest.flatten(day2v2raw, WeatherModel.regionDim(spark),
        extractionTime = to_timestamp(lit("2023-11-15 07:00:00"))))
    WeatherSink.upsertPartitions(spark, day2v2, dir)
    // day-1 partition untouched (same files, same mtimes); day-2 updated
    assert(filesOf("date=2023-11-14") === day1FilesBefore,
      "untouched partition must not be rewritten")
    val table = spark.read.parquet(dir)
    assert(table.count() === 2)
    val newTemp = table.filter(col("date") === lit("2023-11-15"))
      .select("temperature").collect()(0).getDouble(0)
    assert(newTemp === 30.5)
  }

  test("weather store prunes partitions on date (the reference's index analog)") {
    // py:116-119's b-tree date index maps to partitionBy("date") +
    // partition pruning: a date-filtered read must carry a real
    // PartitionFilter and touch ONLY that date's files — the property
    // that makes the daily 15-row upsert O(day), not O(table), at 100 TB
    val dir = Files.createTempDirectory("graft_prune").toString + "/t"
    val day1 = transformed(Fixtures.full)        // date 2023-11-14
    val day2 = WeatherTransform.transform(
      graft.ingest.WeatherIngest.flatten(
        Fixtures.df(spark, Fixtures.full.replace("1700000000", "1700090000")),
        WeatherModel.regionDim(spark),
        extractionTime = to_timestamp(lit("2023-11-15 06:00:00"))))
    WeatherSink.write(day1.unionByName(day2), dir)
    val filtered = spark.read.parquet(dir)
      .filter(col("date") === lit("2023-11-14"))
    val plan = filtered.queryExecution.executedPlan.toString
    val pf = plan.linesIterator
      .find(_.contains("PartitionFilters:")).getOrElse("")
    assert(pf.contains("date"), s"no partition filter on date:\n$pf")
    assert(!pf.replaceAll("PartitionFilters:\\s*\\[\\s*\\]", "").isEmpty &&
      !pf.matches(".*PartitionFilters:\\s*\\[\\s*\\].*"),
      s"PartitionFilters is empty — scan reads every date:\n$pf")
    // runtime proof (inputFiles lists the PRE-pruning relation): after
    // execution the scan's own metrics must show one file / one
    // partition read, though the store holds two dates
    assert(filtered.collect().length === 1) // collect() runs THIS plan
    val scan = filtered.queryExecution.executedPlan.collectLeaves()
      .find(_.metrics.contains("numFiles")).get
    assert(scan.metrics("numFiles").value === 1L,
      s"pruned scan read ${scan.metrics("numFiles").value} files")
  }

  test("compact rewrites small files without changing the data") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    // 8-way repartition of a tiny table -> many near-empty files
    val df = spark.range(0, 1000)
      .selectExpr("id", "CAST(date_add('2024-01-01', CAST(id % 3 AS INT)) AS DATE) AS date")
      .repartition(8)
    df.write.mode("overwrite").partitionBy("date").parquet(dir)
    def parquetFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val before = parquetFiles
    val beforeRows = spark.read.parquet(dir).orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    WeatherSink.compact(spark, dir) // default 128 MB target -> 1 shuffle partition
    assert(parquetFiles < before,
      s"compaction must reduce file count (before=$before after=$parquetFiles)")
    val afterRows = spark.read.parquet(dir).orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(afterRows === beforeRows)
  }

  test("quality report mirrors the reference's three checks (A1-A3)") {
    val got = transformed(Fixtures.full, Fixtures.missingOptionals)
    val rep = QualityChecks.report(got, lit("2023-11-14").cast("date"))
    assert(rep.regionCount === 2)
    assert(rep.nullCounts.values.sum === 0)
    assert(rep.minTemp.get === 22.5)
    assert(rep.maxTemp.get === 30.0)
    assert(rep.warnings.exists(_.contains("Expected 15 regions, found 2")))
  }

  test("runWithRetry retries the DAG 2x with the 5-min delay, then alerts (C3)") {
    var slept = Vector.empty[Long]
    var alerts = Vector.empty[String]
    // nonexistent documents path -> empty extract -> C2 guard throws on
    // every attempt; the envelope must retry twice and then alert
    val e = intercept[Exception] {
      WeatherPipeline.runWithRetry(spark,
        documentsPath = "/nonexistent/docs.json",
        tablePath = java.nio.file.Files.createTempDirectory("wp").toString,
        checkDate = lit("2023-11-14").cast("date"),
        sleep = d => slept :+= d, alert = m => alerts :+= m)
    }
    assert(slept === Vector(300000L, 300000L), "2 retries, 5 min apart (py:52-53)")
    assert(alerts.size === 1 && alerts.head.contains("after 3 attempts"))
  }
}
