package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact mode: bounds pin the true count when items fit the map") {
    val df = (0 until 2000).map(i => (i % 10).toLong).toDF("v")
    val sk = df.agg(Sketches.freqSketch(col("v"), 64).as("sk"))
    val out = sk.select(
      Sketches.freqLowerBound(col("sk"), lit(3L)).as("lb"),
      Sketches.freqUpperBound(col("sk"), lit(3L)).as("ub")).head()
    assert(out.getLong(0) === 200L && out.getLong(1) === 200L)
  }

  test("guarantee holds under genuine eviction pressure") {
    // heavy item 0 appears 500x among 5000 distinct light items; map of
    // 64 slots cannot hold them all -> approximation with bounds
    val rows = (Seq.fill(500)(0L) ++ (1L to 5000L)).toDF("v")
    val sk = rows.agg(Sketches.freqSketch(col("v"), 64).as("sk"))
    val out = sk.select(
      Sketches.freqLowerBound(col("sk"), lit(0L)).as("lb"),
      Sketches.freqUpperBound(col("sk"), lit(0L)).as("ub")).head()
    assert(out.getLong(0) <= 500L && out.getLong(1) >= 500L)
    assert(out.getLong(1) - out.getLong(0) > 0L,
      "5500 updates into 64 slots must be in estimation mode")
  }

  test("partition merge counts, not samples: totals are preserved in exact mode") {
    val df = spark.range(0, 3200, 1, 32).select((col("id") % 4).as("v"))
    val sk = df.agg(Sketches.freqSketch(col("v"), 64).as("sk"))
    (0L until 4L).foreach { item =>
      val r = sk.select(
        Sketches.freqLowerBound(col("sk"), lit(item)),
        Sketches.freqUpperBound(col("sk"), lit(item))).head()
      assert(r.getLong(0) === 800L && r.getLong(1) === 800L, s"item $item")
    }
  }

  test("store merge: union of per-group sketches equals a global sketch") {
    val df = (0 until 900).map(i => (i % 3, (i % 9).toLong)).toDF("g", "v")
    val merged = df.groupBy("g")
      .agg(Sketches.freqSketch(col("v"), 64).as("sk"))
      .agg(Sketches.freqMerge(col("sk"), 64).as("sk"))
    val r = merged.select(
      Sketches.freqLowerBound(col("sk"), lit(5L)),
      Sketches.freqUpperBound(col("sk"), lit(5L))).head()
    assert(r.getLong(0) === 100L && r.getLong(1) === 100L)
  }

  test("GraftExtensions registers the freq family with working builders") {
    val fns = new graft.expressions.GraftExtensions().functions
      .filter(_._1.startsWith("freq_")).map(f => f._1 -> f._3).toMap
    assert(fns.keySet === Set("freq_sketch_agg", "freq_merge_agg",
      "freq_lower_bound", "freq_upper_bound"))
  }
}
