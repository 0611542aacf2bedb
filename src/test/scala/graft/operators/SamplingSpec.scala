package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  test("weightedMix: weight 0 drops, weight 1 keeps, rates track weights") {
    import spark.implicits._
    val df = (0L until 2000L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    val kept = Sampling.weightedMix(df, "id", "src",
        Map("s0" -> 1.0, "s1" -> 0.0, "s2" -> 0.5), seed = 7L,
        defaultWeight = 0.25)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("s0") === 500L) // weight 1: every row
    assert(!kept.contains("s1")) // weight 0: none
    assert(kept("s2") > 180L && kept("s2") < 320L) // ~250
    assert(kept("s3") > 70L && kept("s3") < 180L) // ~125 via default
    // determinism: the same seed reproduces the identical kept set
    val a = Sampling.weightedMix(df, "id", "src", Map("s2" -> 0.5), 7L)
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.weightedMix(df, "id", "src", Map("s2" -> 0.5), 7L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
  }

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("hashSplit is deterministic, disjoint, and near the target ratios") {
    val s1 = Sampling.hashSplit(docs, "doc_id", 80, 10)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = Sampling.hashSplit(docs, "doc_id", 80, 10)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 === s2) // stable across runs
    assert(s1.values.sum === 500)
    assert(s1("train") > 350 && s1("train") < 450) // ~80% of 500
    assert(s1.getOrElse("val", 0L) + s1.getOrElse("test", 0L) === 500 - s1("train"))
  }

  test("hashSplit assignment is a pure function of the id") {
    val a = Sampling.hashSplit(docs, "doc_id", 50, 25)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // same ids through a differently-partitioned frame -> same assignment
    val b = Sampling.hashSplit(docs.repartition(17), "doc_id", 50, 25)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }

  test("stratifiedSample downsamples only the listed strata") {
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = Sampling.stratifiedSample(docs, "lang", "doc_id",
        Map("en" -> 10.0))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("en") < before("en") / 4) // ~10% kept
    (before.keySet - "en").foreach(l => assert(after(l) === before(l)))
  }

  test("hashSample rate is approximately honored") {
    val n = Sampling.hashSample(docs, "doc_id", 20.0).count()
    assert(n > 50 && n < 150) // ~100 of 500
  }

  test("stratumTopK keeps exactly k per stratum (or all when smaller)") {
    val sizes = Sampling.stratumTopK(docs, "source", "doc_id", k = 20)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (src, n) => assert(sizes(src) === math.min(n, 20L)) }
  }

  test("stratumTopK is partition-independent and ranks are 1..k") {
    val a = Sampling.stratumTopK(docs, "source", "doc_id", 5, seed = 9L)
      .select("source", "sample_rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = Sampling.stratumTopK(docs.repartition(17), "source", "doc_id", 5, seed = 9L)
      .select("source", "sample_rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a === b)
    a.keys.groupBy(_._1).foreach { case (_, ks) =>
      assert(ks.map(_._2).toSeq.sorted === (1L to 5L)) }
  }

  test("stratumTopK different seeds draw different samples") {
    val a = Sampling.stratumTopK(docs, "source", "doc_id", 20, seed = 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratumTopK(docs, "source", "doc_id", 20, seed = 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a !== b)
  }
}
