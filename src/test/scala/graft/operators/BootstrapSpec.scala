package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double, Long)], reps: Int = 32) =
    Bootstrap.poissonBootstrapCI(
        rows.toDF("g", "v", "id"), "g", "v", "id", replicas = reps)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  test("constant column: every replica mean is the constant, band collapses") {
    val rows = (1 to 200).map(i => ("a", 12.34, i.toLong))
    val (n, mean, lo, hi) = run(rows)("a")
    assert(n === 200L && mean === 12.34 && lo === 12.34 && hi === 12.34)
  }

  test("band brackets the point mean and is ordered") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 500).map(i =>
      ("a", (rnd.nextInt(10000) + 1) / 100.0, i.toLong))
    val (_, mean, lo, hi) = run(rows)("a")
    assert(lo <= hi)
    assert(lo <= mean && mean <= hi,
      s"94% band [$lo, $hi] should bracket the mean $mean here")
  }

  test("weights follow Poisson(1): empirical frequencies near e^-1 etc.") {
    // re-derive the weights exactly as the operator does and check the
    // distribution over many draws
    val df = spark.range(0, 20000).select(col("id"))
    val u = TextDedup.md5Hash60(concat_ws(":", lit("bs-42"), col("id"),
        lit(0))).cast("double") /
      lit(1152921504606846976L).cast("double")
    val w = Bootstrap.poisson1Cdf.zipWithIndex
      .foldRight(lit(Bootstrap.poisson1Cdf.size.toLong)) {
        case ((t, k), rest) => when(u < t, k.toLong).otherwise(rest)
      }
    val counts = df.select(w.as("w")).groupBy("w").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val p0 = counts(0L).toDouble / 20000
    val p1 = counts(1L).toDouble / 20000
    assert(math.abs(p0 - 0.3679) < 0.02, s"P(w=0) = $p0")
    assert(math.abs(p1 - 0.3679) < 0.02, s"P(w=1) = $p1")
    assert(!counts.contains(8L), "weights are truncated at 7")
  }

  test("deterministic: identical output across runs and partitionings") {
    val rows = (1 to 300).map(i => ("g" + (i % 2), i / 7.0, i.toLong))
    val a = run(rows)
    val b = Bootstrap.poissonBootstrapCI(
        rows.toDF("g", "v", "id").repartition(13), "g", "v", "id")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(a === b)
  }

  test("xxhash64 fast path: valid ordered band, deterministic, distinct draws") {
    val rows = (1 to 400).map(i => ("a", (i % 50) / 2.0, i.toLong))
    def fast() = Bootstrap.poissonBootstrapCI(
        rows.toDF("g", "v", "id"), "g", "v", "id", portableHash = false)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).head
    val (n, mean, lo, hi) = fast()
    assert(n === 400L && lo <= mean && mean <= hi)
    assert(fast() === ((n, mean, lo, hi)), "fast path must be deterministic")
    val slow = Bootstrap.poissonBootstrapCI(
        rows.toDF("g", "v", "id"), "g", "v", "id", portableHash = true)
      .collect().map(r => (r.getDouble(3), r.getDouble(4))).head
    assert(slow._1 <= mean && mean <= slow._2,
      "both hash families must produce bracketing bands here")
  }

  test("groups are independent and all present") {
    val rows = (1 to 100).map(i => ("x", 1.0, i.toLong)) ++
      (1 to 100).map(i => ("y", 100.0, 1000L + i))
    val m = run(rows)
    assert(m.keySet === Set("x", "y"))
    assert(m("x")._2 === 1.0 && m("y")._2 === 100.0)
  }
}
