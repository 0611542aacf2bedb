package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: textbook bit-interleave. */
  private def morton(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the reference interleave on a value grid") {
    val pairs = for (a <- 0L to 40L by 3; b <- 0L to 250L by 17) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) === morton(a, b, 8), s"mismatch at ($a,$b)")
    }
  }

  test("zValue is monotone in each argument within fixed other-arg") {
    // Not globally monotone (that's the point of interleaving) but for a
    // fixed b, increasing a must never decrease z's a-bits extraction;
    // spot-check full ordering along an axis.
    val rows = (0L until 64L).map(a => (a, 5L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 8).as("z"))
      .collect().map(_.getLong(0))
    assert(rows.toSeq === rows.sorted.toSeq)
  }

  test("zValueSql text evaluates identically to the Column form in Spark") {
    val df = Seq((13L, 200L), (0L, 255L), (31L, 0L)).toDF("a", "b")
    val viaCol = df.select(Layout.zValue(col("a"), col("b"), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val viaSql = df.selectExpr(s"(${Layout.zValueSql("a", "b", 8)}) AS z")
      .collect().map(_.getLong(0)).toSeq
    assert(viaCol === viaSql)
  }

  test("zClusterStats buckets partition the rows and bound the z ranges") {
    val df = (0L until 1000L).map(i => (i % 25, (i * 7) % 256)).toDF("a", "b")
    val stats = Layout.zClusterStats(df, "a", "b", bits = 8, logBuckets = 4)
      .collect()
    assert(stats.map(_.getAs[Long]("n")).sum === 1000L)
    stats.foreach { r =>
      val bucket = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("z_min") >> 12 === bucket)
      assert(r.getAs[Long]("z_max") >> 12 === bucket)
      assert(r.getAs[Long]("z_min") <= r.getAs[Long]("z_max"))
    }
  }

  test("z-sorted layout keeps both dimension spans locally tight") {
    // 2^16 z-space over 8-bit dims, 16 buckets: the top 4 z-bits are
    // (b7, a7, b6, a6), so every bucket pins the top TWO bits of BOTH
    // dimensions — each dim's span inside a bucket is at most 63. That
    // bound is exactly the file-skipping guarantee the layout exists for.
    val df = (0L until 4096L).map(i => (i % 256, (i * 31) % 256)).toDF("a", "b")
    val stats = Layout.zClusterStats(df, "a", "b", bits = 8, logBuckets = 4)
      .collect()
    stats.foreach { r =>
      assert(r.getAs[Long]("a_max") - r.getAs[Long]("a_min") <= 63,
        s"bucket ${r.getAs[Long]("bucket")} a-span too wide")
      assert(r.getAs[Long]("b_max") - r.getAs[Long]("b_min") <= 63,
        s"bucket ${r.getAs[Long]("bucket")} b-span too wide")
    }
  }

  test("bits/logBuckets bounds are enforced") {
    val df = Seq((1L, 1L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Layout.zValue(col("a"), col("b"), 0)
    }
    intercept[IllegalArgumentException] {
      Layout.zClusterStats(df, "a", "b", bits = 8, logBuckets = 17)
    }
  }

  test("shuffleShard equals the naive global-window permutation") {
    val docs = (1L to 500L).toDF("id")
    val got = Layout.shuffleShard(docs, "id", nShards = 4)
      .select("id", "__shard", "__seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // reference: single-partition row_number over the same hashes
    val h = docs
      .withColumn("__shard", pmod(graft.operators.TextDedup.md5Hash60(
        concat(lit("shard-v1:"), col("id").cast("string"))), lit(4)))
      .withColumn("__ord", graft.operators.TextDedup.md5Hash60(
        concat(lit("ord-v1:"), col("id").cast("string"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__shard")).orderBy(col("__ord"), col("id"))
    val want = h.withColumn("__seq", row_number().over(w).cast("long"))
      .select("id", "__shard", "__seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("shuffleShard is partitioning-invariant and covers 1..n per shard") {
    val docs = (1L to 300L).toDF("id")
    val a = Layout.shuffleShard(docs.repartition(7), "id", 3)
      .select("id", "__seq").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Layout.shuffleShard(docs.coalesce(1), "id", 3)
      .select("id", "__seq").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b, "permutation must not depend on input partitioning")
    val perShard = Layout.shuffleShard(docs, "id", 3)
      .groupBy("__shard").agg(count(lit(1)).as("n"), max("__seq").as("mx"),
        min("__seq").as("mn")).collect()
    perShard.foreach { r =>
      assert(r.getLong(3) === 1L && r.getLong(2) === r.getLong(1),
        "__seq must be a dense 1..n within each shard")
    }
  }

  // ----- encodingProfile -------------------------------------------------

  private def profile(values: Seq[Long]) = {
    val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("ord", "v")
    val r = Layout.encodingProfile(df, Seq("ord"), "v").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
  }

  private def bruteProfile(values: Seq[Long]) = {
    val runs = if (values.isEmpty) 0L
      else 1L + values.sliding(2).count(p => p.length == 2 && p(0) != p(1))
    val small = values.sliding(2)
      .count(p => p.length == 2 && math.abs(p(1) - p(0)) <= 127).toLong
    (values.size.toLong, runs, values.distinct.size.toLong, small)
  }

  test("encodingProfile: recommendations hit their closed-form triggers") {
    // constant column -> 1 run -> rle
    assert(profile(Seq.fill(100)(7L))._5 === "rle")
    // strictly ascending by 1 -> all deltas tiny -> delta
    assert(profile((0L until 100L).toSeq)._5 === "delta")
    // few distinct scattered with huge jumps -> dict
    val dict = (0 until 100).map(i => (i % 3) * 100000L)
    assert(profile(dict)._5 === "dict")
    // unique values with huge jumps -> plain
    val plain = (0 until 100).map(i => i.toLong * 100000L)
    assert(profile(plain)._5 === "plain")
  }

  test("encodingProfile: chunked counts equal a sequential replay") {
    val rnd = new scala.util.Random(97)
    for (trial <- 0 until 4) {
      val values = Seq.fill(400) {
        if (rnd.nextBoolean()) rnd.nextInt(3).toLong // runs + small deltas
        else rnd.nextInt(1000000).toLong // jumps
      }
      val (n, runs, dist, small, _) = profile(values)
      val (wn, wruns, wdist, wsmall) = bruteProfile(values)
      assert((n, runs, dist, small) === ((wn, wruns, wdist, wsmall)),
        s"trial $trial")
    }
  }

  test("encodingProfile: boundary runs merge across range chunks") {
    // one long constant run: chunking must not inflate the run count
    val (_, runs, _, _, enc) = profile(Seq.fill(5000)(42L))
    assert(runs === 1L && enc === "rle")
  }
}
