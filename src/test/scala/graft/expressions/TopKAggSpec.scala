package graft.expressions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[TopKAgg]]/[[Similarity.topKReduce]] — the native heap top-k
  * reduction — bit-identical to the rank-window formulation it
  * replaced in bruteForceTopK/bm25TopK (r11: the window sorted the
  * full scored pair stream and disk-spilled at sf10r pair volumes).
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("score").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("key"), col("id"), col("rank"), col("score"))
  }

  test("topKReduce equals the rank window on adversarial data") {
    // deterministic pseudo-random scores with DENSE TIES (score % 7)
    // so the id tie-break is actually exercised; group sizes straddle
    // k (some groups have fewer than k rows)
    val rows = (1 to 5000).map { i =>
      val key = i % 13L
      val id = i.toLong
      val score = (i * 2654435761L) % 7L
      (key, id, score)
    }
    val df = rows.toDF("key", "id", "score")
    val viaAgg = Similarity.topKReduce(df, "key", "id", "score", 4)
      .select(col("key"), col("id"), col("rank").cast("int").as("rank"),
        col("score"))
    val viaWin = windowTopK(df, 4)
    assert(viaAgg.exceptAll(viaWin).isEmpty && viaWin.exceptAll(viaAgg).isEmpty,
      "heap top-k diverged from the rank window")
    // small groups: k larger than any group size
    val viaAgg9 = Similarity.topKReduce(df.filter(col("id") <= 20), "key",
      "id", "score", 9)
      .select(col("key"), col("id"), col("rank").cast("int").as("rank"),
        col("score"))
    val viaWin9 = windowTopK(df.filter(col("id") <= 20), 9)
    assert(viaAgg9.exceptAll(viaWin9).isEmpty &&
      viaWin9.exceptAll(viaAgg9).isEmpty)
  }

  test("state merge keeps exactly the k best across partial buffers") {
    val s1 = new TopKState(3)
    Seq((5L, 10L), (5L, 2L), (1L, 1L)).foreach { case (s, i) => s1.update(s, i) }
    val s2 = new TopKState(3)
    Seq((7L, 9L), (5L, 1L), (0L, 0L)).foreach { case (s, i) => s2.update(s, i) }
    s1.merge(s2)
    // best: (7,9), then score-5 ties by id asc: (5,1), (5,2)
    assert(s1.sorted.map(e => (e(0), e(1))).toSeq ==
      Seq((7L, 9L), (5L, 1L), (5L, 2L)))
    val rt = TopKState.deserialize(s1.serialize)
    assert(rt.sorted.map(e => (e(0), e(1))).toSeq ==
      s1.sorted.map(e => (e(0), e(1))).toSeq)
  }

  test("negative scores and singleton groups") {
    val df = Seq((1L, 1L, -5L), (1L, 2L, -3L), (2L, 7L, Long.MinValue + 1))
      .toDF("key", "id", "score")
    val got = Similarity.topKReduce(df, "key", "id", "score", 1)
      .orderBy("key").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L), (2L, 7L)))
  }

  test("fallback threshold derives from the LARGEST k the session has seen") {
    // r12 review: an early small-k raise must not leave a later
    // large-k aggregate with an unbounded state budget — the bound is
    // 4Mi/maxK, re-tightened downward when a bigger k arrives (and
    // never below the session's pre-raise value).
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val df = Seq((1L, 1L, 1L)).toDF("key", "id", "score")
    Similarity.topKReduce(df, "key", "id", "score", 4) // small k
    val afterSmall = spark.conf.get(key).toLong
    // session max k so far is small (suite ks ≤ 9), so a real raise is
    // in effect; exact value depends on suite-order history
    assert(afterSmall > 128L, s"small k must raise, got $afterSmall")
    Similarity.topKReduce(df, "key", "id", "score", 1 << 16) // huge k
    val afterBig = spark.conf.get(key).toLong
    // 4Mi / 65536 = 64, floored at the session's pre-raise value (128)
    assert(afterBig === 128L,
      s"big k must re-tighten the threshold, got $afterBig")
    // a later small-k call must NOT loosen it again (maxK is sticky)
    Similarity.topKReduce(df, "key", "id", "score", 4)
    assert(spark.conf.get(key).toLong === 128L)
  }
}
