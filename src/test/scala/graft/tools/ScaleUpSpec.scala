package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the scale-up embedding reflection's statistical contract: the
  * per-replica diag(±1) sign patterns must be pairwise DISTINCT and
  * roughly balanced, so replicated vectors never coincide verbatim and
  * cross-replica ANN/near-dup structure grows linearly with the factor
  * (the property the sf1/sf10 scale sweeps rely on). Regression for the
  * r8 advisor finding: a `(x*odd) % 2` mix collapses to parity of
  * (replica + dim) — two patterns total — and every odd replica got a
  * bit-identical copy of the corpus.
  */
class ScaleUpSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val reps = 16

  /** Sign pattern (+1/-1 per dim) for each replica, via the real column. */
  private lazy val patterns: Map[Int, Seq[Int]] = {
    val ones = Seq.fill(dim)(1.0f)
    val df = (0 until reps).map(r => (r, ones)).toDF("__r", "embedding")
    df.select(col("__r"),
        ScaleUp.reflectedEmbedding(col("embedding"), col("__r")).as("p"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toInt).toSeq)
      .toMap
  }

  test("sign patterns are pairwise distinct across replicas") {
    val ps = patterns.values.toSeq
    assert(ps.distinct.size === reps,
      s"only ${ps.distinct.size} distinct flip patterns for $reps replicas")
  }

  test("each replica flips a non-trivial, non-total share of dims") {
    for ((r, p) <- patterns) {
      val flips = p.count(_ == -1)
      assert(flips > dim / 8 && flips < dim * 7 / 8,
        s"replica $r flips $flips of $dim dims — degenerate pattern")
    }
  }

  test("reflection is orthogonal: norms and within-replica dots unchanged") {
    val a = Array.tabulate(dim)(i => 0.1f * i - 2.0f)
    val b = Array.tabulate(dim)(i => math.sin(i.toDouble).toFloat)
    val df = Seq((3, a.toSeq, b.toSeq)).toDF("__r", "a", "b")
    val out = df.select(
        ScaleUp.reflectedEmbedding(col("a"), col("__r")).as("ra"),
        ScaleUp.reflectedEmbedding(col("b"), col("__r")).as("rb"))
      .collect().head
    val ra = out.getSeq[Float](0)
    val rb = out.getSeq[Float](1)
    def dot(x: Seq[Float], y: Seq[Float]) =
      x.zip(y).map { case (u, v) => u.toDouble * v }.sum
    assert(math.abs(dot(ra, ra) - dot(a.toSeq, a.toSeq)) < 1e-4)
    assert(math.abs(dot(ra, rb) - dot(a.toSeq, b.toSeq)) < 1e-4)
  }
}
