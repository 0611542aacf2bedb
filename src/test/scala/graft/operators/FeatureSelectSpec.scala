package graft.operators

import graft.SparkSpec

class FeatureSelectSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String, String)], k: Int = 3) =
    FeatureSelect.chiSquareTokens(
        docs.toDF("id", "text", "cls"), "id", "text", "cls", k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq

  test("a perfectly class-exclusive token ranks first with max chi2") {
    // "uno" only in class A docs, "common" everywhere
    val docs = Seq(
      (1L, "uno common", "A"), (2L, "uno common", "A"),
      (3L, "common other", "B"), (4L, "common other", "B"))
    val out = run(docs)
    val aTop = out.filter(_._1 == "A").minBy(_._2)
    assert(aTop._3 === "uno")
    // perfect 2x2 split: chi2 = N = 4 -> 4e6 in millionths
    assert(aTop._6 === 4000000L)
  }

  test("a token present in every doc scores zero (degenerate column)") {
    val docs = Seq(
      (1L, "common alpha", "A"), (2L, "common beta", "B"))
    val out = run(docs, k = 5)
    out.filter(_._3 == "common").foreach(r => assert(r._6 === 0L))
  }

  test("presence semantics: repeated tokens in one doc count once") {
    val docs = Seq(
      (1L, "x x x x y", "A"), (2L, "y", "B"))
    val out = run(docs, k = 5)
    val xRow = out.find(r => r._1 == "A" && r._3 == "x").get
    assert(xRow._4 === 1L && xRow._5 === 1L) // df_in_cls = df = 1, not 4
  }

  test("matches a driver-side contingency replay on random corpora") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (0 until 60).map { i =>
      val words = Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, words.mkString(" "), if (rnd.nextBoolean()) "P" else "Q")
    }
    val byCls = docs.groupBy(_._3).map { case (c, d) => c -> d.size.toLong }
    val n = docs.size.toLong
    val presence = docs.flatMap(d => d._2.split(" ").distinct
      .map(t => (t, d._3)))
    val a = presence.groupBy(identity).map { case (k2, v) =>
      k2 -> v.size.toLong }
    val df = presence.map(_._1).groupBy(identity)
      .map { case (t, v) => t -> v.size.toLong }
    def chi(t: String, c: String): Long = {
      val av = a((t, c)); val dfv = df(t); val nc = byCls(c)
      val b = dfv - av; val cc = nc - av; val d = n - dfv - nc + av
      val diff = (av * d - b * cc).toDouble
      val num = n.toDouble * diff * diff
      val den = ((av + b) * (cc + d)).toDouble * ((av + cc) * (b + d)).toDouble
      if (den > 0) math.floor(1000000.0 * num / den).toLong else 0L
    }
    val out = run(docs, k = vocab.size)
    out.foreach { case (c, _, t, dfc, dfAll, fp) =>
      assert(dfc === a((t, c)), s"($t,$c) df_in_cls")
      assert(dfAll === df(t), s"$t df")
      assert(fp === chi(t, c), s"($t,$c) chi2_fp")
    }
    // ranks are dense 1..m per class, ordered by (chi2 desc, token asc)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) === (1L to sorted.size))
      val resorted = rows.sortBy(r => (-r._6, r._3))
      assert(resorted.map(_._3) === sorted.map(_._3))
    }
  }
}
