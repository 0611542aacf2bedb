package graft.operators

import scala.util.Random

import graft.SparkSpec

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  /** Independent driver-side BPE reference: exact greedy left-to-right
    * merge application (the textbook algorithm, no replace-pass
    * approximation) over the word histogram.
    */
  private def refTrain(words: Seq[(String, Long)], k: Int)
      : Seq[(String, String, Long)] = {
    var cur: Seq[(List[String], Long)] =
      words.map { case (w, f) => w.map(_.toString).toList -> f }
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to k) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      cur.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), cnt) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, s"$x $y") }
        out += ((s"$a $b", a + b, cnt))
        def app(l: List[String]): List[String] = l match {
          case x :: y :: rest if x == a && y == b => (a + b) :: app(rest)
          case x :: rest => x :: app(rest)
          case Nil => Nil
        }
        cur = cur.map { case (syms, f) => app(syms) -> f }
      }
    }
    out.result()
  }

  private def corpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = Seq("low", "lower", "lowest", "newer", "newest", "wide",
      "widest", "banana", "bandana", "anananab", "deed", "deeded")
    (1L to nDocs.toLong).map { i =>
      i -> Seq.fill(3 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
  }

  private def wordHist(docs: Seq[(Long, String)]): Seq[(String, Long)] =
    docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }.toSeq

  test("trainMerges equals the exact greedy reference on random corpora") {
    for (seed <- Seq(1, 2, 3)) {
      val docs = corpus(seed, 120)
      val got = BpeTrainer
        .trainMerges(docs.toDF("doc_id", "text"), "text", merges = 8)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1)
      val want = refTrain(wordHist(docs), 8).zipWithIndex
        .map { case ((p, m, c), i) => (i + 1L, p, m, c) }
      assert(got.toSeq === want, s"seed=$seed")
    }
  }

  test("repeating-unit words merge FULLY each round (multi-pass replace)") {
    // "anananab"-style runs are where a single replace pass diverges
    // from greedy BPE: the round-1 winner (a,n) must collapse every
    // alternating site before round 2 counts pairs.
    val docs = Seq((1L, "ananana ananana anananab")).toDF("doc_id", "text")
    val got = BpeTrainer.trainMerges(docs, "text", merges = 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    val want = refTrain(
      Seq("ananana" -> 2L, "anananab" -> 1L), 2)
    assert(got.toSeq === want)
  }

  test("bpeTokenCount matches greedy re-tokenization per document") {
    val docs = corpus(11, 60)
    val df = docs.toDF("doc_id", "text")
    val mergeRows = BpeTrainer.trainMerges(df, "text", merges = 6)
      .collect().map(r => (r.getString(1), r.getString(2)))
    val mergeList = mergeRows.map { case (p, m) =>
      val Array(a, b) = p.split(" ", 2); (a, b)
    }.toSeq
    val got = BpeTrainer.bpeTokenCount(df, "doc_id", "text", mergeList)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: apply the same merges greedily per word
    def applyAll(w: String): Int = {
      var syms = w.map(_.toString).toList
      mergeList.foreach { case (a, b) =>
        def app(l: List[String]): List[String] = l match {
          case x :: y :: rest if x == a && y == b => (a + b) :: app(rest)
          case x :: rest => x :: app(rest)
          case Nil => Nil
        }
        syms = app(syms)
      }
      syms.size
    }
    docs.foreach { case (id, text) =>
      val want = text.split(" ").filter(_.nonEmpty).map(applyAll).sum.toLong
      assert(got(id) === want, s"doc $id")
    }
  }

  test("empty corpus yields an empty merge table") {
    val docs = Seq((1L, "")).toDF("doc_id", "text")
    assert(BpeTrainer.trainMerges(docs, "text", merges = 3).count() === 0L)
  }

  test("trainMergesBatched == trainMerges bit-for-bit (incl. tight batchLimit)") {
    for (seed <- Seq(5, 6, 7)) {
      val df = corpus(seed, 150).toDF("doc_id", "text")
      val seq = BpeTrainer.trainMerges(df, "text", merges = 12)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      // generous page AND a 3-candidate horizon (forces the
      // conservative truncation path every round)
      for (lim <- Seq(256, 3)) {
        val bat = BpeTrainer
          .trainMergesBatched(df, "text", merges = 12, batchLimit = lim)
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
          .sortBy(_._1).toSeq
        assert(bat === seq, s"seed=$seed batchLimit=$lim")
      }
    }
  }

  test("trainMergesBatched matches the exact greedy reference directly") {
    // the repeating-unit stressor plus random corpus, checked against
    // the independent driver reference (not just the sequential engine)
    val rows = corpus(9, 100) :+ (999L -> "ananana anananab banana")
    val got = BpeTrainer
      .trainMergesBatched(rows.toDF("doc_id", "text"), "text", merges = 10)
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val hist = rows
      .flatMap(_._2.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }.toSeq
    val want = refTrain(hist, 10).map { case (p, m, c) => (p, m, c) }
    assert(got === want)
  }
}
