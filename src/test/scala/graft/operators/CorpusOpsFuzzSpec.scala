package graft.operators

import graft.SparkSpec

/** Randomized cross-checks of the round-5 corpus-quality operators
  * against independent driver-side Scala references — the same
  * executable-semantics-reference pattern as KernelFuzzSpec: the
  * distributed plan and the obvious sequential implementation must
  * agree exactly (fixed-point integers and exactly-reproducible
  * doubles, so `===` is legitimate).
  */
class CorpusOpsFuzzSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic corpus: small vocabulary so bigrams/trigrams collide
  // across docs (the interesting regime for df counts and LM estimates).
  private val rnd = new scala.util.Random(20260813L)
  private val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
  private val corpus: Seq[(Long, String)] = (0 until 60).map { i =>
    val len = rnd.nextInt(13) // includes 0 and sub-shingle widths
    (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
  }

  // The oracle-SQL token/shingle semantics, sequentially.
  private def toks(text: String): Vector[String] =
    text.split(" ", -1).filter(_.nonEmpty).toVector
  private def shingles(text: String, n: Int): Vector[String] = {
    val t = toks(text)
    if (t.length < n) Vector(t.mkString(" "))
    else t.sliding(n).map(_.mkString(" ")).toVector
  }

  test("Boilerplate.profile matches the sequential reference exactly") {
    val minDfFrac = 0.25
    val perDoc = corpus.map { case (id, tx) =>
      id -> shingles(tx, 3).distinct
    }
    val df = perDoc.flatMap(_._2).groupBy(identity).map { case (g, o) =>
      g -> o.size
    }
    val boiler = df.collect {
      case (g, c) if c.toDouble >= corpus.size.toDouble * minDfFrac => g
    }.toSet
    val expect = perDoc.map { case (id, sh) =>
      val hits = sh.count(boiler)
      id -> ((sh.size.toLong, hits.toLong,
        if (sh.nonEmpty) hits.toDouble / sh.size.toDouble else 0.0))
    }.toMap
    val got = Boilerplate.profile(corpus.toDF("doc_id", "text"),
        minDfFrac = minDfFrac)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === expect)
  }

  test("LanguageModel.bigramFluency matches the sequential reference exactly") {
    val allBg = corpus.flatMap { case (id, tx) =>
      shingles(tx, 2).map(id -> _)
    }
    val c2 = allBg.groupBy(_._2).map { case (g, o) => g -> o.size.toLong }
    val c1 = c2.groupBy { case (g, _) =>
      g.split(" ", -1).head
    }.map { case (w1, m) => w1 -> m.values.sum }
    def pFp(g: String): Long =
      math.floor(c2(g).toDouble * 1e9 /
        c1(g.split(" ", -1).head).toDouble + 0.5).toLong
    val expect = allBg.groupBy(_._1).map { case (id, occ) =>
      val n = occ.size.toLong
      val score = occ.map(o => pFp(o._2)).sum
      id -> ((n, score, score.toDouble / n.toDouble / 1e9))
    }
    val got = LanguageModel.bigramFluency(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === expect)
  }

  test("Retrieval.rrfFuse matches the sequential reference on random lists") {
    val lists: Seq[Seq[(Long, Long, Long)]] = Seq.fill(3) {
      (0L until 5L).flatMap { q =>
        val docs = rnd.shuffle((0L until 30L).toList).take(rnd.nextInt(10))
        docs.zipWithIndex.map { case (d, i) => (q, d, i.toLong + 1) }
      }
    }
    val contrib = lists.flatten.map { case (q, d, r) =>
      ((q, d), math.floor(1e9 / (60.0 + r.toDouble)).toLong)
    }
    val fused = contrib.groupBy(_._1).map { case ((q, d), o) =>
      (q, d, o.map(_._2).sum, o.size.toLong)
    }
    val expect = fused.groupBy(_._1).flatMap { case (_, rows) =>
      rows.toSeq.sortBy { case (_, d, s, _) => (-s, d) }.take(4)
        .zipWithIndex.map { case ((q, d, s, nl), i) =>
          (q, i.toLong + 1, d, s, nl)
        }
    }.toSet
    val got = Retrieval.rrfFuse(
        lists.map(_.toDF("query_id", "doc_id", "rank")), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === expect)
  }

  test("SubstringDedup.dupSpanReport matches the sequential reference exactly") {
    val w = 4
    // per-doc positional windows under the SAME short-doc whole-text
    // fallback the kernel applies
    def wins(text: String): Vector[(Int, String)] = {
      val t = toks(text)
      if (t.length < w) Vector(0 -> t.mkString(" "))
      else t.sliding(w).map(_.mkString(" ")).toVector.zipWithIndex
        .map(_.swap)
    }
    val perDoc = corpus.map { case (id, tx) => id -> wins(tx) }
    val occ = perDoc.flatMap(_._2.map(_._2)).groupBy(identity)
      .map { case (g, o) => g -> o.size }
    val expect = perDoc.map { case (id, ws) =>
      val nt = toks(corpus.find(_._1 == id).get._2).length
      val flagged = ws.collect { case (p, g) if occ(g) >= 2 => p }
      // interval merge
      var spans = Vector.empty[(Int, Int)]
      flagged.foreach { p =>
        val end = math.min(p + w, nt) // clip (fallback window: nt)
        if (spans.nonEmpty && p <= spans.last._2)
          spans = spans.init :+ ((spans.last._1, math.max(spans.last._2, end)))
        else spans = spans :+ ((p, end))
      }
      val dup = spans.map { case (s, e) => e - s }.sum.toLong
      id -> ((nt.toLong, dup, spans.size.toLong,
        spans.map { case (s, e) => e - s }.foldLeft(0L)(_ max _),
        dup * 2 < nt))
    }.toMap
    val got = SubstringDedup
      .dupSpanReport(corpus.toDF("doc_id", "text"), "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got === expect)
  }

  test("BpeTrainer merges on the fuzz corpus match the greedy reference") {
    // same reference as BpeTrainerSpec, over the adversarial corpus with
    // words tripled ("a" -> "aaa") so runs of identical symbols — the
    // overlapping-merge regime — appear everywhere
    val corpus3 = corpus.map { case (id, tx) =>
      id -> tx.split(" ").filter(_.nonEmpty).map(wd => wd * 3).mkString(" ")
    }
    val hist = corpus3.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (wd, o) => wd -> o.size.toLong }.toSeq
    var cur: Seq[(List[String], Long)] =
      hist.map { case (wd, f) => wd.map(_.toString).toList -> f }
    val expect = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to 5) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      cur.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.nonEmpty) {
        val ((a, b), cnt) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, s"$x $y") }
        expect += ((s"$a $b", a + b, cnt))
        def app(l: List[String]): List[String] = l match {
          case x :: y :: rest if x == a && y == b => (a + b) :: app(rest)
          case x :: rest => x :: app(rest)
          case Nil => Nil
        }
        cur = cur.map { case (s, f) => app(s) -> f }
      }
    }
    val got = BpeTrainer
      .trainMerges(corpus3.toDF("doc_id", "text"), "text", merges = 5)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === expect.result())
  }
}
