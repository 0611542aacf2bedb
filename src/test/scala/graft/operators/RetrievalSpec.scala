package graft.operators

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana cherry"),
    (2L, "apple apple banana banana date egg fig"),
    (3L, "banana banana banana"),
    (4L, "grape kiwi lemon mango"),
    (5L, "apple")).toDF("doc_id", "text")

  private def topk(qs: Seq[(Long, String)], k: Int,
      rationalIdf: Boolean = true) =
    Retrieval.bm25TopK(docs, "doc_id", "text",
        qs.toDF("qid", "qtext"), "qid", "qtext", k,
        rationalIdf = rationalIdf)
      .orderBy("query_id", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  /** Driver-side reimplementation of the exact scoring formula. */
  private def brute(query: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      logIdf: Boolean = false): Map[Long, Long] = {
    val toks = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
      .toMap
    val n = toks.size.toLong
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val dfm = toks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    toks.flatMap { case (id, ts) =>
      val tfs = ts.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val c = query.distinct.flatMap { t =>
        tfs.get(t).map { tf =>
          val df = dfm(t)
          val rational = ((n - df).toDouble + 0.5) / (df.toDouble + 0.5)
          val idf = if (logIdf) math.log(rational) else rational
          val tfn = (tf.toDouble * (k1 + 1)) /
            (tf.toDouble + k1 * ((1 - b) + b * (ts.size.toDouble / avgdl)))
          math.floor(idf * tfn * 1000000 + 0.5).toLong
        }
      }.sum
      if (c > 0 || query.distinct.exists(tfs.contains)) Some(id -> c) else None
    }
  }

  test("rational-idf scores match a driver-side reimplementation exactly") {
    val got = topk(Seq((10L, "apple banana")), 5)
      .map { case (_, d, _, s) => d -> s }.toMap
    assert(got === brute(Seq("apple", "banana")))
  }

  test("default log idf matches driver-side true BM25 (same JVM libm)") {
    val got = topk(Seq((10L, "apple banana date")), 5, rationalIdf = false)
      .map { case (_, d, _, s) => d -> s }.toMap
    assert(got === brute(Seq("apple", "banana", "date"), logIdf = true))
  }

  test("doc with unique rare terms ranks first for them") {
    val got = topk(Seq((1L, "grape mango")), 3)
    assert(got.head._2 === 4L && got.head._3 === 1L)
    assert(got.length === 1) // nothing else contains the terms
  }

  test("k bound respected and ties broken by ascending doc_id") {
    val got = topk(Seq((1L, "banana")), 2)
    assert(got.length === 2)
    assert(got.map(_._3).toSeq === Seq(1L, 2L))
    // higher tf with short dl should win: doc 3 is all banana
    assert(got.head._2 === 3L)
  }

  test("duplicate query terms count once") {
    val once = topk(Seq((1L, "apple")), 5)
    val twice = topk(Seq((1L, "apple apple")), 5)
    assert(once.map(t => (t._2, t._4)).toSeq ===
      twice.map(t => (t._2, t._4)).toSeq)
  }

  test("query with no matching terms returns no rows") {
    assert(topk(Seq((1L, "zebra")), 5).isEmpty)
  }

  // --- Reciprocal Rank Fusion ---

  private def ranking(rows: (Long, Long, Long)*) =
    rows.toDF("query_id", "doc_id", "rank")

  test("rrfFuse: agreement across lists outranks a single first place") {
    // doc 10 is rank 2 in BOTH lists: 2*floor(1e9/62) = 32258064
    // beats either lone rank-1 floor(1e9/61) = 16393442.
    val a = ranking((1L, 11L, 1L), (1L, 10L, 2L))
    val b = ranking((1L, 12L, 1L), (1L, 10L, 2L))
    val got = Retrieval.rrfFuse(Seq(a, b), k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.head === ((10L, 2L * (1000000000L / 62), 2L)))
    // the two singletons tie on score; doc_id ascending breaks it
    assert(got.map(_._1).toSeq === Seq(10L, 11L, 12L))
  }

  test("rrfFuse: a query present in one list degrades to that list") {
    val a = ranking((1L, 10L, 1L), (2L, 20L, 1L), (2L, 21L, 2L))
    val b = ranking((1L, 10L, 1L))
    val got = Retrieval.rrfFuse(Seq(a, b), k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .toSet
    assert(got === Set((1L, 1L, 10L, 2L), (2L, 1L, 20L, 1L),
      (2L, 2L, 21L, 1L)))
  }

  test("rrfFuse: k truncates the fused ranking per query") {
    val a = ranking((1L to 10L).map(i => (1L, i, i)): _*)
    assert(Retrieval.rrfFuse(Seq(a), k = 4).count() === 4)
  }

  test("pmiCollocations: a fused phrase dominates independent pairs") {
    // "new york" always adjacent; "the" pairs with everything
    val docs = (0 until 30).map { i =>
      (i.toLong, s"the a$i new york the b$i the c$i new york the d$i")
    }.toDF("doc_id", "text")
    val got = Retrieval.pmiCollocations(docs, "doc_id", "text",
        minCount = 5L, k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(got.head._1 === "new" && got.head._2 === "york")
    assert(got.head._3 === 60L)
    // "new york" is a perfect collocation: c_xy = c_left(new) =
    // c_right(york) = 60 -> pmi_fp = 1e6 * N / 60
    val n = 30L * 11L // bigram slots per doc = 12 tokens - 1
    assert(got.head._4 === 1000000L * n / 60L)
  }

  test("pmiCollocations: minCount floors rare pairs out") {
    val docs = Seq((1L, "rare pair common common common common"))
      .toDF("doc_id", "text")
    assert(Retrieval.pmiCollocations(docs, "doc_id", "text",
      minCount = 2L, k = 10).collect()
      .forall(r => r.getLong(2) >= 2L))
  }
}
