package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "THE  Quick   Brown fox jumps over the lazy dog"), // case+ws variant
    (3L, "completely different content about spark engines"),
    (4L, "the quick brown fox jumps over the lazy cat") // near-dup of 1
  ).toDF("doc_id", "text")

  test("tokens/tokenCount ignore repeated whitespace") {
    val got = docs.select(TextFunctions.tokenCount(col("text")).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(9, 9, 6, 9))
  }

  test("fingerprint collides on case/whitespace variants only") {
    val fps = docs.select(col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
    assert(fps(1L) !== fps(4L))
  }

  test("exact dedup keeps the lowest-id variant") {
    val got = TextDedup.exact(docs, "text", Seq(col("doc_id").asc))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got === Array(1L, 3L, 4L))
  }

  test("minHashLsh finds the near-dup pair and not the unrelated doc") {
    val pairs = TextDedup.minHashLsh(docs, "doc_id", "text",
        numHashes = 32, bands = 16, shingleSize = 2, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)), s"expected (1,4) in $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minHashLshIncremental: batch near-dup matches its snapshot doc only") {
    val snapshot = docs
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog today"), // ~ 1
      (103L, "entirely unrelated fresh batch material")
    ).toDF("doc_id", "text")
    val pairs = TextDedup.minHashLshIncremental(
        snapshot, "doc_id", "text", batch, "doc_id", "text",
        numHashes = 32, bands = 16, shingleSize = 2, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((101L, 1L)), s"expected (101,1) in $pairs")
    assert(!pairs.exists(_._1 == 103L), s"unrelated batch doc paired: $pairs")
    // strictly batch x snapshot: no snapshot-internal pairs can appear
    assert(pairs.forall(p => p._1 >= 100L && p._2 < 100L), pairs.toString)
  }

  test("minHashLsh hot-bucket guard bounds a planted near-identical cluster") {
    // 10k identical docs — the boilerplate cluster that makes the band
    // join quadratic (every band puts all 10k in ONE bucket → ~5e7
    // candidate pairs without the guard). With the cap the hot buckets
    // are dropped wholesale and the run completes on the healthy docs.
    val boiler = "standard license header all rights reserved " +
      "redistribution permitted provided conditions are met"
    val cluster = spark.range(10000, 20000)
      .select(col("id").as("doc_id"), lit(boiler).as("text"))
    val corpus = docs.unionByName(cluster)
    val pairs = TextDedup.minHashLsh(corpus, "doc_id", "text",
        numHashes = 32, bands = 16, shingleSize = 2, threshold = 0.4,
        maxBandBucketRows = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // healthy near-dup still found; no cluster pair was emitted
    assert(pairs.contains((1L, 4L)), s"expected (1,4) in $pairs")
    assert(!pairs.exists(p => p._1 >= 10000L || p._2 >= 10000L),
      s"cluster pairs leaked past the guard: ${pairs.take(5)}")
  }

  test("minHashLsh without the guard goes quadratic on a hot bucket") {
    // Same corpus shape at 300 docs: the uncapped join must emit every
    // C(300,2) = 44850 cluster pair — the blowup the guard exists for,
    // measured at a size where materializing it is still feasible.
    val boiler = "standard license header all rights reserved " +
      "redistribution permitted provided conditions are met"
    val cluster = spark.range(10000, 10300)
      .select(col("id").as("doc_id"), lit(boiler).as("text"))
    val n = TextDedup.minHashLsh(docs.unionByName(cluster),
        "doc_id", "text",
        numHashes = 32, bands = 16, shingleSize = 2, threshold = 0.4,
        maxBandBucketRows = Long.MaxValue)
      .filter(col("id_a") >= 10000L).count()
    assert(n == 300L * 299L / 2,
      s"expected the full quadratic pair list (44850), got $n")
  }

  test("minHashLshIncremental: empty batch yields no pairs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextDedup.minHashLshIncremental(
      docs, "doc_id", "text", empty, "doc_id", "text",
      numHashes = 16, bands = 8, shingleSize = 2, threshold = 0.1).count() == 0)
  }

  test("jaccardShingles: identical texts score 1, disjoint score 0") {
    val j = docs.filter(col("doc_id") === 1)
      .select(
        TextDedup.jaccardShingles(col("text"), col("text")).as("same"),
        TextDedup.jaccardShingles(col("text"),
          lit("zz yy xx ww vv uu tt")).as("diff"))
      .collect()(0)
    assert(j.getDouble(0) === 1.0)
    assert(j.getDouble(1) === 0.0)
  }

  test("simHash: identical texts -> distance 0; near-dups within 16 bits;" +
      " unrelated far") {
    val sigs = docs.select(col("doc_id"),
      TextDedup.simHash(col("text")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(1L)) === 0)
    assert(ham(sigs(1L), sigs(4L)) <= 16)
    assert(ham(sigs(1L), sigs(3L)) > 16)
  }

  test("simHashPairs buckets catch the planted near-dup") {
    val pairs = TextDedup.simHashPairs(docs, "doc_id", "text", maxDist = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("native shingle-hash kernel agrees with the lambda reference") {
    // the HOF tower the native ShingleHash64 replaced, kept HERE as the
    // semantics reference (test-only — it must never re-enter a plan on
    // a hot path; see ROUND4.md on interpreted-HOF degradation)
    def referenceShingleHashes(text: org.apache.spark.sql.Column, n: Int) = {
      val toks = graft.functions.TextFunctions.tokens(text)
      transform(
        when(size(toks) < n, array(concat_ws(" ", toks)))
          .otherwise(transform(
            sequence(lit(1), size(toks) - (n - 1)),
            i => concat_ws(" ", slice(toks, i, lit(n))))),
        s => xxhash64(s))
    }
    for (n <- Seq(1, 2, 3, 5)) {
      val native = docs.select(col("doc_id"),
          TextDedup.shingleHashArray(coalesce(col("text"), lit("")), n).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val ref = docs.select(col("doc_id"),
          referenceShingleHashes(coalesce(col("text"), lit("")), n).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(native === ref, s"shingle-hash mismatch at n=$n")
    }
    // edge shapes the corpus may not cover: empty, spaces-only, runs of
    // spaces, single token, multibyte UTF-8 around the space scan
    val edge = spark.createDataFrame(Seq(
      (1L, ""), (2L, "   "), (3L, "one"), (4L, "a  b   c"),
      (5L, " héllo wörld  ñ "), (6L, "многа слов здесь даже пять"))
    ).toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3)) {
      val native = edge.select(col("doc_id"),
          TextDedup.shingleHashArray(col("text"), n).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val ref = edge.select(col("doc_id"),
          referenceShingleHashes(col("text"), n).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(native === ref, s"edge-case mismatch at n=$n")
    }
  }

  test("exactStreaming dedups identical texts across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val deduped = TextDedup.exactStreaming(
      input.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      input.addData((1L, "same doc", ts(0)), (2L, "other doc", ts(1)))
      q.processAllAvailable()
      // duplicate text in a LATER batch, within the watermark -> dropped
      input.addData((3L, "same doc", ts(5)), (4L, "third doc", ts(6)))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect()
        .map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L, 4L), s"doc 3 is a duplicate of 1: $ids")
    } finally q.stop()
  }

  test("winnowing guarantee: a shared run of >= w+k-1 tokens yields a shared fp") {
    // k=3, w=4: guarantee threshold is 6 shared tokens; the planted run
    // "alpha beta gamma delta epsilon zeta" is exactly 6 long
    val run = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"one two three $run four five six"),
      (2L, s"seven eight $run nine ten eleven twelve"),
      (3L, "totally unrelated words with nothing in common at all here")
    ).toDF("doc_id", "text")
    val fps = TextDedup.winnowFingerprints(df, "doc_id", "text", k = 3, w = 4)
    val byDoc = fps.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "guarantee violated")
    assert((byDoc(1L) & byDoc(3L)).isEmpty && (byDoc(2L) & byDoc(3L)).isEmpty)
  }

  test("winnowing is partition-independent and identical docs share all fps") {
    val df = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "a b c d e f g h i j k l m n o p")).toDF("doc_id", "text")
    val a = TextDedup.winnowFingerprints(df, "doc_id", "text")
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(a(1L) === a(2L))
    val b = TextDedup.winnowFingerprints(df.repartition(7), "doc_id", "text")
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(b === a)
  }

  test("winnowPairs reports full containment for an identical pair and " +
      "drops corpus-common fingerprints") {
    val common = "the the the the the the the the the the"
    val df = Seq(
      (1L, "x1 y1 z1 w1 v1 u1 t1 s1 r1 q1"),
      (2L, "x1 y1 z1 w1 v1 u1 t1 s1 r1 q1"),
      (3L, common), (4L, common), (5L, common)).toDF("doc_id", "text")
    val fps = TextDedup.winnowFingerprints(df, "doc_id", "text", k = 3, w = 2)
    // maxDocFreq=2: the 3-way common fp is dropped, the identical pair kept
    val pairs = TextDedup.winnowPairs(fps, "doc_id", minShared = 1, maxDocFreq = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(pairs.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("langId picks the language with most marker hits, deterministic ties") {
    val got = Seq(
      "the cat and the dog is in that house",
      "der hund und die katze ist nicht ein",
      "xyzzy plugh").toDF("text")
      .select(TextFunctions.langId(col("text")).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("en", "de", "und"))
  }

  // ----- prefixFilterJoin (exact PPJoin-family similarity join) ----------

  private def bruteJaccardPairs(docs: Seq[(Long, String)], n: Int,
      t: Double): Set[(Long, Long)] = {
    def sh(s: String): Set[String] = {
      val w = s.split(" ").filter(_.nonEmpty)
      if (w.length < n) Set(w.mkString(" "))
      else w.sliding(n).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, txt) => id -> sh(txt) }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      i = (sa & sb).size
      if i.toDouble / (sa.size + sb.size - i) >= t
    } yield (ia, ib)).toSet
  }

  private def ppJoin(docs: Seq[(Long, String)], t: Double) =
    TextDedup.prefixFilterJoin(docs.toDF("doc_id", "text"), "doc_id",
        "text", shingleSize = 3, threshold = t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("prefixFilterJoin: exact — matches brute force on random corpora") {
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val rnd = new scala.util.Random(83)
    for (trial <- 0 until 3) {
      val docs = (0 until 40).map { i =>
        val base = Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        (i.toLong, base.mkString(" "))
      }
      for (t <- Seq(0.5, 0.7, 0.9)) {
        assert(ppJoin(docs, t) === bruteJaccardPairs(docs, 3, t),
          s"trial $trial t=$t")
      }
    }
  }

  test("prefixFilterJoin: identical docs always pair; disjoint never do") {
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "p q r s t u v w"))
    assert(ppJoin(docs, 0.9) === Set((1L, 2L)))
  }

  test("prefixFilterJoin: size-band filter cannot drop qualifying pairs") {
    // |a| = 10 shingles vs |b| = 8 (drop last 2 tokens): jac = 8/10 = 0.8
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val trimmed = (1 to 10).map(i => s"w$i").mkString(" ")
    assert(ppJoin(Seq((1L, base), (2L, trimmed)), 0.8) === Set((1L, 2L)))
    assert(ppJoin(Seq((1L, base), (2L, trimmed)), 0.9) === Set.empty)
  }

  // ----- containmentJoin (exact asymmetric set-containment join) ---------

  private def bruteContainPairs(docs: Seq[(Long, String)], n: Int,
      t: Double): Set[(Long, Long)] = {
    def sh(s: String): Set[String] = {
      val w = s.split(" ").filter(_.nonEmpty)
      if (w.length < n) Set(w.mkString(" "))
      else w.sliding(n).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, txt) => id -> sh(txt) }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
      i = (sa & sb).size
      if i.toDouble / sa.size >= t
    } yield (ia, ib)).toSet
  }

  private def cJoin(docs: Seq[(Long, String)], t: Double) =
    TextDedup.containmentJoin(docs.toDF("doc_id", "text"), "doc_id",
        "text", shingleSize = 3, threshold = t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("containmentJoin: exact — matches brute force on random corpora") {
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val rnd = new scala.util.Random(157)
    for (trial <- 0 until 3) {
      val docs = (0 until 40).map { i =>
        val base = Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        (i.toLong, base.mkString(" "))
      }
      for (t <- Seq(0.5, 0.7, 0.9)) {
        assert(cJoin(docs, t) === bruteContainPairs(docs, 3, t),
          s"trial $trial t=$t")
      }
    }
  }

  test("containmentJoin: snippet inside page that Jaccard misses") {
    // snippet = first 5 tokens of a 20-token page: containment 1.0,
    // jaccard = 3/18 = 0.17 — the asymmetric join's whole point.
    val page = (1 to 20).map(i => s"w$i").mkString(" ")
    val snip = (1 to 5).map(i => s"w$i").mkString(" ")
    assert(cJoin(Seq((1L, snip), (2L, page)), 0.9) === Set((1L, 2L)))
    assert(ppJoin(Seq((1L, snip), (2L, page)), 0.5) === Set.empty)
    // exact duplicates emit BOTH directions
    assert(cJoin(Seq((1L, page), (2L, page)), 0.9) ===
      Set((1L, 2L), (2L, 1L)))
  }

  test("containmentJoin: ppm is exact floor(1e6*i/|A|)") {
    // A has 10 shingles (12 tokens), 9 shared with B: 900000 ppm at
    // t=0.9 survives; at t=0.9 a doc with 8/10 does not appear.
    val a = (1 to 12).map(i => s"w$i").mkString(" ")
    val b = (1 to 11).map(i => s"w$i").mkString(" ") // 9 shingles, all in A
    val out = TextDedup.containmentJoin(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
        "doc_id", "text", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // B (9 shingles) fully contained in A; A has 10, 9 shared = 900000
    assert(out.toSet === Set((2L, 1L, 1000000L), (1L, 2L, 900000L)))
  }
}
