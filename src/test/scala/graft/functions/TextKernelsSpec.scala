package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity suite for the native text kernels
  * ([[graft.expressions.TextKernels]], [[graft.expressions.PlaneDot]])
  * against the retired higher-order-function formulations, which live
  * on HERE as the executable semantics reference. The HOF forms must
  * never re-enter a main-source hot path (interpreted HOF call sites
  * were measured degrading 100x+ in long-lived JVMs — ROUND4/5), but as
  * test-only oracles they pin the natives bit-for-bit.
  */
class TextKernelsSpec extends SparkSpec {
  import spark.implicits._

  // --- HOF reference formulations (verbatim round-3/4 main source) ----
  private def refTokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")
  private def refShingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  private def refHitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))
      .cast("long")
  private def refTokenChars(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, x) => acc + length(x))

  private def corpus: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))

  private val edge = Seq(
    (1L, ""), (2L, "   "), (3L, "one"), (4L, "a  b   c"),
    (5L, " héllo wörld  ñ "), (6L, "многа слов здесь даже пять"),
    (7L, "the the the and of to a a"), (8L, "der die das und ist"),
    (9L, "el la de que y the and der"), (10L, "x"))

  private def edgeDf: DataFrame = edge.toDF("doc_id", "text")

  test("tokens: native == HOF reference on corpus + edge cases") {
    for (df <- Seq(corpus, edgeDf)) {
      val got = df.select(col("doc_id"),
          TextFunctions.tokens(col("text")).as("a"),
          refTokens(col("text")).as("b"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[String](1) === r.getSeq[String](2),
          s"tokens diverged for doc ${r.getLong(0)}")
      }
    }
  }

  test("shingles: native == HOF reference for n in 1..5") {
    for (df <- Seq(corpus, edgeDf); n <- Seq(1, 2, 3, 5)) {
      val got = df.select(col("doc_id"),
          TextFunctions.shingles(col("text"), n).as("a"),
          refShingles(refTokens(col("text")), n).as("b"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[String](1) === r.getSeq[String](2),
          s"shingles diverged for doc ${r.getLong(0)} n=$n")
      }
    }
  }

  test("token profile fields == HOF reference stats") {
    for (df <- Seq(corpus, edgeDf)) {
      val toks = refTokens(col("text"))
      val got = df.select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_native"),
          size(toks).cast("long").as("n_ref"),
          TextFunctions.uniqueTokenCount(col("text")).as("u_native"),
          size(array_distinct(toks)).cast("long").as("u_ref"),
          TextFunctions.tokenChars(col("text")).as("c_native"),
          refTokenChars(toks).as("c_ref"),
          TextFunctions.stopwordCount(col("text")).as("s_native"),
          refHitCount(toks, TextFunctions.stopwordsEn).as("s_ref"))
        .collect()
      got.foreach { r =>
        assert(r.getLong(1) === r.getLong(2), s"tokenCount doc ${r.getLong(0)}")
        assert(r.getLong(3) === r.getLong(4), s"uniqueCount doc ${r.getLong(0)}")
        assert(r.getLong(5) === r.getLong(6), s"tokenChars doc ${r.getLong(0)}")
        assert(r.getLong(7) === r.getLong(8), s"stopwords doc ${r.getLong(0)}")
      }
    }
  }

  test("langId == HOF-reference argmax on marker-heavy edge docs") {
    val toks = refTokens(col("text"))
    val refScores = TextFunctions.langMarkers.map { case (lang, words) =>
      lang -> refHitCount(toks, words)
    }
    val refBest = refScores.tail.foldLeft(refScores.head._2)(
      (m, s) => greatest(m, s._2))
    val refLang = refScores.foldRight(lit("und")) { case ((lang, sc), rest) =>
      when(refBest > 0 && sc === refBest, lit(lang)).otherwise(rest)
    }
    for (df <- Seq(corpus, edgeDf)) {
      val got = df.select(col("doc_id"),
        TextFunctions.langId(col("text")).as("a"), refLang.as("b")).collect()
      got.foreach { r =>
        assert(r.getString(1) === r.getString(2),
          s"langId diverged for doc ${r.getLong(0)}")
      }
    }
  }

  test("null text: every kernel propagates null like the HOF form") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b c"))).toDF("doc_id", "text")
    val r = df.orderBy("doc_id").select(
      TextFunctions.tokens(col("text")),
      TextFunctions.tokenCount(col("text")),
      TextFunctions.shingles(col("text"), 2),
      TextFunctions.qualityScore(col("text")),
      TextFunctions.langId(col("text"))).collect()
    assert((0 until 3).forall(r(0).isNullAt), s"null row leaked: ${r(0)}")
    // qualityScore(null): the when(n > 0) guards see null and fall to
    // otherwise(0.0) — 0.0, not null, exactly like the HOF chain; same
    // fall-through sends langId to the "und" literal
    assert(r(0).getDouble(3) === 0.0)
    assert(r(0).getString(4) === "und")
    assert(!r(1).isNullAt(0) && r(1).getLong(1) === 3L)
  }

  test("text-kernel fuzz: native == HOF on random unicode/space soup") {
    // 400 adversarial strings: random runs of spaces, ASCII, multibyte
    // code points (2-4 byte UTF-8), mixed — the byte-scan tokenizer and
    // window assembly must agree with the HOF reference on all of them
    val rnd = new scala.util.Random(303)
    val alphabets = Seq(
      "abcdefgh", "αβγδεζ", "бвгдеж", "一二三四五", "😀😁🎉", "a b", "  ")
    def soup(): String = {
      val n = rnd.nextInt(12)
      (0 until n).map { _ =>
        val a = alphabets(rnd.nextInt(alphabets.length))
        val run = (0 until 1 + rnd.nextInt(5))
          .map(_ => a.charAt(rnd.nextInt(a.length))).mkString
        if (rnd.nextInt(3) == 0) run + (" " * rnd.nextInt(3)) else run
      }.mkString
    }
    val docs = (1 to 400).map(i => (i.toLong, soup())).toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3)) {
      val got = docs.select(col("doc_id"),
          TextFunctions.shingles(col("text"), n).as("a"),
          refShingles(refTokens(col("text")), n).as("b"),
          TextFunctions.tokenCount(col("text")).as("c"),
          size(refTokens(col("text"))).cast("long").as("d"),
          TextFunctions.tokenChars(col("text")).as("e"),
          refTokenChars(refTokens(col("text"))).as("f"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[String](1) === r.getSeq[String](2),
          s"shingles diverged for fuzz doc ${r.getLong(0)} n=$n")
        assert(r.getLong(3) === r.getLong(4), s"count doc ${r.getLong(0)}")
        assert(r.getLong(5) === r.getLong(6), s"chars doc ${r.getLong(0)}")
      }
    }
  }

  test("GraftExtensions SQL builders construct working text kernels") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val fns = new graft.expressions.GraftExtensions().functions
      .map(f => f._1 -> f._3).toMap
    val text = Literal.create("the quick brown fox",
      org.apache.spark.sql.types.StringType)
    val toks = fns("token_array")(Seq(text))
    assert(toks.eval(null).asInstanceOf[ArrayData].numElements() === 4)
    val sh = fns("shingle_array")(Seq(toks,
      Literal.create(2, org.apache.spark.sql.types.IntegerType)))
    val shingles = sh.eval(null).asInstanceOf[ArrayData]
    assert(shingles.numElements() === 3)
    assert(shingles.getUTF8String(0) === UTF8String.fromString("the quick"))
    val hashes = fns("shingle_hash64")(Seq(text,
      Literal.create(2, org.apache.spark.sql.types.IntegerType)))
    assert(hashes.eval(null).asInstanceOf[ArrayData].numElements() === 3)
    val prof = fns("token_profile")(Seq(text)).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(prof.getLong(0) === 4L) // n_tokens
    assert(prof.getLong(1) === 4L) // n_unique
    assert(prof.getLong(2) === 16L) // chars sans spaces
    // hits(0): "the" is a stopword
    val hits = prof.getArray(3)
    assert(hits.getLong(0) === 1L)
    // non-literal n must be rejected, not silently mis-planned
    intercept[IllegalArgumentException] {
      fns("shingle_array")(Seq(toks, toks))
    }
  }

  test("planeDot fuzz: native == HOF over random lengths and nulls") {
    val rnd = new scala.util.Random(202)
    val dim = 6
    val weights = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
    def vec(): Array[java.lang.Float] = {
      val n = rnd.nextInt(9) // 0..8, frequent length mismatches vs dim=6
      Array.fill[java.lang.Float](n) {
        if (rnd.nextInt(15) == 0) null
        else java.lang.Float.valueOf(rnd.nextFloat() * 4 - 2)
      }
    }
    val df = (0 until 300).map(_ => Tuple1(vec())).toDF("v")
    val refProj = aggregate(
      zip_with(col("v"), lit(weights), (x, w) => x.cast("double") * w),
      lit(0.0), (a, x) => a + x)
    val native = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.PlaneDot(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("v")), weights))
    val rows = df.select(native.as("a"), refProj.as("b")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"nullness diverged row $i: $r")
      if (!r.isNullAt(0))
        assert(r.getDouble(0) === r.getDouble(1), s"value diverged row $i: $r")
    }
  }
}
